"""Test configuration.

Tests run on a virtual 8-device CPU mesh (no multi-chip TPU hardware in CI),
mirroring how the driver validates multi-chip sharding. Pallas kernels run in
interpreter mode on CPU; the same code paths compile on real TPU.

NOTE: this environment pre-imports jax via a sitecustomize hook that registers
a remote TPU backend (JAX_PLATFORMS=axon), so plain env vars are too late —
the platform must be overridden through jax.config. Unit tests must not
contend for the single benchmark chip (and remote compiles are ~30s each).
"""

import os

# On-chip lane: CESCOIN_TPU_TESTS=1 keeps the real TPU backend so the
# @pytest.mark.tpu suite (tests/test_on_chip.py) compiles Mosaic/XBSP on
# hardware: `CESCOIN_TPU_TESTS=1 pytest tests -m tpu`. Default lane forces
# the virtual 8-device CPU mesh and runs everything EXCEPT tpu-marked tests.
TPU_LANE = os.environ.get("CESCOIN_TPU_TESTS", "") == "1"

# Read by the CPU client at first backend init (still lazy at this point).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    skip_tpu = pytest.mark.skip(
        reason="on-chip lane: run with CESCOIN_TPU_TESTS=1 pytest -m tpu")
    skip_cpu = pytest.mark.skip(
        reason="CPU-lane test (TPU lane runs only tpu-marked tests)")
    for item in items:
        if "tpu" in item.keywords and not TPU_LANE:
            item.add_marker(skip_tpu)
        elif TPU_LANE and "tpu" not in item.keywords:
            item.add_marker(skip_cpu)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: runs on the real TPU chip (CESCOIN_TPU_TESTS=1)")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
