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

# Read by the CPU client at first backend init (still lazy at this point).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
