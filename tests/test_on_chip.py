"""On-chip test lane: Mosaic/XBSP numerical validation on the REAL TPU.

The CPU-lane kernel tests run Pallas in interpreter mode, which has no
Mosaic alignment/layout constraints; this small marked suite compiles the
sparse executors on hardware against the f32 oracle. Run:

    CESCOIN_TPU_TESTS=1 python -m pytest tests -m tpu -q

Kept to a handful of shapes (each remote compile is ~20-60s here). The
driver's bench run exercises the same paths at full ResNet-50 scale.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module")
def chip():
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip(f"no TPU backend (got {jax.default_backend()})")
    return jax.devices()[0]


def _oracle(x, w, pad, stride=(1, 1)):
    return lax.conv_general_dilated(
        x, w, stride, [pad, pad],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision="highest")


def _setup(cin, cout, k, sparsity, seed=0):
    from caffe_escoin_tpu.engine.context import ExecutionPolicy
    from caffe_escoin_tpu.sparse.weight_align import weight_align
    from caffe_escoin_tpu.utils.pruning import prune_conv_weight

    rng = np.random.default_rng(seed)
    w = prune_conv_weight(
        rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.05,
        sparsity, (128, 128))
    policy = ExecutionPolicy(block_shape=(128, 128))
    aligned = weight_align(w, None, policy=policy)
    x = jnp.asarray(
        rng.standard_normal((2, 10, 10, cin)).astype(np.float32) * 0.1)
    return x, w, aligned, policy


@pytest.mark.parametrize("arm", ["unroll", "gathered"])
def test_xbsp_arms_on_chip(chip, arm):
    from caffe_escoin_tpu.kernels import xla_block_sparse as xbs

    x, w, aligned, _ = _setup(128, 256, 3, 0.9)
    fn = xbs.conv if arm == "unroll" else xbs.conv_gathered
    out = jax.jit(lambda y: fn(y, aligned, padding=(1, 1)))(
        x.astype(jnp.bfloat16))
    ref = _oracle(x, jnp.asarray(w), (1, 1))
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    assert err < 5e-3, f"{arm}: max err {err}"


def test_sconv_fused_pallas_on_chip(chip):
    from caffe_escoin_tpu.engine.context import ExecutionPolicy
    from caffe_escoin_tpu.kernels import sconv_fused

    x, w, aligned, policy = _setup(128, 128, 3, 0.9)
    if not sconv_fused.supported(x, aligned, (1, 1), policy):
        pytest.skip("shape outside sconv_fused VMEM budget")
    out = jax.jit(lambda y: sconv_fused.sconv(
        y, aligned, padding=(1, 1), relu=False, policy=policy))(x)
    ref = _oracle(x, jnp.asarray(w), (1, 1))
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    assert err < 5e-3, f"sconv_fused: max err {err}"


def test_bsc_spmm_pallas_on_chip(chip):
    from caffe_escoin_tpu.engine.context import ExecutionPolicy
    from caffe_escoin_tpu.kernels.bsc_pallas import (bsc_spmm_pallas,
                                                     pallas_supported)
    from caffe_escoin_tpu.sparse.formats import dense_to_bsc
    from caffe_escoin_tpu.utils.pruning import prune_blocks

    rng = np.random.default_rng(1)
    w = prune_blocks(
        rng.standard_normal((512, 256)).astype(np.float32) * 0.05, 0.9,
        (128, 128))
    bsc = dense_to_bsc(w, (128, 128))
    if not pallas_supported(bsc):
        pytest.skip("bsc outside pallas constraints")
    x = jnp.asarray(rng.standard_normal((256, 512)).astype(np.float32))
    out = jax.jit(lambda y: bsc_spmm_pallas(y, bsc, tile_m=128))(x)
    ref = x @ jnp.asarray(w)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    assert err < 5e-3, f"bsc_spmm_pallas: max err {err}"


def test_sparse_fc_spmm_on_chip(chip):
    from caffe_escoin_tpu.kernels import xla_block_sparse as xbs
    from caffe_escoin_tpu.sparse.formats import dense_to_bsc
    from caffe_escoin_tpu.utils.pruning import prune_blocks

    rng = np.random.default_rng(2)
    w = prune_blocks(
        rng.standard_normal((1024, 512)).astype(np.float32) * 0.05, 0.9,
        (128, 128))
    bsc = dense_to_bsc(w, (128, 128))
    x = jnp.asarray(rng.standard_normal((64, 1024)).astype(np.float32))
    out = jax.jit(lambda y: xbs.spmm(y, bsc))(x.astype(jnp.bfloat16))
    ref = x @ jnp.asarray(w)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    assert err < 5e-2, f"xbsp spmm: max err {err}"
