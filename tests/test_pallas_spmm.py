"""Pallas BSC SpMM kernel vs oracle (interpreter mode on CPU; the identical
code path compiles on TPU — benchmarked in bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caffe_escoin_tpu.engine.context import ConvMode, ExecutionPolicy
from caffe_escoin_tpu.kernels.bsc_pallas import bsc_spmm_pallas
from caffe_escoin_tpu.kernels.reference import conv2d_reference
from caffe_escoin_tpu.ops.conv import conv2d
from caffe_escoin_tpu.sparse import dense_to_bsc
from caffe_escoin_tpu.sparse.weight_align import weight_align
from caffe_escoin_tpu.utils.pruning import prune_blocks, prune_conv_weight


@pytest.mark.parametrize(
    "shape,block,sparsity,m",
    [
        ((256, 256), (128, 128), 0.75, 300),
        ((96, 64), (8, 16), 0.5, 64),
        ((64, 128), (8, 128), 1.0, 16),
        ((72, 40), (8, 8), 0.9, 10),
        ((40, 24), (8, 8), 0.0, 9),
    ],
)
def test_bsc_pallas_matches_oracle(rng, shape, block, sparsity, m):
    k, n = shape
    w = prune_blocks(rng.standard_normal((k, n)).astype(np.float32), sparsity, block)
    bsc = dense_to_bsc(w, block)
    a = rng.standard_normal((m, k)).astype(np.float32)
    out = bsc_spmm_pallas(a, bsc, tile_m=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), a @ w, rtol=1e-4, atol=1e-4)


def test_bsc_pallas_column_grouping(rng):
    """Small w_budget forces n_groups > 1; result must be unchanged."""
    w = prune_blocks(rng.standard_normal((64, 64)).astype(np.float32), 0.5, (8, 8))
    bsc = dense_to_bsc(w, (8, 8))
    a = rng.standard_normal((16, 64)).astype(np.float32)
    ref = a @ w
    for budget in [1, 2048, 1 << 30]:
        out = bsc_spmm_pallas(a, bsc, tile_m=16, interpret=True, w_budget=budget)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_bsc_pallas_bf16(rng):
    w = prune_blocks(rng.standard_normal((64, 64)).astype(np.float32), 0.5, (8, 8))
    bsc = dense_to_bsc(w.astype(np.float32), (8, 8))
    bsc = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, bsc
    )
    a = rng.standard_normal((16, 64)).astype(np.float32).astype(jnp.bfloat16)
    out = bsc_spmm_pallas(a, bsc, tile_m=16, interpret=True, out_dtype=jnp.float32)
    ref = np.asarray(a, np.float32) @ np.asarray(
        jnp.asarray(w, jnp.bfloat16), np.float32
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)


def test_conv2d_uses_pallas_path(rng):
    """conv2d with use_pallas+interpret runs the pallas kernel and matches."""
    w = prune_conv_weight(
        rng.standard_normal((3, 3, 16, 32)).astype(np.float32), 0.9, (8, 16)
    )
    b = rng.standard_normal(32).astype(np.float32)
    policy = ExecutionPolicy(block_shape=(8, 16), use_pallas=True, interpret=True,
                             spmm_tile_m=64)
    aligned = weight_align(w, b, policy=policy)
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    out = conv2d(x, aligned, padding=(1, 1), mode=ConvMode.LOWERED_SPARSE,
                 policy=policy)
    ref = conv2d_reference(x, w, b, padding=(1, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
