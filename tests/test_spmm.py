"""SpMM executors (ELL/BSR/BSC) vs the dense oracle, under jit, with grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caffe_escoin_tpu.kernels.reference import spmm_reference
from caffe_escoin_tpu.kernels.spmm import bsc_spmm, bsr_spmm, ell_spmm
from caffe_escoin_tpu.sparse import dense_to_bsc, dense_to_bsr, dense_to_ell
from caffe_escoin_tpu.utils.pruning import prune_blocks, prune_magnitude


def _sparse(rng, shape, sparsity, block=None):
    w = rng.standard_normal(shape).astype(np.float32)
    if block is None:
        return prune_magnitude(w, sparsity)
    return prune_blocks(w, sparsity, block)


@pytest.mark.parametrize("sparsity", [0.0, 0.5, 0.9, 1.0])
@pytest.mark.parametrize("shape_n", [((32, 64), 16), ((17, 40), 8), ((128, 30), 64)])
def test_ell_spmm_matches_oracle(rng, shape_n, sparsity):
    shape, n = shape_n
    w = _sparse(rng, shape, sparsity)
    b = rng.standard_normal((shape[1], n)).astype(np.float32)
    out = jax.jit(lambda e, b: ell_spmm(e, b))(dense_to_ell(w), b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_reference(w, b)), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("block", [(8, 8), (8, 16)])
@pytest.mark.parametrize("sparsity", [0.0, 0.75, 1.0])
def test_bsr_spmm_matches_oracle(rng, block, sparsity):
    w = _sparse(rng, (32, 64), sparsity, block)
    b = rng.standard_normal((64, 24)).astype(np.float32)
    out = jax.jit(lambda s, b: bsr_spmm(s, b))(dense_to_bsr(w, block), b)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_reference(w, b)), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("block", [(8, 8), (16, 8)])
@pytest.mark.parametrize("sparsity", [0.0, 0.75, 1.0])
@pytest.mark.parametrize("shape", [(64, 32), (40, 20)])
def test_bsc_spmm_matches_oracle(rng, block, sparsity, shape):
    w = _sparse(rng, shape, sparsity, block)
    a = rng.standard_normal((10, shape[0])).astype(np.float32)
    out = jax.jit(lambda a, s: bsc_spmm(a, s))(a, dense_to_bsc(w, block))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(spmm_reference(a, w)), rtol=1e-5, atol=1e-5
    )


def test_bsc_spmm_grad_wrt_dense_operand(rng):
    """Lowered sparse conv must remain trainable w.r.t. activations."""
    w = _sparse(rng, (32, 16), 0.5, (8, 8))
    bsc = dense_to_bsc(w, (8, 8))
    a = rng.standard_normal((4, 32)).astype(np.float32)

    g = jax.grad(lambda a: bsc_spmm(a, bsc).sum())(a)
    g_ref = jax.grad(lambda a: spmm_reference(a, w).sum())(a)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-5)


def test_block_skipping_is_real(rng):
    """BSR at high block sparsity must store far fewer blocks than dense."""
    w = _sparse(rng, (256, 512), 0.9, (8, 128))
    bsr = dense_to_bsr(w, (8, 128))
    total = bsr.n_brows * bsr.n_bcols
    assert bsr.nnz_blocks <= 0.15 * total
    # and padded width is bounded by per-row max, not total
    assert bsr.max_bw < bsr.n_bcols
