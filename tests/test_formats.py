"""Sparse format round-trip tests (CSR/ELL/BSR <-> dense).

Parity role: the reference never unit-tested its CSR conversion
(SURVEY.md section 4: "Sparse paths are NOT unit-tested"); this fixes that.
"""

import numpy as np
import pytest

from caffe_escoin_tpu.sparse import (
    dense_to_bsr,
    dense_to_csr,
    dense_to_ell,
)
from caffe_escoin_tpu.utils.pruning import (
    prune_blocks,
    prune_magnitude,
    sparsity_of,
)


def _rand_sparse(rng, shape, sparsity):
    w = rng.standard_normal(shape).astype(np.float32)
    mask = rng.random(shape) >= sparsity
    return w * mask


@pytest.mark.parametrize("sparsity", [0.0, 0.5, 0.9, 0.99, 1.0])
@pytest.mark.parametrize("shape", [(16, 32), (7, 13), (1, 128), (64, 64)])
def test_csr_roundtrip(rng, shape, sparsity):
    w = _rand_sparse(rng, shape, sparsity)
    csr = dense_to_csr(w)
    np.testing.assert_array_equal(np.asarray(csr.to_dense()), w)
    assert csr.nnz == int((w != 0).sum())


@pytest.mark.parametrize("sparsity", [0.0, 0.7, 0.95, 1.0])
@pytest.mark.parametrize("shape", [(16, 32), (5, 17), (128, 9)])
def test_ell_roundtrip(rng, shape, sparsity):
    w = _rand_sparse(rng, shape, sparsity)
    ell = dense_to_ell(w, lane_pad=8)
    np.testing.assert_array_equal(np.asarray(ell.to_dense()), w)
    assert ell.width % 8 == 0
    assert ell.nnz == int((w != 0).sum())


@pytest.mark.parametrize("block", [(8, 8), (8, 128), (16, 32)])
@pytest.mark.parametrize("shape", [(64, 256), (50, 100), (8, 128)])
@pytest.mark.parametrize("sparsity", [0.0, 0.8, 1.0])
def test_bsr_roundtrip(rng, shape, sparsity, block):
    w = _rand_sparse(rng, shape, sparsity)
    # make it block-structured so BSR has something to skip
    w = prune_blocks(w, sparsity, block)
    bsr = dense_to_bsr(w, block)
    np.testing.assert_array_equal(np.asarray(bsr.to_dense()), w)
    if sparsity == 1.0:
        assert bsr.nnz_blocks == 0
    if sparsity == 0.0 and shape[0] % block[0] == 0 and shape[1] % block[1] == 0:
        assert bsr.block_density == 1.0


def test_bsr_flat_view_matches_padded(rng):
    w = prune_blocks(_rand_sparse(rng, (64, 512), 0.3), 0.6, (8, 128))
    bsr = dense_to_bsr(w, (8, 128))
    # rebuild dense from flat view
    dense = np.zeros((64 // 8, 512 // 128, 8, 128), np.float32)
    fr = np.asarray(bsr.flat_row)
    fc = np.asarray(bsr.flat_col)
    fb = np.asarray(bsr.flat_blocks)
    n_live = bsr.nnz_blocks
    for i in range(n_live):
        dense[fr[i], fc[i]] += fb[i]
    dense = dense.transpose(0, 2, 1, 3).reshape(64, 512)
    np.testing.assert_array_equal(dense, w)


def test_prune_magnitude_hits_target(rng):
    w = rng.standard_normal((100, 100)).astype(np.float32)
    for s in [0.0, 0.5, 0.9, 0.99]:
        assert abs(sparsity_of(prune_magnitude(w, s)) - s) < 0.01


def test_prune_blocks_structured(rng):
    w = rng.standard_normal((64, 512)).astype(np.float32)
    pruned = prune_blocks(w, 0.75, (8, 128))
    bsr = dense_to_bsr(pruned, (8, 128))
    assert bsr.block_density == pytest.approx(0.25, abs=0.05)


def test_formats_are_pytrees(rng):
    import jax

    w = _rand_sparse(rng, (16, 128), 0.8)
    for conv in (dense_to_csr, dense_to_ell, lambda a: dense_to_bsr(a, (8, 128))):
        m = conv(w)
        leaves = jax.tree_util.tree_leaves(m)
        assert all(hasattr(l, "shape") for l in leaves)
        m2 = jax.tree_util.tree_map(lambda a: a, m)
        assert type(m2) is type(m)
        np.testing.assert_array_equal(np.asarray(m2.to_dense()), np.asarray(m.to_dense()))


def test_native_bsc_pack_agrees_with_numpy():
    """csrc/csrpack.cc native packer vs the numpy reference packer."""
    np_mod = __import__("numpy")
    from caffe_escoin_tpu.data.native import load_library, native_bsc_pack

    if load_library() is None:
        import pytest

        pytest.skip("native library not built")
    rng = np_mod.random.default_rng(0)
    w = rng.standard_normal((512, 384)).astype(np_mod.float32)
    w[np_mod.abs(w) < 1.2] = 0  # ~75% sparse, irregular pattern
    from caffe_escoin_tpu.sparse.formats import dense_to_bsc

    bsc = dense_to_bsc(w, (128, 128))  # numpy path (small weight)
    packed = native_bsc_pack(w, (128, 128))
    assert packed is not None
    blocks, rows, nnz, max_bw = packed
    assert np_mod.array_equal(nnz, np_mod.asarray(bsc.bcol_nnz))
    assert max_bw == bsc.blocks.shape[1]
    assert np_mod.array_equal(rows, np_mod.asarray(bsc.block_row))
    assert np_mod.array_equal(blocks, np_mod.asarray(bsc.blocks))
