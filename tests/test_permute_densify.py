"""Channel permutation (sparse/permute.py) and block densification
(utils/pruning.densify_blocks) — the unstructured-checkpoint deployment
pipeline."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from caffe_escoin_tpu.sparse.permute import (  # noqa: E402
    _live_blocks,
    block_permutation,
    permute_conv_weight,
)
from caffe_escoin_tpu.utils.pruning import densify_blocks  # noqa: E402


def test_permutation_preserves_values_and_counts():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((2 * 16, 24)).astype(np.float32)
    w[rng.random(w.shape) < 0.8] = 0
    cin_perm, cout_perm, stats = block_permutation(w, (8, 8),
                                                   kernel_offsets=2)
    w2 = w.reshape(2, 16, 24)[:, cin_perm][:, :, cout_perm].reshape(32, 24)
    assert sorted(w.ravel()) == sorted(w2.ravel())
    assert stats["blocks_after"] <= stats["blocks_before"]


def test_permutation_recovers_planted_block_structure():
    """A block-sparse matrix scrambled by random channel permutations must
    be (near-)fully recovered by the greedy optimizer."""
    rng = np.random.default_rng(1)
    cin, cout, bk, bn = 32, 32, 8, 8
    w = np.zeros((cin, cout), np.float32)
    for bi in range(cin // bk):
        # one live block per row-block
        bj = rng.integers(0, cout // bn)
        w[bi * bk:(bi + 1) * bk, bj * bn:(bj + 1) * bn] = rng.standard_normal(
            (bk, bn))
    planted = _live_blocks(w != 0, bk, bn)
    scrambled = w[rng.permutation(cin)][:, rng.permutation(cout)]
    before = _live_blocks(scrambled != 0, bk, bn)
    assert before > planted  # scrambling smeared the blocks
    cin_perm, cout_perm, stats = block_permutation(scrambled, (bk, bn),
                                                   passes=3)
    assert stats["blocks_after"] <= planted * 2  # most structure recovered
    assert stats["blocks_after"] < before


def test_permuted_conv_matches_channel_shuffled_oracle():
    """Permuting (cin, cout) of a conv weight == permuting the input's and
    output's channel dims — the deployment identity the net-level pass
    relies on."""
    from caffe_escoin_tpu.ops.conv import conv2d_dense

    rng = np.random.default_rng(2)
    w = rng.standard_normal((3, 3, 8, 12)).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 8)).astype(np.float32))
    cin_perm = rng.permutation(8)
    cout_perm = rng.permutation(12)
    w2 = permute_conv_weight(w, cin_perm, cout_perm)
    out2 = conv2d_dense(x[..., cin_perm], jnp.asarray(w2), padding=(1, 1))
    ref = conv2d_dense(x, jnp.asarray(w), padding=(1, 1))[..., cout_perm]
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_densify_blocks():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((32, 32)).astype(np.float32)
    w[rng.random(w.shape) < 0.9] = 0
    out, stats = densify_blocks(w, (8, 8), min_density=0.15)
    # only whole blocks were zeroed; survivors untouched
    kept = out != 0
    assert (out[kept] == w[kept]).all()
    assert stats["nnz_after"] <= stats["nnz_before"]
    assert 0.0 <= stats["extra_zeroed_frac"] <= 1.0
    # every surviving block meets the density bar
    blocked = (out != 0).reshape(4, 8, 4, 8).transpose(0, 2, 1, 3)
    dens = blocked.mean(axis=(2, 3))
    assert ((dens == 0) | (dens >= 0.15)).all()


def test_densify_lossless_at_zero_threshold():
    rng = np.random.default_rng(4)
    w = rng.standard_normal((16, 16)).astype(np.float32)
    w[rng.random(w.shape) < 0.5] = 0
    out, stats = densify_blocks(w, (8, 8), min_density=0.0)
    np.testing.assert_array_equal(out, w)
    assert stats["extra_zeroed_frac"] == 0.0
