"""Op-level tests vs oracles (the reference's per-layer gtest pattern,
`src/caffe/test/test_*_layer.cpp`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caffe_escoin_tpu.engine.context import ConvMode, ExecutionPolicy, SparseFormat
from caffe_escoin_tpu.kernels.reference import conv2d_reference, pool2d_reference
from caffe_escoin_tpu.ops import activations as act
from caffe_escoin_tpu.ops import losses as loss_ops
from caffe_escoin_tpu.ops import norm as norm_ops
from caffe_escoin_tpu.ops.conv import conv2d, conv2d_dense
from caffe_escoin_tpu.ops.pool import pool2d
from caffe_escoin_tpu.sparse.weight_align import weight_align
from caffe_escoin_tpu.utils.pruning import prune_conv_weight

ALL_MODES = [ConvMode.LOWERED_GEMM, ConvMode.LOWERED_SPARSE, ConvMode.SCONV,
             ConvMode.SCONV_PAR]


def _conv_setup(rng, *, cin=16, cout=32, k=3, sparsity=0.9, groups=1,
                block=(8, 8)):
    w = rng.standard_normal((k, k, cin // groups, cout)).astype(np.float32)
    w = prune_conv_weight(w, sparsity, block_shape=block)
    b = rng.standard_normal(cout).astype(np.float32)
    policy = ExecutionPolicy(block_shape=block)
    aligned = weight_align(w, b, groups=groups, policy=policy)
    return w, b, aligned, policy


@pytest.mark.parametrize("mode", ALL_MODES)
@pytest.mark.parametrize("stride,pad", [((1, 1), (1, 1)), ((2, 2), (0, 0))])
def test_conv2d_all_modes_match_oracle(rng, mode, stride, pad):
    w, b, aligned, policy = _conv_setup(rng)
    x = rng.standard_normal((2, 10, 10, 16)).astype(np.float32)
    out = jax.jit(
        lambda x, a: conv2d(x, a, stride=stride, padding=pad, mode=mode,
                            policy=policy)
    )(x, aligned)
    ref = conv2d_reference(x, w, b, stride=stride, padding=pad)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", [ConvMode.LOWERED_SPARSE, ConvMode.SCONV])
def test_conv2d_sparse_modes_grouped(rng, mode):
    w, b, aligned, policy = _conv_setup(rng, cin=16, cout=32, groups=4,
                                        block=(4, 8))
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    out = conv2d(x, aligned, padding=(1, 1), mode=mode, policy=policy)
    ref = conv2d_reference(x, w, b, padding=(1, 1), groups=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_conv2d_ell_format_path(rng):
    w, b, aligned, policy = _conv_setup(rng)
    policy = policy.replace(sparse_format=SparseFormat.ELL)
    # ELL is built lazily: re-align under the ELL policy
    aligned = weight_align(w, b, policy=policy)
    assert aligned.ell_t is not None
    x = rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
    out = conv2d(x, aligned, padding=(1, 1), mode=ConvMode.LOWERED_SPARSE,
                 policy=policy)
    ref = conv2d_reference(x, w, b, padding=(1, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_conv2d_fused_relu(rng):
    w, b, aligned, policy = _conv_setup(rng)
    x = rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
    out = conv2d(x, aligned, padding=(1, 1), mode=ConvMode.LOWERED_SPARSE,
                 policy=policy, relu=True)
    ref = conv2d_reference(x, w, b, padding=(1, 1), relu=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
    assert (np.asarray(out) >= 0).all()


def test_conv2d_dense_fallback_below_threshold(rng):
    """A dense weight must run LOWERED_GEMM even when SCONV is requested."""
    w, b, aligned, policy = _conv_setup(rng, sparsity=0.0)
    assert aligned.bsc is None  # below threshold: no sparse artifacts built
    x = rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
    out = conv2d(x, aligned, padding=(1, 1), mode=ConvMode.SCONV, policy=policy)
    ref = conv2d_reference(x, w, b, padding=(1, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode,ceil", [("max", True), ("avg", True), ("max", False)])
def test_pool2d(rng, mode, ceil):
    x = rng.standard_normal((2, 9, 9, 4)).astype(np.float32)
    out = pool2d(x, (3, 3), stride=(2, 2), mode=mode, ceil_mode=ceil)
    # Caffe ceil mode on 9x9 k3 s2: ceil((9-3)/2)+1 = 4; floor same here
    assert out.shape == (2, 4, 4, 4)
    ref = pool2d_reference(x, (3, 3), stride=(2, 2), mode=mode)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_pool2d_ceil_mode_shape(rng):
    # 8x8, k3 s2: ceil((8-3)/2)+1 = 4 (caffe default), floor -> 3
    x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    assert pool2d(x, (3, 3), stride=(2, 2), ceil_mode=True).shape[1] == 4
    assert pool2d(x, (3, 3), stride=(2, 2), ceil_mode=False).shape[1] == 3
    # AlexNet pool1: 55x55 k3 s2 -> 27 under both roundings
    x = rng.standard_normal((1, 55, 55, 2)).astype(np.float32)
    assert pool2d(x, (3, 3), stride=(2, 2), ceil_mode=True).shape[1] == 27


def test_global_pool(rng):
    x = rng.standard_normal((2, 7, 7, 8)).astype(np.float32)
    out = pool2d(x, (1, 1), mode="avg", global_pool=True)
    np.testing.assert_allclose(
        np.asarray(out)[:, 0, 0, :], x.mean(axis=(1, 2)), rtol=1e-5
    )


def test_lrn_matches_direct(rng):
    x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    out = np.asarray(norm_ops.lrn_across_channels(x, local_size=5, alpha=1e-4,
                                                  beta=0.75))
    # direct computation
    ref = np.empty_like(x)
    for c in range(8):
        lo, hi = max(0, c - 2), min(8, c + 3)
        s = (x[..., lo:hi] ** 2).sum(-1)
        ref[..., c] = x[..., c] / (1.0 + (1e-4 / 5) * s) ** 0.75
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_batch_norm_fused_vs_split(rng):
    x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    mean = rng.standard_normal(8).astype(np.float32)
    var = np.abs(rng.standard_normal(8)).astype(np.float32)
    g = rng.standard_normal(8).astype(np.float32)
    be = rng.standard_normal(8).astype(np.float32)
    fused = norm_ops.batch_norm(x, mean, var, g, be)
    split = norm_ops.scale_bias(norm_ops.batch_norm_inference(x, mean, var), g, be)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(split), rtol=1e-4,
                               atol=1e-5)


def test_softmax_loss_and_accuracy(rng):
    logits = rng.standard_normal((8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 8)
    loss = float(loss_ops.softmax_cross_entropy(logits, labels))
    # manual
    p = np.exp(logits - logits.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = -np.log(p[np.arange(8), labels]).mean()
    assert abs(loss - ref) < 1e-5
    acc1 = float(loss_ops.accuracy(logits, labels, top_k=1))
    acc5 = float(loss_ops.accuracy(logits, labels, top_k=5))
    assert acc5 == 1.0 and 0.0 <= acc1 <= 1.0


def test_activation_semantics(rng):
    x = rng.standard_normal((4, 4)).astype(np.float32) * 3
    np.testing.assert_allclose(np.asarray(act.bnll(x)),
                               np.log1p(np.exp(x)), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(act.relu(x, 0.1)),
                               np.where(x > 0, x, 0.1 * x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(act.power(x, 2.0, 0.5, 1.0)),
                               (1.0 + 0.5 * x) ** 2, rtol=1e-5)


def test_dropout_train_vs_test(rng):
    x = jnp.ones((1000,))
    out_test = act.dropout(x, 0.5, train=False)
    np.testing.assert_array_equal(np.asarray(out_test), np.asarray(x))
    out_train = act.dropout(x, 0.5, rng=jax.random.PRNGKey(0), train=True)
    kept = np.asarray(out_train) > 0
    assert 0.35 < kept.mean() < 0.65  # ~half kept
    np.testing.assert_allclose(np.asarray(out_train)[kept], 2.0)  # 1/keep scaling
