"""Fused-slab direct sparse conv (kernels/sconv_fused.py) vs dense oracle.

Interpreter mode on CPU; the identical kernel code compiles on TPU (driven
on-chip by bench.py). Mirrors the reference-oracle pattern of
`src/caffe/test/test_convolution_layer.cpp:22-148` — every sparse kernel is
checked against `lax.conv_general_dilated` at several shapes/sparsities,
coverage the reference never had for its sparse paths (SURVEY §4).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from caffe_escoin_tpu.engine.context import ExecutionPolicy  # noqa: E402
from caffe_escoin_tpu.kernels import sconv_fused  # noqa: E402
from caffe_escoin_tpu.sparse.weight_align import weight_align  # noqa: E402
from caffe_escoin_tpu.utils.pruning import prune_conv_weight  # noqa: E402

POLICY = ExecutionPolicy(block_shape=(128, 128), interpret=True,
                         use_pallas=True, mxu_dtype="float32")


def _case(n, h, w, cin, cout, k, pad, sparsity, relu=False, bias=False,
          seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, h, w, cin)).astype(np.float32)
                    * 0.1)
    wt = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * 0.05
    wp = prune_conv_weight(wt, sparsity, (min(128, cin), 128))
    b = (rng.standard_normal(cout).astype(np.float32) * 0.1 if bias else None)
    aligned = weight_align(wp, b, policy=POLICY)
    assert sconv_fused.supported(x, aligned, (pad, pad), POLICY)
    out = sconv_fused.sconv(x, aligned, padding=(pad, pad), relu=relu,
                            policy=POLICY)
    ref = lax.conv_general_dilated(
        x, jnp.asarray(wp), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision="highest")
    if b is not None:
        ref = ref + b
    if relu:
        ref = jnp.maximum(ref, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("sparsity", [0.5, 0.75, 0.9, 0.99])
def test_3x3_sparsity_sweep(sparsity):
    _case(2, 14, 14, 256, 256, 3, 1, sparsity)


def test_1x1():
    _case(2, 14, 14, 256, 512, 1, 0, 0.9)


def test_5x5_pad2():
    _case(2, 12, 12, 96, 160, 5, 2, 0.8)


def test_small_channels_uses_small_blocks():
    _case(2, 28, 28, 64, 64, 3, 1, 0.85)


def test_bias_and_fused_relu():
    _case(2, 10, 10, 128, 128, 3, 1, 0.9, relu=True, bias=True)


def test_unaligned_width():
    # W = 7 exercises the unaligned sublane paths (slab build + row stores)
    _case(2, 7, 7, 128, 256, 3, 1, 0.9)


def test_multi_cin_block():
    # cin 256 -> 2 K-blocks per kernel offset; checks the off/cb decode
    _case(1, 9, 9, 256, 128, 3, 1, 0.7, seed=3)


def test_bf16_activations():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 14, 14, 128)).astype(np.float32)
                    * 0.1)
    wt = rng.standard_normal((3, 3, 128, 128)).astype(np.float32) * 0.05
    wp = prune_conv_weight(wt, 0.9, (128, 128))
    aligned = weight_align(wp, None, policy=POLICY)
    out = sconv_fused.sconv(x.astype(jnp.bfloat16), aligned, padding=(1, 1),
                            relu=False, policy=POLICY)
    assert out.dtype == jnp.bfloat16
    ref = lax.conv_general_dilated(
        x, jnp.asarray(wp), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision="highest")
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               rtol=0.05, atol=0.02)


def test_fused_arm_dispatch_with_residual():
    """arm=="fused" (the autotuned Pallas fused-slab winner, r3) routes
    through conv2d_sconv with the residual+ReLU epilogue applied outside
    the kernel — vs the scalar oracle."""
    from caffe_escoin_tpu.kernels.reference import conv2d_reference
    from caffe_escoin_tpu.ops.conv import conv2d_sconv

    rng = np.random.default_rng(0)
    pol = ExecutionPolicy(block_shape=(8, 8), interpret=True,
                          xbsp_arm="fused")
    w = prune_conv_weight(
        rng.standard_normal((3, 3, 16, 32)).astype(np.float32), 0.8, (8, 8))
    b = rng.standard_normal(32).astype(np.float32)
    aligned = weight_align(w, b, policy=pol)
    x = rng.standard_normal((2, 10, 10, 16)).astype(np.float32)
    res = rng.standard_normal((2, 10, 10, 32)).astype(np.float32)
    out = conv2d_sconv(jnp.asarray(x), aligned, stride=(1, 1),
                       padding=(1, 1), dilation=(1, 1), relu=True,
                       policy=pol, batch_parallel=True,
                       residual=jnp.asarray(res))
    ref = np.maximum(conv2d_reference(x, w, b, padding=(1, 1)) + res, 0.0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
