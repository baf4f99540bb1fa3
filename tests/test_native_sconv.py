"""Native CPU blocked direct sparse conv (csrc/sconv.cc): the host product
path (reference `caffe_cpu_blocked_sconv`, `include/caffe/util/
sconv.hpp:83-678`), validated against the scalar oracle and routed through
the conv dispatcher via ExecutionPolicy(native_cpu=True) + pure_callback."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from caffe_escoin_tpu.data import native  # noqa: E402
from caffe_escoin_tpu.engine.context import ConvMode, ExecutionPolicy  # noqa: E402
from caffe_escoin_tpu.kernels.reference import conv2d_reference  # noqa: E402
from caffe_escoin_tpu.ops import conv as conv_ops  # noqa: E402
from caffe_escoin_tpu.sparse.weight_align import weight_align  # noqa: E402
from caffe_escoin_tpu.utils.pruning import prune_conv_weight  # noqa: E402

lib = native.load_library()
pytestmark = pytest.mark.skipif(
    lib is None or not hasattr(lib, "bsc_sconv"),
    reason="native library unavailable")


@pytest.mark.parametrize("h,w,cin,cout,k,stride,pad,bias,relu", [
    (8, 8, 32, 32, 3, 1, 1, True, False),
    (9, 7, 32, 48, 3, 2, 1, True, True),
    (8, 8, 32, 32, 5, 1, 2, False, False),
    (7, 7, 48, 32, 1, 1, 0, True, True),
    (8, 8, 16, 16, 3, 1, 0, False, False),
])
def test_native_sconv_matches_oracle(h, w, cin, cout, k, stride, pad, bias,
                                     relu):
    rng = np.random.default_rng(0)
    w_ = prune_conv_weight(
        rng.standard_normal((k, k, cin, cout)).astype(np.float32),
        0.7, (16, 16))
    b = rng.standard_normal(cout).astype(np.float32) if bias else None
    pol = ExecutionPolicy(block_shape=(16, 16))
    aligned = weight_align(jnp.asarray(w_),
                           None if b is None else jnp.asarray(b),
                           policy=pol)
    x = rng.standard_normal((2, h, w, cin)).astype(np.float32)
    out = native.native_bsc_sconv(x, aligned, padding=(pad, pad),
                                  stride=(stride, stride), relu=relu)
    assert out is not None
    ref = np.asarray(conv2d_reference(x, w_, b, stride=(stride, stride),
                                      padding=(pad, pad)))
    if relu:
        ref = np.maximum(ref, 0.0)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_native_sconv_grouped():
    """Groups ride the block-diagonal BSC expansion — no special casing."""
    rng = np.random.default_rng(1)
    g, cin, cout = 2, 32, 32
    w_ = prune_conv_weight(
        rng.standard_normal((3, 3, cin // g, cout)).astype(np.float32),
        0.6, (16, 16))
    pol = ExecutionPolicy(block_shape=(16, 16))
    aligned = weight_align(jnp.asarray(w_), None, groups=g, policy=pol)
    x = rng.standard_normal((1, 8, 8, cin)).astype(np.float32)
    out = native.native_bsc_sconv(x, aligned, padding=(1, 1))
    dense = np.asarray(conv_ops.conv2d_dense(
        jnp.asarray(x), aligned.dense, None, stride=(1, 1), padding=(1, 1),
        dilation=(1, 1), groups=g))
    np.testing.assert_allclose(out, dense, rtol=1e-4, atol=1e-4)


def test_dispatcher_routes_native_cpu(monkeypatch):
    """ExecutionPolicy(native_cpu=True) on the CPU backend routes
    conv2d_sconv through the C++ kernel (observed via the binding), under
    jit, with the residual+ReLU epilogue ordered correctly."""
    rng = np.random.default_rng(2)
    w_ = prune_conv_weight(
        rng.standard_normal((3, 3, 32, 32)).astype(np.float32),
        0.7, (16, 16))
    pol = ExecutionPolicy(conv_mode=ConvMode.SCONV_PAR,
                          block_shape=(16, 16), native_cpu=True)
    aligned = weight_align(jnp.asarray(w_), None, policy=pol)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)).astype(np.float32))
    res = jnp.asarray(rng.standard_normal((2, 8, 8, 32)).astype(np.float32))

    calls = {"n": 0}
    real = native.native_bsc_sconv

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(native, "native_bsc_sconv", counting)

    fn = jax.jit(lambda y, r: conv_ops.conv2d_sconv(
        y, aligned, stride=(1, 1), padding=(1, 1), dilation=(1, 1),
        relu=True, policy=pol, batch_parallel=True, residual=r))
    out = np.asarray(fn(x, res))
    assert calls["n"] >= 1
    ref = np.asarray(conv2d_reference(np.asarray(x), w_, None,
                                      padding=(1, 1)))
    ref = np.maximum(ref + np.asarray(res), 0.0)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
