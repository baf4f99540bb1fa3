"""N-D convolution and stochastic pooling vs scalar oracles.

Reference coverage this mirrors: the 3-D cases of
`src/caffe/test/test_convolution_layer.cpp` (via `im2col_nd_cpu`,
`src/caffe/util/im2col.cpp:141+`) and
`src/caffe/test/test_stochastic_pooling.cpp`
(`pooling_layer.cpp:119,221,301`)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from caffe_escoin_tpu.ops.conv import convnd_dense  # noqa: E402
from caffe_escoin_tpu.ops.pool import pool2d  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def conv3d_oracle(x, w, b, stride, pad, dilation):
    """Scalar 3-D convolution (the caffe_conv reference pattern,
    test_convolution_layer.cpp:22-148, extended to 3 spatial dims)."""
    n, d, h, wd, cin = x.shape
    kd, kh, kw, _, cout = w.shape
    sd, sh, sw = stride
    pd, ph, pw = pad
    dd, dh, dw = dilation
    od = (d + 2 * pd - dd * (kd - 1) - 1) // sd + 1
    oh = (h + 2 * ph - dh * (kh - 1) - 1) // sh + 1
    ow = (wd + 2 * pw - dw * (kw - 1) - 1) // sw + 1
    xp = np.pad(x, ((0, 0), (pd, pd), (ph, ph), (pw, pw), (0, 0)))
    out = np.zeros((n, od, oh, ow, cout), np.float32)
    for zd in range(kd):
        for zh in range(kh):
            for zw in range(kw):
                patch = xp[:, zd * dd : zd * dd + (od - 1) * sd + 1 : sd,
                           zh * dh : zh * dh + (oh - 1) * sh + 1 : sh,
                           zw * dw : zw * dw + (ow - 1) * sw + 1 : sw, :]
                out += patch @ w[zd, zh, zw]
    return out + b


@pytest.mark.parametrize("stride,pad,dilation", [
    ((1, 1, 1), (1, 1, 1), (1, 1, 1)),
    ((2, 2, 2), (0, 1, 0), (1, 1, 1)),
    ((1, 1, 1), (2, 2, 2), (2, 2, 2)),
])
def test_conv3d_vs_oracle(rng, stride, pad, dilation):
    x = rng.standard_normal((2, 6, 7, 8, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 3, 4, 5)).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    out = jax.jit(lambda x: convnd_dense(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=stride,
        padding=pad, dilation=dilation))(x)
    ref = conv3d_oracle(x, w, b, stride, pad, dilation)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_conv1d_vs_2d_equivalence(rng):
    x = rng.standard_normal((2, 10, 4)).astype(np.float32)
    w = rng.standard_normal((3, 4, 6)).astype(np.float32)
    out = convnd_dense(jnp.asarray(x), jnp.asarray(w), stride=(1,),
                       padding=(1,))
    ref = convnd_dense(jnp.asarray(x)[:, :, None, :],
                       jnp.asarray(w)[:, None], stride=(1, 1),
                       padding=(1, 0))[:, :, 0, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_conv3d_through_layer(rng):
    """ConvolutionLayer dispatches rank-5 inputs to the N-D dense path,
    including shape inference and grouped channels."""
    from caffe_escoin_tpu.engine.context import ExecutionPolicy
    from caffe_escoin_tpu.nn import LayerSpec
    from caffe_escoin_tpu.nn.net import LAYER_REGISTRY

    spec = LayerSpec(name="c3", type="Convolution", bottoms=["x"],
                     tops=["y"], params={"num_output": 6, "kernel": 3,
                                         "pad": 1, "group": 2})
    layer = LAYER_REGISTRY["Convolution"](spec, ExecutionPolicy())
    x = jnp.asarray(rng.standard_normal((2, 4, 5, 6, 4)).astype(np.float32))
    params = layer.init_params(jax.random.PRNGKey(0), [x.shape])
    assert params["w"].shape == (3, 3, 3, 2, 6)
    assert layer.out_shapes(params, [x.shape]) == [(2, 4, 5, 6, 6)]
    (out,) = layer.apply(params, [x], train=False, rng=None)
    assert out.shape == (2, 4, 5, 6, 6)
    # grouped oracle: two independent halves
    w = np.asarray(params["w"])
    b = np.asarray(params["b"])
    ref0 = conv3d_oracle(np.asarray(x)[..., :2], w[..., :3], b[:3],
                         (1, 1, 1), (1, 1, 1), (1, 1, 1))
    ref1 = conv3d_oracle(np.asarray(x)[..., 2:], w[..., 3:], b[3:],
                         (1, 1, 1), (1, 1, 1), (1, 1, 1))
    np.testing.assert_allclose(np.asarray(out),
                               np.concatenate([ref0, ref1], -1),
                               rtol=1e-4, atol=1e-4)
    # align is a no-op for N-D (sparse execution is 2-D only)
    assert layer.align(params) is params


def test_stochastic_pool_test_mode_weighted_average(rng):
    x = np.abs(rng.standard_normal((2, 6, 6, 3)).astype(np.float32))
    out = pool2d(jnp.asarray(x), (2, 2), stride=(2, 2), mode="stochastic",
                 train=False)
    # oracle: sum(a^2)/sum(a) per window (pooling_layer.cpp:221)
    ref = np.zeros((2, 3, 3, 3), np.float32)
    for i in range(3):
        for j in range(3):
            win = x[:, 2 * i : 2 * i + 2, 2 * j : 2 * j + 2, :]
            s = win.sum(axis=(1, 2))
            ref[:, i, j, :] = np.where(s > 0,
                                       (win ** 2).sum(axis=(1, 2)) / s, 0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_stochastic_pool_train_samples_window_members(rng):
    """Every sampled output must be an element of its window, and the
    sampling distribution must be proportional to activations
    (test_stochastic_pooling.cpp's membership + distribution checks)."""
    x = np.abs(rng.standard_normal((1, 4, 4, 2)).astype(np.float32)) + 0.1
    xj = jnp.asarray(x)
    counts = {}
    for seed in range(300):
        out = pool2d(xj, (2, 2), stride=(2, 2), mode="stochastic",
                     train=True, rng=jax.random.PRNGKey(seed))
        o = np.asarray(out)
        for i in range(2):
            for j in range(2):
                win = x[0, 2 * i : 2 * i + 2, 2 * j : 2 * j + 2, 0]
                v = o[0, i, j, 0]
                assert np.isclose(win, v, atol=1e-6).any(), (win, v)
        counts[seed] = o[0, 0, 0, 0]
    # distribution: the max element of window (0,0) must be sampled more
    # often than the min element
    win = x[0, :2, :2, 0].ravel()
    vals = np.asarray(list(counts.values()))
    frac_max = np.isclose(vals, win.max(), atol=1e-6).mean()
    frac_min = np.isclose(vals, win.min(), atol=1e-6).mean()
    assert frac_max > frac_min


def test_stochastic_pool_all_zero_window():
    x = jnp.zeros((1, 2, 2, 1))
    out_test = pool2d(x, (2, 2), mode="stochastic", train=False)
    out_train = pool2d(x, (2, 2), mode="stochastic", train=True,
                       rng=jax.random.PRNGKey(0))
    assert float(out_test[0, 0, 0, 0]) == 0.0
    assert float(out_train[0, 0, 0, 0]) == 0.0


def test_stochastic_pool_through_layer(rng):
    from caffe_escoin_tpu.engine.context import ExecutionPolicy
    from caffe_escoin_tpu.nn import LayerSpec
    from caffe_escoin_tpu.nn.net import LAYER_REGISTRY

    spec = LayerSpec(name="p", type="Pooling", bottoms=["x"], tops=["y"],
                     params={"kernel": 2, "stride": 2, "mode": "stochastic"})
    layer = LAYER_REGISTRY["Pooling"](spec, ExecutionPolicy())
    x = jnp.asarray(np.abs(rng.standard_normal((2, 4, 4, 3))).astype(
        np.float32))
    (out_t,) = layer.apply({}, [x], train=True, rng=jax.random.PRNGKey(1))
    (out_e,) = layer.apply({}, [x], train=False, rng=None)
    assert out_t.shape == out_e.shape == (2, 2, 2, 3)
