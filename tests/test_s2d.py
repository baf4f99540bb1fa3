"""Space-to-depth stem reformulation (ops/s2d.py + nn/fuse.fold_stem_s2d).

Exactness: the remapped stride-1 conv over the s2d layout must reproduce
the strided conv bit-comparably for every stem geometry in the zoo
(7x7/s2/p3, 11x11/s4/p0) plus adversarial ones (non-divisible H, pad >
kernel phase, k < r). Pass behavior: only net-input convs with square
stride >= 2 and cin*r^2 <= 128 fold; the folded net's outputs match the
unfolded net through dense AND weight-aligned sparse execution; the pack
pass leaves s2d convs alone."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from caffe_escoin_tpu.engine.context import ExecutionPolicy  # noqa: E402
from caffe_escoin_tpu.nn.fuse import fold_stem_s2d, fuse_inference  # noqa: E402
from caffe_escoin_tpu.nn.net import LayerSpec, Net  # noqa: E402
from caffe_escoin_tpu.ops import s2d  # noqa: E402
from caffe_escoin_tpu.ops.conv import conv2d_dense  # noqa: E402


@pytest.mark.parametrize("ish,k,r,p", [
    ((2, 56, 56, 3), 7, 2, 3),     # GoogLeNet/ResNet conv1 geometry
    ((2, 59, 59, 3), 11, 4, 0),    # AlexNet conv1 (H not divisible by r)
    ((2, 20, 20, 5), 5, 3, 2),
    ((2, 21, 21, 2), 3, 2, 0),
    ((2, 16, 16, 3), 2, 2, 0),     # k == r
    ((1, 30, 30, 4), 9, 3, 4),     # pad > r
])
def test_s2d_weight_exact(ish, k, r, p):
    rng = np.random.default_rng(0)
    cout = 8
    w = rng.standard_normal((k, k, ish[-1], cout)).astype(np.float32)
    x = rng.standard_normal(ish).astype(np.float32)
    y0 = np.asarray(conv2d_dense(jnp.asarray(x), jnp.asarray(w),
                                 stride=(r, r), padding=(p, p)))
    wp = s2d.s2d_weight(w, r, (p, p))
    xp = s2d.s2d_input(jnp.asarray(x), r, (k, k), (p, p))
    y1 = np.asarray(conv2d_dense(xp, jnp.asarray(wp),
                                 stride=(1, 1), padding=(0, 0)))
    assert y0.shape == y1.shape
    np.testing.assert_allclose(y0, y1, rtol=1e-5, atol=1e-5)


def test_s2d_weight_preserves_zero_structure():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((7, 7, 3, 8)).astype(np.float32)
    w[:, :, :, 4:] = 0.0  # pruned output block
    wp = s2d.s2d_weight(w, 2, (3, 3))
    assert np.all(wp[:, :, :, 4:] == 0.0)
    assert np.count_nonzero(wp) == np.count_nonzero(w)


def _stem_specs():
    return [
        LayerSpec(name="conv1", type="ConvolutionReLU", bottoms=("data",),
                  tops=("c1",),
                  params=dict(num_output=16, kernel=7, stride=2, pad=3)),
        LayerSpec(name="pool1", type="Pooling", bottoms=("c1",),
                  tops=("p1",), params=dict(kernel=3, stride=2)),
        LayerSpec(name="conv2", type="ConvolutionReLU", bottoms=("p1",),
                  tops=("c2",),
                  params=dict(num_output=16, kernel=3, stride=1, pad=1)),
    ]


def _build(policy=None, shape=(2, 32, 32, 3)):
    net = Net(_stem_specs(), policy=policy or ExecutionPolicy(),
              phase="test")
    params = net.init(jax.random.PRNGKey(0), {"data": shape})
    return net, params, shape


def test_fold_stem_s2d_marks_only_input_conv():
    net, params, shape = _build()
    fnet, fparams = fold_stem_s2d(net, params)
    by_name = {l.spec.name: l.spec for l in fnet.layers}
    assert by_name["conv1"].params["s2d_r"] == 2
    assert by_name["conv1"].params["kernel"] == [4, 4]
    assert by_name["conv1"].params["stride"] == 1
    assert "s2d_r" not in by_name["conv2"].params
    assert fparams["conv1"]["w"].shape == (4, 4, 12, 16)


def test_fold_stem_s2d_net_equality_dense_and_aligned():
    net, params, shape = _build()
    x = jnp.asarray(np.random.default_rng(2).standard_normal(shape)
                    .astype(np.float32))
    ref = net.apply(params, {"data": x})["c2"]
    fnet, fparams = fold_stem_s2d(net, params)
    out = fnet.apply(fparams, {"data": x})["c2"]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-5)
    aligned = fnet.weight_align(fparams)
    out_a = fnet.apply(aligned, {"data": x})["c2"]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out_a),
                               rtol=1e-4, atol=1e-4)


def test_fold_stem_s2d_skips_wide_or_unit_stride():
    specs = [
        LayerSpec(name="convA", type="Convolution", bottoms=("data",),
                  tops=("a",),
                  params=dict(num_output=8, kernel=3, stride=1, pad=1)),
        LayerSpec(name="convB", type="Convolution", bottoms=("wide",),
                  tops=("b",),
                  params=dict(num_output=8, kernel=3, stride=2, pad=1)),
    ]
    net = Net(specs, policy=ExecutionPolicy(), phase="test")
    params = net.init(jax.random.PRNGKey(0),
                      {"data": (1, 8, 8, 3), "wide": (1, 16, 16, 64)})
    fnet, _ = fold_stem_s2d(net, params)
    for layer in fnet.layers:
        assert "s2d_r" not in layer.spec.params  # s1 conv; 64*4 > 128


def test_pack_pass_skips_s2d_convs():
    from caffe_escoin_tpu.nn.fuse import pack_narrow_chains

    net, params, shape = _build()
    fnet, fparams = fold_stem_s2d(net, params)
    fnet.blob_shapes = getattr(net, "blob_shapes", None) or {}
    pnet = pack_narrow_chains(fnet, lanes=32)
    by_name = {l.spec.name: l.spec for l in pnet.layers}
    assert "pack_out" not in by_name["conv1"].params
    assert "pack_in" not in by_name["conv1"].params


def test_fold_after_fuse_inference_googlenet_stem():
    """The deployment order: fuse -> fold_stem_s2d on a BN-bearing stem."""
    specs = [
        LayerSpec(name="conv1", type="Convolution", bottoms=("data",),
                  tops=("c1",),
                  params=dict(num_output=8, kernel=7, stride=2, pad=3)),
        LayerSpec(name="bn1", type="BatchNorm", bottoms=("c1",),
                  tops=("b1",), params=dict(use_global_stats=True)),
        LayerSpec(name="relu1", type="ReLU", bottoms=("b1",), tops=("r1",)),
        LayerSpec(name="conv2", type="Convolution", bottoms=("r1",),
                  tops=("c2",), params=dict(num_output=8, kernel=1)),
    ]
    net = Net(specs, policy=ExecutionPolicy(), phase="test")
    shape = (2, 16, 16, 3)
    params = net.init_with_state(jax.random.PRNGKey(0), {"data": shape}) \
        if hasattr(net, "init_with_state") else net.init(
            jax.random.PRNGKey(0), {"data": shape})
    if isinstance(params, tuple):
        params, state = params
    else:
        state = net.state0
    x = jnp.asarray(np.random.default_rng(3).standard_normal(shape)
                    .astype(np.float32))
    ref = net.apply(params, {"data": x}, state=state)["c2"]
    fnet, fparams = fuse_inference(net, params, state=state)
    snet, sparams = fold_stem_s2d(fnet, fparams)
    out = snet.apply(sparams, {"data": x})["c2"]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-4, atol=1e-4)
