"""`.caffemodel` import (tools/caffemodel.py): wire-format parsing + layout
conversion, validated against a synthesized binaryproto (encoder below
mirrors the schema at `src/caffe/proto/caffe.proto`) and the framework's
own forward as oracle."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from caffe_escoin_tpu.tools.caffemodel import (  # noqa: E402
    assign_to_params,
    batchnorm_state,
    load_caffemodel,
    save_caffemodel,
)


# --- minimal protobuf wire ENCODER (test-side only) -----------------------
def _varint(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def _field(num, wire, payload):
    return _varint((num << 3) | wire) + payload


def _len_field(num, data):
    return _field(num, 2, _varint(len(data)) + data)


def _blob_msg(arr, legacy_dims=False):
    arr = np.asarray(arr, np.float32)
    msg = _len_field(5, arr.ravel().tobytes())
    if legacy_dims:
        dims = list(arr.shape)
        while len(dims) < 4:
            dims.insert(0, 1)
        for k, d in zip((1, 2, 3, 4), dims):
            msg += _field(k, 0, _varint(d))
    else:
        packed = b"".join(_varint(int(d)) for d in arr.shape)
        msg += _len_field(7, _len_field(1, packed))
    return msg


def _layer(name, ltype, blobs):
    msg = _len_field(1, name.encode()) + _len_field(2, ltype.encode())
    for b in blobs:
        msg += _len_field(7, b)
    return _len_field(100, msg)


def _v1_layer(name, type_enum, blobs):
    msg = _len_field(4, name.encode()) + _field(5, 0, _varint(type_enum))
    for b in blobs:
        msg += _len_field(6, b)
    return _len_field(2, msg)


def test_roundtrip_modern_and_legacy(tmp_path):
    rng = np.random.default_rng(0)
    wc = rng.standard_normal((20, 1, 5, 5)).astype(np.float32)  # OIHW
    bc = rng.standard_normal(20).astype(np.float32)
    wf = rng.standard_normal((10, 30)).astype(np.float32)  # [Cout, K]
    bf = rng.standard_normal(10).astype(np.float32)
    mean_s = rng.standard_normal(20).astype(np.float32)
    var_s = np.abs(rng.standard_normal(20)).astype(np.float32)
    path = str(tmp_path / "m.caffemodel")
    data = (
        _len_field(1, b"testnet")
        + _layer("conv1", "Convolution", [_blob_msg(wc), _blob_msg(bc)])
        + _layer("bn1", "BatchNorm",
                 [_blob_msg(mean_s), _blob_msg(var_s),
                  _blob_msg(np.asarray([2.0]))])
        + _v1_layer("ipX", 14, [_blob_msg(wf, legacy_dims=True),
                                _blob_msg(bf, legacy_dims=True)])
    )
    with open(path, "wb") as f:
        f.write(data)

    loaded = load_caffemodel(path)
    assert set(loaded) == {"conv1", "bn1", "ipX"}
    assert loaded["conv1"]["type"] == "Convolution"
    np.testing.assert_array_equal(loaded["conv1"]["blobs"][0], wc)
    assert loaded["ipX"]["type"] == "InnerProduct"
    np.testing.assert_array_equal(
        loaded["ipX"]["blobs"][0], wf.reshape(1, 1, 10, 30))
    st = batchnorm_state(loaded)
    # raw sums + count, one-to-one with BatchNormLayer's state schema
    np.testing.assert_allclose(st["bn1"]["mean_acc"], mean_s, rtol=1e-6)
    np.testing.assert_allclose(st["bn1"]["var_acc"], var_s, rtol=1e-6)
    assert float(st["bn1"]["count"]) == 2.0
    # dividing by count must reproduce the moving stats the layer uses
    from caffe_escoin_tpu.nn.net import LAYER_REGISTRY
    from caffe_escoin_tpu.nn import LayerSpec
    from caffe_escoin_tpu.engine.context import ExecutionPolicy
    layer = LAYER_REGISTRY["BatchNorm"](
        LayerSpec(name="bn1", type="BatchNorm", bottoms=["x"], tops=["y"]),
        ExecutionPolicy())
    mean, var = layer._moving({k: jnp.asarray(v) for k, v in st["bn1"].items()})
    np.testing.assert_allclose(np.asarray(mean), mean_s / 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), var_s / 2.0, rtol=1e-5)


def test_export_import_roundtrip_exact(tmp_path):
    """save_caffemodel -> load_caffemodel -> assign_to_params reproduces the
    original params bit-exactly (incl. the OIHW<->HWIO and fc-row
    (h,w,c)<->(c,h,w) inversions, BN state blobs, Scale gamma/beta) and
    the re-imported net computes the identical forward.

    Exercises the reverse of `Net::ToProto` (`src/caffe/net.cpp:910+`)."""
    from caffe_escoin_tpu.models import ZOO
    from caffe_escoin_tpu.nn import Net

    builder, _ = ZOO["cifar10_bn"]  # conv + BN + Scale + pool + fc
    net = Net(builder(num_classes=6), phase="test")
    shapes = {"data": (2, 32, 32, 3)}
    rng = np.random.default_rng(7)
    params = net.init(jax.random.PRNGKey(3), shapes)
    # randomize every leaf so equality is a real check (init zeros biases)
    params = jax.tree_util.tree_map(
        lambda a: np.asarray(rng.standard_normal(np.shape(a)), np.float32)
        * 0.1, params)
    state = {k: dict(v) for k, v in net.state0.items()}
    for s in state.values():
        if "mean_acc" in s:
            s["mean_acc"] = rng.standard_normal(
                np.shape(s["mean_acc"])).astype(np.float32)
            s["var_acc"] = np.abs(rng.standard_normal(
                np.shape(s["var_acc"]))).astype(np.float32) + 1.0
            s["count"] = np.float32(1.0)

    path = str(tmp_path / "rt.caffemodel")
    n = save_caffemodel(net, params, path, state=state, log=lambda m: None)
    assert n >= 3

    loaded = load_caffemodel(path)
    net2 = Net(builder(num_classes=6), phase="test")
    params2 = net2.init(jax.random.PRNGKey(0), shapes)
    imported = assign_to_params(net2, params2, loaded, log=lambda m: None)
    st2 = dict(net2.state0)
    st2.update({k: {kk: jnp.asarray(vv) for kk, vv in v.items()}
                for k, v in batchnorm_state(loaded).items()})

    for lname, p in params.items():
        for k, v in p.items():
            np.testing.assert_array_equal(
                np.asarray(imported[lname][k]), np.asarray(v),
                err_msg=f"{lname}.{k}")
    x = jnp.asarray(rng.standard_normal(shapes["data"]).astype(np.float32))
    y1 = net.apply(params, {"data": x}, state=state)
    y2 = net2.apply(imported, {"data": x}, state=st2)
    k = next(iter(y1))
    np.testing.assert_allclose(np.asarray(y1[k]), np.asarray(y2[k]),
                               rtol=1e-5, atol=1e-6)


def test_import_into_lenet_matches_manual_forward(tmp_path):
    """Import conv+fc weights into LeNet and check the imported net computes
    the same function as a manual NCHW-convention computation — validating
    the OIHW->HWIO and (c,h,w)->(h,w,c) fc-row conversions."""
    from caffe_escoin_tpu.models import ZOO
    from caffe_escoin_tpu.nn import Net

    rng = np.random.default_rng(1)
    builder, _ = ZOO["lenet"]
    net = Net(builder(num_classes=4))
    shapes = {"data": (2, 20, 20, 1)}
    params = net.init(jax.random.PRNGKey(0), shapes)

    # caffe-side weights
    wc = rng.standard_normal((20, 1, 5, 5)).astype(np.float32) * 0.1
    bc = rng.standard_normal(20).astype(np.float32) * 0.1
    k_ip1 = int(np.prod(net.blob_shapes["pool2"][1:]))
    w1 = rng.standard_normal((500, k_ip1)).astype(np.float32) * 0.02
    b1 = rng.standard_normal(500).astype(np.float32) * 0.1
    wc2_shape = np.asarray(params["conv2"]["w"].shape)  # (5,5,20,50)
    wc2 = rng.standard_normal(
        (wc2_shape[3], wc2_shape[2], wc2_shape[0], wc2_shape[1])
    ).astype(np.float32) * 0.05
    bc2 = rng.standard_normal(50).astype(np.float32) * 0.1
    w2 = rng.standard_normal((4, 500)).astype(np.float32) * 0.05
    b2 = rng.standard_normal(4).astype(np.float32) * 0.1

    path = str(tmp_path / "lenet.caffemodel")
    with open(path, "wb") as f:
        f.write(
            _layer("conv1", "Convolution", [_blob_msg(wc), _blob_msg(bc)])
            + _layer("conv2", "Convolution", [_blob_msg(wc2), _blob_msg(bc2)])
            + _layer("ip1", "InnerProduct", [_blob_msg(w1), _blob_msg(b1)])
            + _layer("ip2", "InnerProduct", [_blob_msg(w2), _blob_msg(b2)])
        )
    loaded = load_caffemodel(path)
    imported = assign_to_params(net, params, loaded, log=lambda m: None)

    x = rng.standard_normal(shapes["data"]).astype(np.float32)
    out = net.apply(imported, {"data": jnp.asarray(x)})["prob"]

    # manual NCHW-convention oracle
    from caffe_escoin_tpu.kernels.reference import conv2d_reference, \
        pool2d_reference

    h = conv2d_reference(x, wc.transpose(2, 3, 1, 0), bc)
    h = pool2d_reference(np.asarray(h), (2, 2), stride=(2, 2))
    h = conv2d_reference(np.asarray(h), wc2.transpose(2, 3, 1, 0), bc2)
    h = np.asarray(pool2d_reference(np.asarray(h), (2, 2), stride=(2, 2)))
    # caffe flattens NCHW: (c, h, w)
    flat = h.transpose(0, 3, 1, 2).reshape(h.shape[0], -1)
    h = np.maximum(flat @ w1.T + b1, 0)
    logits = h @ w2.T + b2
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), probs, rtol=1e-3, atol=1e-4)


def test_cli_export_from_npz_checkpoint_keeps_bn_stats(tmp_path):
    """Regression (r3 advisor, medium): `export_caffemodel --weights x.npz`
    must export the checkpoint's TRAINED BatchNorm moving stats, not the
    init zeros — Caffe maps blobs[2]==0 to scale 0, so a zero-stat export
    silently corrupts every BN net consumed by reference tooling
    (`src/caffe/layers/batch_norm_layer.cpp` scale-factor handling)."""
    from caffe_escoin_tpu.engine.checkpoint import save_checkpoint
    from caffe_escoin_tpu.models import ZOO
    from caffe_escoin_tpu.nn import Net
    from caffe_escoin_tpu.tools import cli

    builder, _ = ZOO["cifar10_bn"]
    net = Net(builder(), phase="test")
    params = net.init(jax.random.PRNGKey(0), {"data": (2, 32, 32, 3)})
    rng = np.random.default_rng(11)
    net_state = {}
    for name, st in net.state0.items():
        if "mean_acc" not in st:
            continue
        net_state[name] = {
            "mean_acc": rng.standard_normal(
                np.shape(st["mean_acc"])).astype(np.float32),
            "var_acc": (np.abs(rng.standard_normal(
                np.shape(st["var_acc"]))) + 1.0).astype(np.float32),
            "count": np.float32(3.0),
        }
    assert net_state, "cifar10_bn must contain BatchNorm layers"

    ckpt = str(tmp_path / "trained")
    save_checkpoint(ckpt, params, net_state=net_state)
    out = str(tmp_path / "export.caffemodel")
    rc = cli.main(["export_caffemodel", "--model", "cifar10_bn",
                   "--weights", ckpt + ".npz", "--output", out])
    assert rc in (0, None)

    exported = batchnorm_state(load_caffemodel(out))
    assert set(exported) == set(net_state)
    for name, st in net_state.items():
        got = exported[name]
        assert float(np.asarray(got["count"])) != 0.0
        np.testing.assert_allclose(np.asarray(got["mean_acc"]),
                                   st["mean_acc"], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(got["var_acc"]),
                                   st["var_acc"], rtol=1e-6)
