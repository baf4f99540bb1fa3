"""Extended layer catalog: deconv, SPP, recurrent, extra losses, param
sharing, serialization, native runtime."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caffe_escoin_tpu.engine.context import ConvMode, ExecutionPolicy
from caffe_escoin_tpu.nn import LayerSpec, Net
from caffe_escoin_tpu.nn.serialize import specs_from_json, specs_to_json
from caffe_escoin_tpu.ops import losses as loss_ops
from caffe_escoin_tpu.ops.deconv import deconv2d
from caffe_escoin_tpu.ops.pool import spp
from caffe_escoin_tpu.ops.recurrent import lstm_forward, rnn_forward


def test_deconv_shape_and_inverse_of_conv(rng):
    # caffe sizing: out = (in-1)*s + k - 2p
    x = rng.standard_normal((2, 7, 7, 4)).astype(np.float32)
    w = rng.standard_normal((4, 4, 4, 6)).astype(np.float32)
    out = deconv2d(jnp.asarray(x), jnp.asarray(w), stride=(2, 2), padding=(1, 1))
    assert out.shape == (2, (7 - 1) * 2 + 4 - 2, (7 - 1) * 2 + 4 - 2, 6)
    # transpose property: <deconv(x), y> == <x, conv(y)>
    from caffe_escoin_tpu.ops.conv import conv2d_dense

    y = rng.standard_normal(out.shape).astype(np.float32)
    lhs = float(jnp.sum(out * y))
    # adjoint contracts the output channels: conv with w's I/O swapped
    conv_y = conv2d_dense(jnp.asarray(y), jnp.asarray(w.transpose(0, 1, 3, 2)),
                          stride=(2, 2), padding=(1, 1))
    rhs = float(jnp.sum(jnp.asarray(x) * conv_y))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-3)


def test_spp_output_size(rng):
    x = rng.standard_normal((2, 9, 11, 5)).astype(np.float32)
    out = spp(jnp.asarray(x), 3)
    assert out.shape == (2, 5 * (1 + 4 + 16))


def test_rnn_reset_and_recurrence(rng):
    t, n, d, h = 5, 3, 4, 6
    x = rng.standard_normal((t, n, d)).astype(np.float32)
    cont = np.ones((t, n), np.float32)
    cont[0] = 0  # sequence start
    wx = rng.standard_normal((d, h)).astype(np.float32) * 0.1
    wh = rng.standard_normal((h, h)).astype(np.float32) * 0.1
    b = np.zeros(h, np.float32)
    hs = np.asarray(rnn_forward(jnp.asarray(x), jnp.asarray(cont),
                                wx, wh, b))
    # manual
    h_prev = np.zeros((n, h), np.float32)
    for step in range(t):
        h_prev = np.tanh(x[step] @ wx + (h_prev * cont[step][:, None]) @ wh + b)
        np.testing.assert_allclose(hs[step], h_prev, rtol=1e-4, atol=1e-5)


def test_lstm_matches_manual(rng):
    t, n, d, h = 4, 2, 3, 5
    x = rng.standard_normal((t, n, d)).astype(np.float32)
    cont = np.ones((t, n), np.float32)
    cont[0] = 0
    wx = rng.standard_normal((d, 4 * h)).astype(np.float32) * 0.2
    wh = rng.standard_normal((h, 4 * h)).astype(np.float32) * 0.2
    b = rng.standard_normal(4 * h).astype(np.float32) * 0.1
    hs, (h_last, c_last) = lstm_forward(jnp.asarray(x), jnp.asarray(cont),
                                        wx, wh, b)

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    hp = np.zeros((n, h), np.float32)
    cp = np.zeros((n, h), np.float32)
    for step in range(t):
        m = cont[step][:, None]
        gates = x[step] @ wx + (hp * m) @ wh + b
        i, f, o, g = np.split(gates, 4, axis=-1)
        cp = sig(f) * (cp * m) + sig(i) * np.tanh(g)
        hp = sig(o) * np.tanh(cp)
        np.testing.assert_allclose(np.asarray(hs)[step], hp, rtol=1e-4,
                                   atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), hp, rtol=1e-4, atol=1e-5)


def test_extra_losses(rng):
    probs = np.abs(rng.standard_normal((4, 3))).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    labels = np.array([0, 1, 2, 1])
    mll = float(loss_ops.multinomial_logistic_loss(jnp.asarray(probs),
                                                   jnp.asarray(labels)))
    ig = float(loss_ops.infogain_loss(jnp.asarray(probs), jnp.asarray(labels),
                                      jnp.eye(3)))
    np.testing.assert_allclose(mll, ig, rtol=1e-5)  # H=I equivalence
    a = rng.standard_normal((6, 4)).astype(np.float32)
    b = rng.standard_normal((6, 4)).astype(np.float32)
    sim = np.array([1, 1, 0, 0, 1, 0])
    cl = float(loss_ops.contrastive_loss(jnp.asarray(a), jnp.asarray(b),
                                         jnp.asarray(sim)))
    assert cl > 0


def test_recurrent_layers_in_net():
    specs = [
        LayerSpec("lstm", "LSTM", ("x", "cont"),
                  params=dict(num_output=8)),
        LayerSpec("rnn", "RNN", ("lstm", "cont"), params=dict(num_output=4)),
    ]
    net = Net(specs)
    params = net.init(jax.random.PRNGKey(0), {"x": (6, 2, 5), "cont": (6, 2)})
    out = net.apply(params, {"x": jnp.ones((6, 2, 5)),
                             "cont": jnp.ones((6, 2))})
    assert out["rnn"].shape == (6, 2, 4)


def test_param_sharing_siamese():
    """Two branches sharing one conv's weights (Caffe `param { name }`)."""
    specs = [
        LayerSpec("conv_a", "Convolution", ("xa",),
                  params=dict(num_output=4, kernel=3, pad=1)),
        LayerSpec("conv_b", "Convolution", ("xb",),
                  params=dict(num_output=4, kernel=3, pad=1),
                  share_params="conv_a"),
    ]
    net = Net(specs)
    params = net.init(jax.random.PRNGKey(0), {"xa": (1, 6, 6, 2),
                                              "xb": (1, 6, 6, 2)})
    assert "conv_b" not in params  # no second copy
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 6, 6, 2)), jnp.float32)
    out = net.apply(params, {"xa": x, "xb": x})
    np.testing.assert_allclose(np.asarray(out["conv_a"]),
                               np.asarray(out["conv_b"]), rtol=1e-6)


def test_serialization_roundtrip():
    from caffe_escoin_tpu.models import resnet
    from caffe_escoin_tpu.nn.serialize import load_net, save_net
    import tempfile, os

    specs = resnet.resnet50(include_loss=True)
    text = specs_to_json(specs, name="resnet50")
    back = specs_from_json(text)
    assert len(back) == len(specs)
    for a, b in zip(specs, back):
        assert a.name == b.name and a.type == b.type
        assert a.bottoms == b.bottoms and a.tops == b.tops
        assert a.params == b.params and a.phase == b.phase
    # net built from deserialized specs produces identical structure
    net = Net(back, phase="test")
    assert any(l.spec.type == "Eltwise" for l in net.layers)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "net.json")
        save_net(p, specs)
        assert len(load_net(p)) == len(specs)


def test_serialization_upgrade_hook():
    from caffe_escoin_tpu.nn import serialize

    doc = '{"format_version": 0, "layers": [{"name": "x", "type": "OldReLU"}]}'

    def upgrade_0(d):
        for layer in d["layers"]:
            if layer["type"] == "OldReLU":
                layer["type"] = "ReLU"
        return d

    serialize.UPGRADERS[0] = upgrade_0
    try:
        specs = specs_from_json(doc)
        assert specs[0].type == "ReLU"
    finally:
        del serialize.UPGRADERS[0]


def test_bf16_compute_path(rng):
    policy = ExecutionPolicy(compute_dtype=jnp.bfloat16)
    specs = [LayerSpec("conv", "Convolution", ("data",),
                       params=dict(num_output=8, kernel=3, pad=1))]
    net = Net(specs, policy=policy)
    params = net.init(jax.random.PRNGKey(0), {"data": (1, 6, 6, 4)})
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 4)), jnp.float32)
    out = net.apply(params, {"data": x})["conv"]
    assert out.dtype == jnp.float32  # cast back
    dense_net = Net(specs)
    ref = dense_net.apply(params, {"data": x})["conv"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-2,
                               atol=5e-2)


def test_misc_new_layers(rng):
    x = rng.standard_normal((4, 3)).astype(np.float32)
    net = Net([LayerSpec("reindex", "BatchReindex", ("x", "idx"))])
    net.init(jax.random.PRNGKey(0), {"x": (4, 3), "idx": (2,)})
    out = net.apply({}, {"x": jnp.asarray(x), "idx": jnp.array([2, 0])})
    np.testing.assert_array_equal(np.asarray(out["reindex"]), x[[2, 0]])

    pnet = Net([LayerSpec("p", "Parameter", (),
                          params=dict(shape=(3, 2),
                                      filler={"type": "constant", "value": 2.0}))])
    pp = pnet.init(jax.random.PRNGKey(0), {})
    out = pnet.apply(pp, {})
    np.testing.assert_array_equal(np.asarray(out["p"]), np.full((3, 2), 2.0))


def test_python_layer_resolves_user_class(tmp_path, monkeypatch):
    """Reference PythonLayer (`python_layer.hpp`): `type: "Python"` +
    python_param {module, layer} resolves a user Layer subclass by name,
    both from LayerSpec and from prototxt text."""
    import sys

    mod = tmp_path / "userlayers.py"
    mod.write_text(
        "import jax.numpy as jnp\n"
        "from caffe_escoin_tpu.nn import Layer\n"
        "class DoubleLayer(Layer):\n"
        "    def apply(self, params, inputs, *, train, rng):\n"
        "        return [inputs[0] * 2.0]\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    sys.modules.pop("userlayers", None)

    specs = [
        LayerSpec("data", "Input", (), ("data",)),
        LayerSpec("dbl", "Python", ("data",), ("dbl",),
                  params=dict(module="userlayers", layer="DoubleLayer")),
    ]
    net = Net(specs)
    params = net.init(jax.random.PRNGKey(0), {"data": (2, 3)})
    x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(2, 3))
    out = net.apply(params, {"data": x})["dbl"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)

    # same through prototxt ingestion
    from caffe_escoin_tpu.tools.prototxt import net_from_prototxt
    txt = '''
name: "pynet"
layer { name: "data" type: "Input" top: "data"
        input_param { shape { dim: 2 dim: 3 } } }
layer { name: "dbl" type: "Python" bottom: "data" top: "dbl"
        python_param { module: "userlayers" layer: "DoubleLayer" } }
'''
    pspecs, shapes, _ = net_from_prototxt(txt)
    net2 = Net(pspecs)
    p2 = net2.init(jax.random.PRNGKey(0), {"data": (2, 3)})
    out2 = net2.apply(p2, {"data": x})["dbl"]
    np.testing.assert_allclose(np.asarray(out2), np.asarray(x) * 2.0)


def test_fc_forced_arm_overrides_block_density_gate(monkeypatch):
    """A forced policy.xbsp_arm bypasses the InnerProduct block-density
    gate, mirroring the conv dispatcher's ordering (best_arm honors a
    non-auto arm first) — so `--xbsp-arm gathered` can exercise the fc
    sparse path even on block-dense (unstructured-pruned) weights, and
    `--xbsp-arm dense` forces the dense matmul."""
    from caffe_escoin_tpu.nn.layers import InnerProductLayer
    from caffe_escoin_tpu.ops import linear as linear_ops
    from caffe_escoin_tpu.utils.pruning import prune_magnitude

    k, m, b = 256, 128, 4
    rng = np.random.default_rng(0)
    w = prune_magnitude(
        rng.standard_normal((k, m)).astype(np.float32), 0.9)
    x = jnp.asarray(rng.standard_normal((b, k)).astype(np.float32))

    calls = {"sparse": 0}
    real = linear_ops.linear_sparse

    def counting(*a, **kw):
        calls["sparse"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(linear_ops, "linear_sparse", counting)

    outs = {}
    for arm in ("auto", "gathered", "dense"):
        pol = ExecutionPolicy(conv_mode=ConvMode.SCONV_PAR,
                              block_shape=(8, 8), xbsp_arm=arm)
        layer = InnerProductLayer(
            LayerSpec(name="fc", type="InnerProduct", bottoms=["x"],
                      tops=["y"], params={"num_output": m}),
            pol)
        aligned = layer.align({"w": jnp.asarray(w)})
        # 90% unstructured at 8x8 blocks is still block-dense enough to
        # trip the gate; the forced arm must override it either way
        before = calls["sparse"]
        (out,) = layer.apply(aligned, [x], train=False, rng=None)
        outs[arm] = (np.asarray(out), calls["sparse"] - before)

    # auto + block-dense -> gate routes dense; forced sparse arm -> sparse
    # executor runs; forced dense -> dense even though bsc exists
    assert outs["gathered"][1] >= 1
    assert outs["dense"][1] == 0
    ref = x @ jnp.asarray(w)
    for arm, (out, _) in outs.items():
        np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-4,
                                   atol=2e-4, err_msg=arm)
