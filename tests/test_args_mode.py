"""weights-as-args inference (sparse.weight_align.split_payloads +
Net.inference_fn(weights_as_args=True)): the payloads ride as jit
arguments while the sparsity pattern stays concrete — same results, no
multi-MB weight literals in the HLO."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from caffe_escoin_tpu.engine.context import ConvMode, ExecutionPolicy  # noqa: E402
from caffe_escoin_tpu.nn.net import LayerSpec, Net  # noqa: E402
from caffe_escoin_tpu.sparse.weight_align import split_payloads  # noqa: E402
from caffe_escoin_tpu.utils.pruning import prune_conv_weight  # noqa: E402


def _net_and_aligned():
    specs = [
        LayerSpec(name="c1", type="ConvolutionReLU", bottoms=("data",),
                  tops=("a",), params=dict(num_output=32, kernel=3, pad=1)),
        LayerSpec(name="c2", type="Convolution", bottoms=("a",),
                  tops=("b",), params=dict(num_output=16, kernel=1)),
        LayerSpec(name="fc", type="InnerProduct", bottoms=("b",),
                  tops=("out",), params=dict(num_output=8)),
    ]
    pol = ExecutionPolicy(conv_mode=ConvMode.SCONV_PAR, block_shape=(8, 8))
    net = Net(specs, policy=pol, phase="test")
    params = net.init(jax.random.PRNGKey(0), {"data": (2, 8, 8, 16)})
    for n in ("c1", "c2"):
        w = np.asarray(params[n]["w"])
        params[n] = dict(params[n],
                         w=jnp.asarray(prune_conv_weight(w, 0.8, (8, 8))))
    return net, net.weight_align(params)


def test_args_mode_matches_closed_over():
    net, al = _net_and_aligned()
    x = {"data": jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, 8, 16)).astype(np.float32))}
    want = net.inference_fn(al)(x)["out"]
    got = net.inference_fn(al, weights_as_args=True)(x)["out"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_hlo_carries_no_weight_literals():
    net, al = _net_and_aligned()
    x = {"data": jnp.asarray(np.zeros((2, 8, 8, 16), np.float32))}
    graft, pl = split_payloads(al)
    txt_args = jax.jit(lambda p, i: net.apply(graft(p), i)).lower(
        pl, x).as_text()
    txt_const = jax.jit(lambda i: net.apply(al, i)).lower(x).as_text()
    assert len(txt_args) < len(txt_const) * 0.7


def test_payload_update_no_retrace():
    """Same pattern, new payload values: the jitted fn is reusable — the
    serving shape for weight updates that keep the sparsity structure."""
    net, al = _net_and_aligned()
    graft, pl = split_payloads(al)
    calls = [0]

    def fwd_py(p, i):
        calls[0] += 1
        return net.apply(graft(p), i)

    fwd = jax.jit(fwd_py)
    x = {"data": jnp.asarray(np.zeros((2, 8, 8, 16), np.float32))}
    fwd(pl, x)
    pl2 = jax.tree_util.tree_map(lambda a: a * 2, pl)
    fwd(pl2, x)
    assert calls[0] == 1  # one trace, two executions
