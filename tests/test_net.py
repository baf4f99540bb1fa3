"""Net graph runtime + LeNet/CIFAR end-to-end (reference `test_net.cpp` role,
plus the end-to-end sparse inference validation the reference lacked)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caffe_escoin_tpu.engine.context import ConvMode, ExecutionPolicy
from caffe_escoin_tpu.models import cifar, lenet
from caffe_escoin_tpu.nn import LayerSpec, Net
from caffe_escoin_tpu.sparse.weight_align import AlignedConvWeight
from caffe_escoin_tpu.utils.pruning import prune_conv_weight
from caffe_escoin_tpu.utils.timing import format_report, time_net_layerwise


def _prune_params(net, params, sparsity, block=(8, 8)):
    out = dict(params)
    for layer in net.layers:
        n = layer.spec.name
        if layer.spec.type.startswith(("Convolution", "EscConvolution")) or \
                layer.spec.type == "ConvolutionReLU":
            w = np.asarray(params[n]["w"])
            out[n] = dict(params[n])
            out[n]["w"] = jnp.asarray(prune_conv_weight(w, sparsity, block_shape=block))
    return out


def test_lenet_forward_shapes():
    net = Net(lenet.lenet5())
    params = net.init(jax.random.PRNGKey(0), {"data": (4, 28, 28, 1)})
    out = net.apply(params, {"data": jnp.zeros((4, 28, 28, 1))})
    assert out["prob"].shape == (4, 10)
    np.testing.assert_allclose(np.asarray(out["prob"]).sum(-1), 1.0, rtol=1e-5)
    # caffe lenet shape walk: 28->24 (conv5) ->12 ->8 ->4
    assert net.blob_shapes["conv1"] == (4, 24, 24, 20)
    assert net.blob_shapes["pool2"] == (4, 4, 4, 50)


@pytest.mark.parametrize("mode", [ConvMode.LOWERED_SPARSE, ConvMode.SCONV,
                                  ConvMode.SCONV_PAR])
def test_lenet_sparse_inference_matches_dense(mode):
    """Pruned LeNet: sparse-mode forward == dense forward (the end-to-end
    parity check the reference only did via top-1/top-5 eyeballing)."""
    policy = ExecutionPolicy(conv_mode=mode, block_shape=(8, 8))
    net = Net(lenet.lenet5(), policy=policy)
    params = net.init(jax.random.PRNGKey(1), {"data": (2, 28, 28, 1)})
    params = _prune_params(net, params, 0.9, block=(1, 8))
    x = {"data": jnp.asarray(np.random.default_rng(0)
                             .standard_normal((2, 28, 28, 1)), jnp.float32)}

    dense_out = net.apply(params, x)["prob"]
    aligned = net.weight_align(params)
    assert isinstance(aligned["conv2"], AlignedConvWeight)
    assert aligned["conv2"].sparsity >= 0.85
    sparse_out = jax.jit(lambda p, x: net.apply(p, x))(aligned, x)["prob"]
    np.testing.assert_allclose(np.asarray(sparse_out), np.asarray(dense_out),
                               rtol=1e-4, atol=1e-5)


def test_cifar_forward_and_align():
    policy = ExecutionPolicy(conv_mode=ConvMode.LOWERED_SPARSE, block_shape=(8, 8))
    net = Net(cifar.cifar10_quick(), policy=policy)
    params = net.init(jax.random.PRNGKey(0), {"data": (2, 32, 32, 3)})
    params = _prune_params(net, params, 0.85, block=(1, 8))
    x = {"data": jnp.asarray(np.random.default_rng(1)
                             .standard_normal((2, 32, 32, 3)), jnp.float32)}
    dense_out = net.apply(params, x)["prob"]
    aligned = net.weight_align(params)
    sparse_out = net.apply(aligned, x)["prob"]
    np.testing.assert_allclose(np.asarray(sparse_out), np.asarray(dense_out),
                               rtol=1e-4, atol=1e-5)


def test_net_loss_and_grad():
    net = Net(lenet.lenet5(include_loss=True), phase="train")
    params = net.init(jax.random.PRNGKey(0), {"data": (4, 28, 28, 1),
                                              "label": (4,)})
    batch = {"data": jnp.ones((4, 28, 28, 1)),
             "label": jnp.array([0, 1, 2, 3])}
    loss, grads = jax.value_and_grad(lambda p: net.loss(p, batch))(params)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g * g)) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_net_phase_filtering():
    specs = lenet.lenet5(include_loss=True)
    train_net = Net(specs, phase="train")
    test_net = Net(specs, phase="test")
    assert not any(l.spec.name == "accuracy" for l in train_net.layers)
    assert any(l.spec.name == "accuracy" for l in test_net.layers)


def test_net_unknown_layer_type_errors():
    with pytest.raises(KeyError, match="not registered"):
        Net([LayerSpec("x", "NoSuchLayer", ("data",))])


def test_timing_harness_runs():
    net = Net(lenet.lenet5())
    params = net.init(jax.random.PRNGKey(0), {"data": (2, 28, 28, 1)})
    params = _prune_params(net, params, 0.9, block=(1, 8))
    aligned = net.weight_align(params)
    result = time_net_layerwise(net, aligned,
                                {"data": jnp.zeros((2, 28, 28, 1))}, iters=2)
    report = format_report(result)
    assert "conv1" in report and "[totals]" in report
    assert result["categories"]["conv"] > 0
    assert result["categories"]["fc"] > 0
    # sparse conv rows carry nnz/s + GFLOP/s
    conv_rows = [r for r in result["layers"] if r["category"] == "conv"]
    assert all("nnz_per_s" in r for r in conv_rows)


def test_inference_fn_closes_over_weights():
    """Net.inference_fn keeps the sparsity pattern concrete -> XBSP arm."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from caffe_escoin_tpu.engine.context import ConvMode, ExecutionPolicy
    from caffe_escoin_tpu.models import cifar
    from caffe_escoin_tpu.nn import Net
    from caffe_escoin_tpu.utils.pruning import prune_conv_weight

    policy = ExecutionPolicy(conv_mode=ConvMode.SCONV, block_shape=(32, 32),
                             sparse_threshold=0.4, sconv_threshold=0.4)
    net = Net(cifar.cifar10_quick(), policy=policy)
    params = net.init(jax.random.PRNGKey(0), {"data": (2, 32, 32, 3)})
    pruned = {}
    for name, p in params.items():
        if isinstance(p, dict) and "w" in p and p["w"].ndim == 4 \
                and p["w"].shape[2] >= 32:
            q = dict(p)
            q["w"] = jnp.asarray(prune_conv_weight(
                np.asarray(p["w"]), 0.8, (32, 32)))
            pruned[name] = q
        else:
            pruned[name] = p
    fwd = net.inference_fn(pruned, align=True)
    out = fwd({"data": jnp.zeros((2, 32, 32, 3))})["prob"]
    assert out.shape == (2, 10)
    np.testing.assert_allclose(np.asarray(out).sum(axis=1), 1.0, rtol=1e-4)
