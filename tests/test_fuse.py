"""Inference graph fusion (nn/fuse.py): BN/Scale/ReLU affine folding and
Eltwise-residual folding, validated against the unfused net as oracle.

The reference has no counterpart pass (it launches Conv/BN/Scale/ReLU as
four kernels, `models/resnet/test_sconv.prototxt`); the oracle here is this
framework's own unfused execution, which is itself tested against scalar
references elsewhere."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caffe_escoin_tpu.engine.context import ConvMode, ExecutionPolicy
from caffe_escoin_tpu.models import resnet
from caffe_escoin_tpu.nn import LayerSpec, Net, fuse_inference
from caffe_escoin_tpu.sparse.weight_align import AlignedConvWeight
from caffe_escoin_tpu.utils.pruning import prune_conv_weight


def _conv_bn_scale_relu_specs():
    return [
        LayerSpec("conv1", "Convolution", ("data",),
                  params=dict(num_output=24, kernel=3, pad=1,
                              bias_term=False)),
        LayerSpec("bn1", "BatchNorm", ("conv1",), tops=("c1_bn",),
                  params=dict(use_global_stats=True)),
        LayerSpec("sc1", "Scale", ("c1_bn",), tops=("c1_sc",)),
        LayerSpec("relu1", "ReLU", ("c1_sc",), tops=("c1_r",)),
        LayerSpec("conv2", "Convolution", ("c1_r",),
                  params=dict(num_output=16, kernel=1, bias_term=True)),
        LayerSpec("bn2", "BatchNorm", ("conv2",), tops=("c2_bn",),
                  params=dict(use_global_stats=True)),
    ]


def _rand_state(net, rng):
    """BN state with non-trivial moving stats (count > 0)."""
    state = {}
    for layer in net.layers:
        if layer.spec.type != "BatchNorm":
            continue
        c = net.blob_shapes[layer.spec.bottoms[0]][-1]
        state[layer.spec.name] = {
            "mean_acc": jnp.asarray(rng.standard_normal(c), jnp.float32) * 3.0,
            "var_acc": jnp.asarray(rng.uniform(0.5, 8.0, c), jnp.float32),
            "count": jnp.asarray(2.0, jnp.float32),
        }
    return state


def _rand_scale(params, name, c, rng):
    params[name] = {
        "gamma": jnp.asarray(rng.uniform(0.5, 1.5, c), jnp.float32),
        "beta": jnp.asarray(rng.standard_normal(c), jnp.float32),
    }


def test_affine_fold_matches_unfused(rng):
    net = Net(_conv_bn_scale_relu_specs(), phase="test")
    params = net.init(jax.random.PRNGKey(0), {"data": (2, 8, 8, 6)})
    state = _rand_state(net, rng)
    _rand_scale(params, "sc1", 24, rng)
    x = {"data": jnp.asarray(rng.standard_normal((2, 8, 8, 6)), jnp.float32)}

    ref = net.apply(params, x, state=state)["c2_bn"]
    fnet, fparams = fuse_inference(net, params, state=state)
    # conv1+bn1+sc1+relu1 -> one layer; conv2+bn2 -> one layer
    assert [l.spec.name for l in fnet.layers][1:] == ["conv1", "conv2"] or \
        [l.spec.name for l in fnet.layers] == ["conv1", "conv2"]
    conv1 = next(l for l in fnet.layers if l.spec.name == "conv1")
    assert conv1.spec.params["fuse_relu"]
    assert conv1.spec.params["bias_term"]
    assert "b" in fparams["conv1"]
    out = fnet.apply(fparams, x)
    got = out["c2_bn"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    # Scale params are consumed by the fold
    assert "sc1" not in fparams


def test_fold_preserves_sparsity_pattern(rng):
    net = Net(_conv_bn_scale_relu_specs(), phase="test")
    params = net.init(jax.random.PRNGKey(0), {"data": (2, 8, 8, 6)})
    w = np.asarray(params["conv1"]["w"])
    params["conv1"] = {"w": jnp.asarray(
        prune_conv_weight(w, 0.7, block_shape=(1, 8)))}
    state = _rand_state(net, rng)
    _rand_scale(params, "sc1", 24, rng)
    fnet, fparams = fuse_inference(net, params, state=state)
    w0 = np.asarray(params["conv1"]["w"])
    w1 = np.asarray(fparams["conv1"]["w"])
    np.testing.assert_array_equal(w0 == 0, w1 == 0)


def _residual_specs():
    # a minimal bottleneck tail: two parallel convs summed, then ReLU
    return [
        LayerSpec("convA", "Convolution", ("data",),
                  params=dict(num_output=16, kernel=1, bias_term=True)),
        LayerSpec("convB", "Convolution", ("convA",),
                  params=dict(num_output=16, kernel=3, pad=1,
                              bias_term=False)),
        LayerSpec("bnB", "BatchNorm", ("convB",), tops=("b_bn",),
                  params=dict(use_global_stats=True)),
        LayerSpec("add", "Eltwise", ("convA", "b_bn")),
        LayerSpec("relu", "ReLU", ("add",), tops=("out",)),
    ]


def test_residual_fold_matches_unfused(rng):
    net = Net(_residual_specs(), phase="test")
    params = net.init(jax.random.PRNGKey(1), {"data": (2, 6, 6, 8)})
    state = _rand_state(net, rng)
    x = {"data": jnp.asarray(rng.standard_normal((2, 6, 6, 8)), jnp.float32)}
    ref = net.apply(params, x, state=state)["out"]

    fnet, fparams = fuse_inference(net, params, state=state)
    names = [l.spec.name for l in fnet.layers]
    assert "add" not in names and "relu" not in names and "bnB" not in names
    convB = next(l for l in fnet.layers if l.spec.name == "convB")
    assert convB.spec.params["fuse_add"]
    assert convB.spec.params["fuse_relu"]
    assert convB.spec.bottoms == ("convA", "convA")
    out = fnet.apply(fparams, x)["out"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", [ConvMode.LOWERED_GEMM, ConvMode.SCONV_PAR,
                                  ConvMode.SCONV])
def test_resnet50_fused_matches_unfused(mode, rng):
    """Two-stage ResNet-50 head: fused+aligned sparse forward == unfused
    dense forward (the whole-net e2e deployment path of bench.py)."""
    pol = ExecutionPolicy(conv_mode=mode, block_shape=(8, 8),
                          sparse_threshold=0.5, sconv_threshold=0.5)
    specs = resnet.resnet50(num_classes=16)
    net = Net(specs, policy=pol, phase="test")
    params = net.init(jax.random.PRNGKey(2), {"data": (1, 64, 64, 3)})
    state = _rand_state(net, rng)
    # prune every conv except conv1 (3-channel input)
    for layer in net.layers:
        n = layer.spec.name
        if layer.spec.type != "Convolution" or n == "conv1":
            continue
        w = np.asarray(params[n]["w"])
        q = dict(params[n])
        q["w"] = jnp.asarray(prune_conv_weight(w, 0.8, block_shape=(1, 8)))
        params[n] = q
    x = {"data": jnp.asarray(rng.standard_normal((1, 64, 64, 3)),
                             jnp.float32)}
    ref = net.apply(params, x, state=state)["prob"]

    fnet, fparams = fuse_inference(net, params, state=state)
    # every bottleneck's Eltwise+ReLU must be folded
    types = [l.spec.type for l in fnet.layers]
    assert "Eltwise" not in types
    assert "BatchNorm" not in types and "Scale" not in types
    n_fuse_add = sum(1 for l in fnet.layers
                     if l.spec.params.get("fuse_add"))
    assert n_fuse_add == 16  # one per bottleneck block
    aligned = fnet.weight_align(fparams)
    out = jax.jit(lambda q: fnet.apply(q, x))(aligned)["prob"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-4)


def test_fc_relu_fold(rng):
    specs = [
        LayerSpec("fc1", "InnerProduct", ("data",),
                  params=dict(num_output=32)),
        LayerSpec("relu1", "ReLU", ("fc1",), tops=("fc1_r",)),
        LayerSpec("fc2", "InnerProduct", ("fc1_r",),
                  params=dict(num_output=8)),
    ]
    net = Net(specs, phase="test")
    params = net.init(jax.random.PRNGKey(3), {"data": (4, 20)})
    x = {"data": jnp.asarray(rng.standard_normal((4, 20)), jnp.float32)}
    ref = net.apply(params, x)["fc2"]
    fnet, fparams = fuse_inference(net, params)
    assert len(fnet.layers) == 2
    assert fnet.layers[0].spec.params["fuse_relu"]
    out = fnet.apply(fparams, x)["fc2"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_no_fold_across_multi_consumer(rng):
    """A blob read twice (the bottleneck input feeding both branches) must
    not be folded past."""
    specs = [
        LayerSpec("conv1", "Convolution", ("data",),
                  params=dict(num_output=8, kernel=1)),
        LayerSpec("reluA", "ReLU", ("conv1",), tops=("a",)),
        # conv1's top ALSO read here -> the ReLU cannot fold into conv1
        LayerSpec("convC", "Convolution", ("conv1",), tops=("c",),
                  params=dict(num_output=8, kernel=1)),
        LayerSpec("add", "Eltwise", ("a", "c")),
    ]
    net = Net(specs, phase="test")
    params = net.init(jax.random.PRNGKey(4), {"data": (2, 4, 4, 4)})
    x = {"data": jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)}
    ref = net.apply(params, x)["add"]
    fnet, fparams = fuse_inference(net, params)
    assert any(l.spec.name == "reluA" for l in fnet.layers)
    out = fnet.apply(fparams, x)["add"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_train_phase_bn_not_folded(rng):
    """BN without use_global_stats in a train-phase net must survive."""
    specs = [
        LayerSpec("conv1", "Convolution", ("data",),
                  params=dict(num_output=8, kernel=1)),
        LayerSpec("bn1", "BatchNorm", ("conv1",), tops=("b",)),
    ]
    net = Net(specs, policy=ExecutionPolicy(), phase="train")
    params = net.init(jax.random.PRNGKey(5), {"data": (2, 4, 4, 4)})
    fnet, _ = fuse_inference(net, params)
    assert any(l.spec.type == "BatchNorm" for l in fnet.layers)
