"""pack_narrow_chains (nn/fuse.py): the W-pair packed-layout pass.

Equality: a packed net must produce bit-comparable outputs to the unpacked
net on the SAME params, through both the dense layer path and the
weight-aligned XBSP path, including residual (fuse_add) bottoms and a
packed-emitting pooling producer. Structure: the fixpoint must pack the
residual tower, terminate at strided boundary consumers, and refuse blobs
whose layout cannot close (pool consumers, final tops)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from caffe_escoin_tpu.engine.context import ExecutionPolicy  # noqa: E402
from caffe_escoin_tpu.nn.fuse import pack_narrow_chains  # noqa: E402
from caffe_escoin_tpu.nn.net import LayerSpec, Net  # noqa: E402


def _tower_specs():
    """Post-fusion shape of a bottleneck stage: stem -> reduce -> k3 ->
    expand(+residual) -> strided boundary conv."""
    return [
        LayerSpec(name="conv0", type="ConvolutionReLU", bottoms=("data",),
                  tops=("s",), params=dict(num_output=8, kernel=1, pad=0)),
        LayerSpec(name="convA", type="ConvolutionReLU", bottoms=("s",),
                  tops=("a",), params=dict(num_output=4, kernel=1, pad=0)),
        LayerSpec(name="convB", type="ConvolutionReLU", bottoms=("a",),
                  tops=("b",), params=dict(num_output=4, kernel=3, pad=1)),
        LayerSpec(name="convC", type="Convolution", bottoms=("b", "s"),
                  tops=("c",),
                  params=dict(num_output=8, kernel=1, pad=0, fuse_add=True,
                              fuse_relu=True)),
        LayerSpec(name="convD", type="Convolution", bottoms=("c",),
                  tops=("d",), params=dict(num_output=8, kernel=1, pad=0,
                                           stride=2)),
    ]


def _build(policy=None):
    net = Net(_tower_specs(), policy=policy or ExecutionPolicy(),
              phase="test")
    params = net.init(jax.random.PRNGKey(0), {"data": (2, 6, 16, 8)})
    return net, params


def test_fixpoint_marks_tower_and_terminates_at_stride():
    net, params = _build()
    pnet = pack_narrow_chains(net, lanes=8)
    marked = pnet.packed_blobs
    # the narrow blobs (C=4 at lanes=8 -> r=2) and the residual-coupled
    # wide blobs are packed; the strided consumer's output is not
    assert marked == {"a": 2, "b": 2, "s": 2, "c": 2}
    by_name = {l.spec.name: l.spec for l in pnet.layers}
    assert by_name["convA"].params["pack_in"] == 2
    assert by_name["convA"].params["pack_out"] == 2
    assert by_name["convB"].params["pack_in"] == 2
    assert by_name["convC"].params["pack_out"] == 2
    assert by_name["convD"].params["pack_in"] == 2
    assert "pack_out" not in by_name["convD"].params or \
        by_name["convD"].params.get("pack_out", 1) == 1
    assert pnet.blob_shapes["a"] == (2, 6, 8, 8)


def test_packed_equals_unpacked_dense_path():
    net, params = _build()
    pnet = pack_narrow_chains(net, lanes=8)
    x = {"data": jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 6, 16, 8)).astype(np.float32))}
    want = net.apply(params, x)
    got = pnet.apply(params, x)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-5)


def test_packed_equals_unpacked_aligned_path():
    pol = ExecutionPolicy(block_shape=(4, 4))
    net, params = _build(pol)
    pnet = pack_narrow_chains(net, lanes=8)
    x = {"data": jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 6, 16, 8)).astype(np.float32))}
    want = net.apply(net.weight_align(params), x)
    got = pnet.apply(pnet.weight_align(params), x)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-4, atol=1e-4)


def test_pool_producer_packs_and_pool_consumer_blocks():
    specs = [
        LayerSpec(name="conv0", type="Convolution", bottoms=("data",),
                  tops=("c0",), params=dict(num_output=4, kernel=3, pad=1)),
        LayerSpec(name="pool1", type="Pooling", bottoms=("c0",),
                  tops=("p1",), params=dict(kernel=2, stride=2)),
        LayerSpec(name="conv1", type="Convolution", bottoms=("p1",),
                  tops=("c1",), params=dict(num_output=4, kernel=3, pad=1)),
        LayerSpec(name="conv2", type="Convolution", bottoms=("c1",),
                  tops=("c2",), params=dict(num_output=8, kernel=1, pad=0,
                                            stride=2)),
    ]
    net = Net(specs, phase="test")
    params = net.init(jax.random.PRNGKey(2), {"data": (2, 8, 16, 4)})
    pnet = pack_narrow_chains(net, lanes=8)
    # the whole chain packs: conv0 emits packed, the pool consumes AND
    # emits packed (2x2/s2 has integral packed stride), conv2 terminates
    assert pnet.packed_blobs.get("c0") == 2
    assert pnet.packed_blobs.get("p1") == 2
    assert pnet.packed_blobs.get("c1") == 2
    by_name = {l.spec.name: l.spec for l in pnet.layers}
    assert by_name["pool1"].params["pack_in"] == 2
    assert by_name["pool1"].params["pack_out"] == 2

    x = {"data": jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 8, 16, 4)).astype(np.float32))}
    want = net.apply(params, x)
    got = pnet.apply(params, x)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-5)


def test_avg_pool_packed_out_matches():
    from caffe_escoin_tpu.ops import pool as pool_ops
    from caffe_escoin_tpu.ops import wpack
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 7, 14, 3)).astype(np.float32))
    for mode in ("max", "avg"):
        want = pool_ops.pool2d(x, (3, 3), stride=(2, 2), padding=(1, 1),
                               mode=mode)
        got = pool_ops.pool2d_packed_out(x, (3, 3), stride=(2, 2),
                                         padding=(1, 1), mode=mode, r=2)
        np.testing.assert_allclose(
            np.asarray(wpack.unpack_nhwc(np.asarray(got), 2)),
            np.asarray(want), rtol=1e-6, atol=1e-6)


def test_pool2d_packed_through_variants():
    from caffe_escoin_tpu.ops import pool as pool_ops
    from caffe_escoin_tpu.ops import wpack
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 9, 16, 3)).astype(np.float32))
    xp = jnp.asarray(wpack.pack_nhwc(np.asarray(x), 2))
    for mode in ("max", "avg"):
        for kern, st, pad in (((2, 2), (2, 2), (0, 0)),
                              ((3, 3), (2, 2), (0, 0)),
                              ((3, 3), (2, 2), (1, 1)),   # ResNet pool1
                              ((3, 3), (4, 4), (1, 1))):  # sw != r_in path
            want = pool_ops.pool2d(x, kern, stride=st, padding=pad,
                                   mode=mode)
            wo = want.shape[2]
            # packed -> packed (when pooled width allows)
            if wo % 2 == 0:
                got = pool_ops.pool2d_packed(xp, kern, stride=st,
                                             padding=pad, mode=mode,
                                             r_in=2, r_out=2)
                np.testing.assert_allclose(
                    wpack.unpack_nhwc(np.asarray(got), 2),
                    np.asarray(want), rtol=1e-6, atol=1e-6,
                    err_msg=f"{mode} {kern} {pad} packed->packed")
            # packed -> unpacked
            got1 = pool_ops.pool2d_packed(xp, kern, stride=st,
                                          padding=pad, mode=mode,
                                          r_in=2, r_out=1)
            np.testing.assert_allclose(
                np.asarray(got1), np.asarray(want), rtol=1e-6, atol=1e-6,
                err_msg=f"{mode} {kern} {pad} packed->unpacked")


def test_lrn_groups_matches_logical():
    from caffe_escoin_tpu.ops import norm as norm_ops
    from caffe_escoin_tpu.ops import wpack
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 3, 8, 6)).astype(np.float32)
    want = norm_ops.lrn_across_channels(jnp.asarray(x), local_size=5)
    xp = wpack.pack_nhwc(x, 2)
    got = norm_ops.lrn_across_channels(jnp.asarray(xp), local_size=5,
                                       groups=2)
    np.testing.assert_allclose(
        wpack.unpack_nhwc(np.asarray(got), 2), np.asarray(want),
        rtol=1e-5, atol=1e-5)


def test_stem_chain_packs_through_lrn_and_pool():
    """GoogLeNet-stem shape: pool(pack_out) -> LRN -> 1x1 -> 3x3 -> LRN ->
    pool/s2 (packed-in, unpacked out)."""
    specs = [
        LayerSpec(name="conv1", type="ConvolutionReLU", bottoms=("data",),
                  tops=("c1",), params=dict(num_output=4, kernel=3, pad=1,
                                            stride=2)),
        LayerSpec(name="pool1", type="Pooling", bottoms=("c1",),
                  tops=("p1",), params=dict(kernel=3, stride=2)),
        LayerSpec(name="norm1", type="LRN", bottoms=("p1",), tops=("n1",),
                  params=dict(local_size=3)),
        LayerSpec(name="reduce", type="ConvolutionReLU", bottoms=("n1",),
                  tops=("rd",), params=dict(num_output=4, kernel=1, pad=0)),
        LayerSpec(name="conv2", type="ConvolutionReLU", bottoms=("rd",),
                  tops=("c2",), params=dict(num_output=6, kernel=3, pad=1)),
        LayerSpec(name="norm2", type="LRN", bottoms=("c2",), tops=("n2",),
                  params=dict(local_size=3)),
        LayerSpec(name="pool2", type="Pooling", bottoms=("n2",),
                  tops=("p2",), params=dict(kernel=3, stride=2)),
        LayerSpec(name="convT", type="Convolution", bottoms=("p2",),
                  tops=("t",), params=dict(num_output=8, kernel=1, pad=0)),
    ]
    net = Net(specs, phase="test")
    params = net.init(jax.random.PRNGKey(4), {"data": (2, 18, 34, 3)})
    pnet = pack_narrow_chains(net, lanes=8)
    # c1 (conv->pool, 17-wide odd) unpacked; p1/n1/rd/c2/n2 packed; p2
    # (pool2 out, consumed by plain conv) unpacked
    assert set(pnet.packed_blobs) == {"p1", "n1", "rd", "c2", "n2"}, \
        pnet.packed_blobs
    by_name = {l.spec.name: l.spec for l in pnet.layers}
    assert by_name["pool1"].params["pack_out"] == 2
    assert by_name["norm1"].params["pack_in"] == 2
    assert by_name["pool2"].params["pack_in"] == 2
    assert by_name["pool2"].params.get("pack_out", 1) == 1

    x = {"data": jnp.asarray(np.random.default_rng(7).standard_normal(
        (2, 18, 34, 3)).astype(np.float32))}
    want = net.apply(params, x)
    got = pnet.apply(params, x)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-4, atol=1e-5)


def test_googlenet_stem_and_vgg_pack():
    from caffe_escoin_tpu.models import ZOO
    from caffe_escoin_tpu.nn.fuse import fuse_inference

    for name, min_marks, probe in (("googlenet", 5, "pool1/3x3_s2"),
                                   ("vgg16", 4, "conv1_1")):
        builder, input_shapes = ZOO[name]
        net = Net(builder(), phase="test")
        net.init(jax.random.PRNGKey(0),
                 {"data": (1,) + tuple(input_shapes["data"][1:])})
        fnet, _ = fuse_inference(net, net.init(
            jax.random.PRNGKey(0),
            {"data": (1,) + tuple(input_shapes["data"][1:])}),
            state=net.state0)
        pnet = pack_narrow_chains(fnet)
        marked = getattr(pnet, "packed_blobs", {})
        assert len(marked) >= min_marks, (name, marked)
        assert any(probe in b for b in marked), (name, sorted(marked))


def test_resnet50_packs_stage1():
    """The flagship: stage-1 (56x56/C=64) packs end-to-end after fusion."""
    from caffe_escoin_tpu.models import ZOO
    from caffe_escoin_tpu.nn.fuse import fuse_inference

    builder, input_shapes = ZOO["resnet50"]
    net = Net(builder(), phase="test")
    params = net.init(jax.random.PRNGKey(0),
                      {"data": (1,) + tuple(input_shapes["data"][1:])})
    fnet, fparams = fuse_inference(net, params, state=net.state0)
    pnet = pack_narrow_chains(fnet)
    marked = pnet.packed_blobs
    assert marked, "expected stage-1 blobs to pack"
    assert all(r == 2 for r in marked.values())
    # the stem (112x112 conv1 out) and every stage-1 blob (56x56) are in;
    # 28x28+ stages are not (C >= 128 seeds don't exist and nothing pulls
    # them in)
    shp = {b: fnet.blob_shapes[b] for b in marked}
    assert all(s[1] in (56, 112) for s in shp.values()), shp
    assert "pool1" in marked and "res2c_out" in marked
    # stem + pool1 + 3 blocks x (branch2a, branch2b out) + stage tops
    assert len(marked) >= 10
