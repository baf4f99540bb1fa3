"""Model zoo shape-inference smoke tests: every ZOO entry builds, shape-infers
and (for the small ones) runs a tiny forward. Mirrors the role of the
reference's `models/*/deploy.prototxt` definitions (SURVEY §L11)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from caffe_escoin_tpu.models import ZOO, caffenet  # noqa: E402
from caffe_escoin_tpu.nn import Net  # noqa: E402


@pytest.mark.parametrize("name", sorted(ZOO))
def test_zoo_builds_and_shapes(name):
    builder, input_shapes = ZOO[name]
    net = Net(builder())
    shapes = {k: (1,) + tuple(s[1:]) for k, s in input_shapes.items()}
    net.init(jax.random.PRNGKey(0), shapes)
    assert net.blob_shapes  # shape inference completed


def test_caffenet_head_shapes():
    net = Net(caffenet.caffenet(num_classes=1000))
    net.init(jax.random.PRNGKey(0), {"data": (1, 227, 227, 3)})
    assert net.blob_shapes["prob"] == (1, 1000)


def test_rcnn_raw_scores_no_softmax():
    specs = caffenet.rcnn_ilsvrc13()
    assert specs[-1].name == "fc-rcnn"
    net = Net(specs)
    net.init(jax.random.PRNGKey(0), {"data": (1, 227, 227, 3)})
    assert net.blob_shapes["fc-rcnn"] == (1, 200)


def test_flickr_style_20_classes():
    net = Net(caffenet.finetune_flickr_style())
    net.init(jax.random.PRNGKey(0), {"data": (1, 227, 227, 3)})
    assert net.blob_shapes["prob"] == (1, 20)


def test_caffenet_tiny_forward():
    # full 227 res is slow on CPU CI; structural forward on small grid via
    # the same layer stack minus the fixed fc6 geometry is not possible, so
    # run one real 227 forward at batch 1 with dense weights
    net = Net(caffenet.caffenet(num_classes=10))
    params = net.init(jax.random.PRNGKey(0), {"data": (1, 227, 227, 3)})
    out = net.apply(params, {"data": jnp.zeros((1, 227, 227, 3))})["prob"]
    assert out.shape == (1, 10)
    np.testing.assert_allclose(float(jnp.sum(out)), 1.0, rtol=1e-4)
