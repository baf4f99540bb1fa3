"""Tools: Classifier/Detector wrappers (python/caffe/classifier.py,
detector.py parity), net drawing (draw.py parity), dataset CLI commands."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from caffe_escoin_tpu.models import lenet  # noqa: E402
from caffe_escoin_tpu.nn import Net  # noqa: E402
from caffe_escoin_tpu.tools.draw import net_to_dot  # noqa: E402
from caffe_escoin_tpu.tools.vision import (Classifier, Detector,  # noqa: E402
                                           oversample, resize_image)


def _lenet_net():
    net = Net(lenet.lenet5())
    params = net.init(jax.random.PRNGKey(0), {"data": (1, 28, 28, 1)})
    return net, params


def test_oversample_is_10_crops():
    ims = [np.random.rand(12, 12, 3).astype(np.float32)]
    crops = oversample(ims, (8, 8))
    assert crops.shape == (10, 8, 8, 3)
    # crop 9 (center-mirror) is the mirror of crop 8 (center)
    np.testing.assert_array_equal(crops[9], crops[8][:, ::-1])


def test_resize_image():
    im = np.random.rand(10, 14, 3).astype(np.float32)
    out = resize_image(im, (20, 28))
    assert out.shape == (20, 28, 3)


def test_classifier_predict():
    net, params = _lenet_net()
    clf = Classifier(net, params, image_dims=(32, 32))
    ims = [np.random.rand(40, 40, 1).astype(np.float32) for _ in range(2)]
    preds = clf.predict(ims, oversample_=True)
    assert preds.shape == (2, 10)
    np.testing.assert_allclose(preds.sum(axis=1), 1.0, rtol=1e-4)
    preds_c = clf.predict(ims, oversample_=False)
    assert preds_c.shape == (2, 10)


def test_detector_windows():
    net, params = _lenet_net()
    det = Detector(net, params, context_pad=2)
    im = np.random.rand(64, 64, 1).astype(np.float32)
    dets = det.detect_windows([(im, [(0, 0, 30, 30), (10, 10, 50, 50)])])
    assert len(dets) == 2
    assert dets[0]["window"] == (0, 0, 30, 30)
    assert dets[0]["prediction"].shape == (10,)


def test_net_to_dot():
    dot = net_to_dot(lenet.lenet5(), name="lenet")
    assert dot.startswith('digraph "lenet"')
    assert '"conv1"' in dot and '"conv1" -> "pool1"' in dot
    assert "k5 s1 p0 -> 20" in dot  # conv geometry annotation


def test_cli_dataset_roundtrip(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from caffe_escoin_tpu.tools import cli

    for i in range(3):
        Image.fromarray((np.random.rand(9, 9, 3) * 255).astype(
            np.uint8)).save(tmp_path / f"i{i}.png")
    lst = tmp_path / "list.txt"
    lst.write_text("".join(f"i{i}.png {i}\n" for i in range(3)))
    db = str(tmp_path / "db.cerec")
    rc = cli.main(["convert_imageset", str(lst), db,
                   "--root-folder", str(tmp_path),
                   "--resize-height", "8", "--resize-width", "8"])
    assert rc == 0
    mean = str(tmp_path / "mean.npy")
    rc = cli.main(["compute_image_mean", db, mean])
    assert rc == 0
    m = np.load(mean)
    assert m.shape == (8, 8, 3)
    dot = str(tmp_path / "net.dot")
    assert cli.main(["draw_net", "--model", "lenet", "--output", dot]) == 0
    assert "digraph" in open(dot).read()


def test_debug_info_blob_norms():
    """net.cpp:761-774 debug_info analogue: per-layer blob/param asum."""
    import jax
    import jax.numpy as jnp

    from caffe_escoin_tpu.models import ZOO
    from caffe_escoin_tpu.nn import Net
    from caffe_escoin_tpu.utils.timing import debug_info

    builder, _ = ZOO["lenet"]
    net = Net(builder(num_classes=4))
    params = net.init(jax.random.PRNGKey(0), {"data": (1, 20, 20, 1)})
    lines = []
    rows = debug_info(net, params, {"data": jnp.ones((1, 20, 20, 1))},
                      log=lines.append)
    assert any(r.get("top") == "prob" for r in rows)
    assert any("conv1" in ln for ln in lines)
    assert all(np.isfinite(r["data"]) for r in rows)


def test_device_time_arg_sets_cpu_fallback():
    """device_time(..., arg_sets=...) falls back to slope_time on CPU
    (no device timeline) without touching the cycled sets' shapes."""
    import jax.numpy as jnp

    from caffe_escoin_tpu.utils.benchmark import (device_time,
                                                  device_time_cycle)

    xs = [jnp.ones((16, 16)) * i for i in range(3)]
    w = jnp.ones((16, 16))
    t = device_time(lambda y, w: y @ w, xs[0], w, iters=3,
                    arg_sets=[(x, w) for x in xs])
    assert t > 0
    t2 = device_time_cycle(
        [(lambda y, _w=w: y @ _w, (x,)) for x in xs], iters=3)
    assert t2 > 0
