"""IO-backed data layers (nn/data_layers.py) — Data/.cerec, MemoryData,
ImageData, HDF5Data, HDF5Output, WindowData, plus Bias and LSTMUnit from the
main catalog. Mirrors `src/caffe/test/test_{data,memory_data,image_data,
hdf5data,hdf5_output}_layer.cpp` with temp fixture files."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from caffe_escoin_tpu.data.datasets import write_cerec  # noqa: E402
from caffe_escoin_tpu.nn import LayerSpec, Net  # noqa: E402
from caffe_escoin_tpu.nn.net import LAYER_REGISTRY  # noqa: E402


def _make(type_name, name="l", bottoms=(), tops=("data", "label"), **params):
    spec = LayerSpec(name=name, type=type_name, bottoms=list(bottoms),
                     tops=list(tops), params=params)
    from caffe_escoin_tpu.engine.context import ExecutionPolicy

    return LAYER_REGISTRY[type_name](spec, ExecutionPolicy())


def test_data_layer_cerec(tmp_path):
    path = str(tmp_path / "train.cerec")
    data = np.arange(8 * 6 * 6 * 3, dtype=np.float32).reshape(8, 6, 6, 3)
    labels = np.arange(8, dtype=np.float32)
    write_cerec(path, data, labels)
    layer = _make("Data", source=path, batch_size=4)
    assert layer.out_shapes({}, []) == [(4, 6, 6, 3), (4,)]
    d, l = layer.apply({}, [], train=True, rng=None)
    assert d.shape == (4, 6, 6, 3) and l.shape == (4,)
    # cyclic: two batches cover the db
    d2, l2 = layer.apply({}, [], train=True, rng=None)
    got = np.sort(np.concatenate([np.asarray(l), np.asarray(l2)]))
    np.testing.assert_array_equal(got, labels)
    layer.close()


def test_memory_data_layer():
    layer = _make("MemoryData", batch_size=2, channels=3, height=4, width=4)
    data = np.random.randn(6, 4, 4, 3).astype(np.float32)
    labels = np.arange(6, dtype=np.float32)
    layer.reset(data, labels)
    outs = [layer.apply({}, [], train=True, rng=None) for _ in range(3)]
    seen = np.concatenate([np.asarray(l) for _, l in outs])
    np.testing.assert_array_equal(np.sort(seen), labels)
    with pytest.raises(ValueError):
        layer.reset(data[:5], labels[:5])  # not divisible by batch
    layer.close()


def test_image_data_layer(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    for i in range(3):
        img = Image.fromarray(
            (np.random.rand(10, 12, 3) * 255).astype(np.uint8))
        img.save(tmp_path / f"im{i}.png")
    src = tmp_path / "list.txt"
    src.write_text("".join(f"im{i}.png {i}\n" for i in range(3)))
    layer = _make("ImageData", source=str(src), root_folder=str(tmp_path),
                  batch_size=2, new_height=8, new_width=8)
    assert layer.out_shapes({}, []) == [(2, 8, 8, 3), (2,)]
    d, l = layer.apply({}, [], train=True, rng=None)
    assert d.shape == (2, 8, 8, 3)
    assert np.asarray(l).tolist() == [0.0, 1.0]
    layer.close()


def test_hdf5_data_and_output_layers(tmp_path):
    h5py = pytest.importorskip("h5py")
    f1 = str(tmp_path / "a.h5")
    with h5py.File(f1, "w") as h5:
        h5["data"] = np.random.randn(5, 7).astype(np.float32)
        h5["label"] = np.arange(5, dtype=np.float32)
    src = tmp_path / "list.txt"
    src.write_text(f1 + "\n")
    layer = _make("HDF5Data", source=str(src), batch_size=2)
    assert layer.out_shapes({}, []) == [(2, 7), (2,)]
    d, l = layer.apply({}, [], train=True, rng=None)
    assert d.shape == (2, 7)
    layer.close()

    out_path = str(tmp_path / "out.h5")
    out_layer = _make("HDF5Output", tops=(), bottoms=("data", "label"),
                      file_name=out_path)
    out_layer.apply({}, [jnp.ones((2, 3)), jnp.zeros((2,))], train=False,
                    rng=None)
    out_layer.apply({}, [jnp.ones((2, 3)) * 2, jnp.ones((2,))], train=False,
                    rng=None)
    out_layer.flush()
    with h5py.File(out_path) as h5:
        assert h5["data"].shape == (4, 3)
        assert h5["label"].shape == (4,)


def test_window_data_layer(tmp_path):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    img_path = str(tmp_path / "scene.png")
    Image.fromarray((np.random.rand(64, 64, 3) * 255).astype(np.uint8)).save(
        img_path)
    win = tmp_path / "windows.txt"
    win.write_text(
        "# 0\n"
        f"{img_path}\n"
        "3 64 64\n"
        "3\n"
        "1 0.9 4 4 40 40\n"
        "2 0.7 10 10 30 30\n"
        "0 0.1 0 0 20 20\n")
    layer = _make("WindowData", source=str(win), batch_size=4, crop_size=16,
                  fg_threshold=0.5, bg_threshold=0.5, fg_fraction=0.5)
    d, l = layer.apply({}, [], train=True, rng=None)
    assert d.shape == (4, 16, 16, 3)
    labels = np.asarray(l)
    assert set(labels).issubset({0.0, 1.0, 2.0})
    layer.close()


def test_bias_layer_in_net():
    net = Net([
        LayerSpec(name="in", type="Input", bottoms=[], tops=["x"]),
        LayerSpec(name="bias", type="Bias", bottoms=["x"], tops=["y"],
                  params={"filler": {"type": "constant", "value": 1.5}}),
    ])
    params = net.init(jax.random.PRNGKey(0), {"x": (2, 4, 4, 3)})
    out = net.apply(params, {"x": jnp.zeros((2, 4, 4, 3))})["y"]
    np.testing.assert_allclose(np.asarray(out), 1.5)
    assert params["bias"]["b"].shape == (3,)  # per-channel (axis=1 canonical)


def test_lstm_unit_layer():
    layer = _make("LSTMUnit", bottoms=("c", "x", "cont"), tops=("c1", "h1"))
    n, hdim = 3, 5
    c_prev = jnp.asarray(np.random.randn(n, hdim).astype(np.float32))
    gates = jnp.asarray(np.random.randn(n, 4 * hdim).astype(np.float32))
    cont = jnp.ones((n,))
    c, h = layer.apply({}, [c_prev, gates, cont], train=False, rng=None)
    i, f, o, g = np.split(np.asarray(gates), 4, axis=1)
    sig = lambda v: 1 / (1 + np.exp(-v))
    c_ref = sig(f) * np.asarray(c_prev) + sig(i) * np.tanh(g)
    h_ref = sig(o) * np.tanh(c_ref)
    np.testing.assert_allclose(np.asarray(c), c_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h), h_ref, rtol=1e-5, atol=1e-6)
    # cont=0 resets the cell
    c0, _ = layer.apply({}, [c_prev, gates, jnp.zeros((n,))], train=False,
                        rng=None)
    np.testing.assert_allclose(np.asarray(c0), sig(i) * np.tanh(g),
                               rtol=1e-5, atol=1e-6)


def test_hdf5_streaming_spans_files(tmp_path):
    """Batches span file boundaries with one file resident at a time
    (hdf5_data_layer.cpp:111,142 LoadHDF5FileData on rollover)."""
    h5py = pytest.importorskip("h5py")
    paths = []
    for i, n in enumerate((3, 2, 4)):
        p = str(tmp_path / f"f{i}.h5")
        with h5py.File(p, "w") as h5:
            h5["data"] = np.full((n, 2), i, np.float32)
            h5["label"] = np.arange(n, dtype=np.float32) + 10 * i
        paths.append(p)
    src = tmp_path / "list.txt"
    src.write_text("".join(p + "\n" for p in paths))
    layer = _make("HDF5Data", source=str(src), batch_size=4)
    d1, l1 = layer.apply({}, [], train=True, rng=None)
    # first batch: 3 rows from file0 + 1 from file1
    assert np.asarray(d1)[:, 0].tolist() == [0, 0, 0, 1]
    assert np.asarray(l1).tolist() == [0, 1, 2, 10]
    d2, l2 = layer.apply({}, [], train=True, rng=None)
    # second: 1 from file1 + 3 from file2
    assert np.asarray(d2)[:, 0].tolist() == [1, 2, 2, 2]
    d3, _ = layer.apply({}, [], train=True, rng=None)
    # third: last of file2 + epoch rollover into file0
    assert np.asarray(d3)[:, 0].tolist() == [2, 0, 0, 0]
    layer.close()
