"""Dataset sources.

The reference reads LMDB/LevelDB (`src/caffe/util/db_lmdb.cpp`) which are not
baked into this image; this framework's on-disk format is a simple binary
record file (`.cerec`) with a C++ reader (csrc/recordio.cc) and a numpy
fallback. Synthetic sources provide deterministic MNIST/CIFAR/ImageNet-shaped
streams for tests and benchmarks.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, Iterator, Tuple

import numpy as np

MAGIC = b"CERC"


# ---------------------------------------------------------------------------
# synthetic sources
# ---------------------------------------------------------------------------


def synthetic_source(batch_shape: Tuple[int, ...], num_classes: int = 10,
                     seed: int = 0, dtype=np.float32):
    """Deterministic pseudo-data stream: returns a callable producing
    {"data": [B,...], "label": [B]} batches."""
    rng = np.random.default_rng(seed)

    def source() -> Dict[str, np.ndarray]:
        data = rng.standard_normal(batch_shape).astype(dtype)
        label = rng.integers(0, num_classes, batch_shape[0]).astype(np.int32)
        return {"data": data, "label": label}

    return source


def classification_toy_source(batch: int, dim: int, num_classes: int,
                              seed: int = 0):
    """Linearly separable toy problem (training converges -> used by
    integration tests to validate the full train loop)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((num_classes, dim)).astype(np.float32) * 3

    def source():
        label = rng.integers(0, num_classes, batch).astype(np.int32)
        data = centers[label] + rng.standard_normal((batch, dim)).astype(np.float32)
        return {"data": data, "label": label}

    return source


# ---------------------------------------------------------------------------
# .cerec record file format (length-prefixed raw tensors)
#   header: MAGIC | uint32 version | uint32 ndim | dims... | uint32 label_bytes
#   records: uint32 payload_len | payload(data dtype f32) | int32 label
# ---------------------------------------------------------------------------


def write_cerec(path: str, data: np.ndarray, labels: np.ndarray):
    """data: [N, ...] float32, labels: [N] int32."""
    data = np.ascontiguousarray(data, np.float32)
    labels = np.ascontiguousarray(labels, np.int32)
    n = data.shape[0]
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<II", 1, data.ndim - 1))
        for d in data.shape[1:]:
            f.write(struct.pack("<I", d))
        f.write(struct.pack("<I", n))
        rec = data.reshape(n, -1)
        for i in range(n):
            payload = rec[i].tobytes()
            f.write(struct.pack("<I", len(payload)))
            f.write(payload)
            f.write(struct.pack("<i", int(labels[i])))


def read_cerec_header(path: str):
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != MAGIC:
            raise ValueError(f"{path}: not a cerec file")
        version, ndim = struct.unpack("<II", f.read(8))
        dims = struct.unpack("<" + "I" * ndim, f.read(4 * ndim))
        (n,) = struct.unpack("<I", f.read(4))
        return {"version": version, "sample_shape": dims, "num": n,
                "data_offset": f.tell()}


def cerec_source(path: str, batch: int, *, loop: bool = True, native=None):
    """Batch source over a .cerec file. ``native``: optional csrc reader
    handle (data/native.py); falls back to pure numpy."""
    hdr = read_cerec_header(path)
    shape = hdr["sample_shape"]
    n = hdr["num"]
    sample_bytes = int(np.prod(shape)) * 4
    rec_bytes = 4 + sample_bytes + 4
    # memory-map the record region for zero-copy reads
    raw = np.memmap(path, dtype=np.uint8, mode="r", offset=hdr["data_offset"])
    idx = {"pos": 0}

    def source():
        datas = np.empty((batch,) + tuple(shape), np.float32)
        labels = np.empty((batch,), np.int32)
        for b in range(batch):
            i = idx["pos"]
            if i >= n:
                if not loop:
                    raise StopIteration
                i = idx["pos"] = 0
            off = i * rec_bytes
            payload = raw[off + 4 : off + 4 + sample_bytes]
            datas[b] = np.frombuffer(payload, np.float32).reshape(shape)
            labels[b] = struct.unpack(
                "<i", raw[off + 4 + sample_bytes : off + rec_bytes].tobytes()
            )[0]
            idx["pos"] = i + 1
        return {"data": datas, "label": labels}

    return source
