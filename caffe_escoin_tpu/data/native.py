"""ctypes bindings for the native runtime (csrc/libcescoin.so).

Replaces the reference's C++ data-loading and CSR-packing internals
(db_lmdb.cpp / blocking_queue.cpp / base_conv_layer.cpp WeightAlign packing)
with a small C ABI library. Builds on demand with `make -C csrc`; all callers
degrade gracefully to the numpy implementations when the library is absent
(e.g. no toolchain).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_library(build: bool = True) -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED and not build:
        return _LIB
    _TRIED = True
    so = os.path.join(_repo_root(), "csrc", "libcescoin.so")
    if not os.path.exists(so) and build:
        try:
            subprocess.run(["make", "-C", os.path.dirname(so), "-s"],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    lib.cerec_open.restype = ctypes.c_void_p
    lib.cerec_open.argtypes = [ctypes.c_char_p]
    lib.cerec_num.restype = ctypes.c_uint64
    lib.cerec_num.argtypes = [ctypes.c_void_p]
    lib.cerec_sample_elems.restype = ctypes.c_uint64
    lib.cerec_sample_elems.argtypes = [ctypes.c_void_p]
    lib.cerec_close.argtypes = [ctypes.c_void_p]
    lib.cerec_prefetcher_start.restype = ctypes.c_void_p
    lib.cerec_prefetcher_start.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int,
    ]
    lib.cerec_prefetcher_next.restype = ctypes.c_int
    lib.cerec_prefetcher_next.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.cerec_prefetcher_stop.argtypes = [ctypes.c_void_p]
    lib.bsc_scan.restype = ctypes.c_int64
    lib.bsc_scan.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"), ctypes.c_int,
    ]
    lib.bsc_pack.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"), ctypes.c_int,
    ]
    try:
        lib.bsc_sconv.restype = ctypes.c_int
        lib.bsc_sconv.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
            ctypes.c_int,
        ]
    except AttributeError:  # stale .so without the sconv entry point
        pass
    _LIB = lib
    return lib


def native_bsc_sconv(x, aligned, *, padding=(0, 0), stride=(1, 1),
                     relu=False, threads: int = 0):
    """Direct blocked sparse conv on the host (csrc/sconv.cc) — the CPU
    product path (reference `caffe_cpu_blocked_sconv`,
    `include/caffe/util/sconv.hpp:83-678`). x: [N,H,W,Cin] f32 numpy.
    Returns [N,Ho,Wo,Cout] f32, or None when the library (or the layer's
    BSC) is unavailable. Dilation/groups>1 use the jnp path instead."""
    import os

    lib = load_library()
    if lib is None or not hasattr(lib, "bsc_sconv"):
        return None
    bsc = aligned.bsc
    if bsc is None:
        return None
    x = np.ascontiguousarray(x, np.float32)
    n, h, w, cin = x.shape
    kh, kw = aligned.kernel_shape
    ph, pw = padding
    sh, sw = stride
    ho = (h + 2 * ph - kh) // sh + 1
    wo = (w + 2 * pw - kw) // sw + 1
    bk, bn = bsc.block_shape
    blocks = np.ascontiguousarray(np.asarray(bsc.blocks), np.float32)
    block_row = np.ascontiguousarray(np.asarray(bsc.block_row), np.int32)
    bcol_nnz = np.ascontiguousarray(np.asarray(bsc.bcol_nnz), np.int32)
    bias = aligned.bias
    bias_p = None
    if bias is not None:
        bias_np = np.ascontiguousarray(np.asarray(bias), np.float32)
        bias_p = bias_np.ctypes.data_as(ctypes.c_void_p)
    out = np.empty((n, ho, wo, aligned.cout), np.float32)
    if threads <= 0:
        threads = min(8, os.cpu_count() or 1)
    rc = lib.bsc_sconv(
        x, n, h, w, cin, blocks, block_row, bcol_nnz,
        block_row.shape[0], block_row.shape[1] if block_row.ndim > 1 else 1,
        bk, bn, aligned.cin_pad, kh, kw, ph, pw, sh, sw, aligned.cout,
        bias_p, int(bool(relu)), out, threads)
    if rc != 0:
        return None
    return out


class NativeCerecLoader:
    """Native prefetching batch iterator over a .cerec file."""

    def __init__(self, path: str, batch: int, sample_shape, *,
                 shuffle: bool = False, seed: int = 0, workers: int = 2,
                 capacity: int = 4):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._file = lib.cerec_open(path.encode())
        if not self._file:
            raise IOError(f"cannot open {path}")
        self.num = lib.cerec_num(self._file)
        self.sample_shape = tuple(sample_shape)
        elems = int(np.prod(self.sample_shape))
        assert elems == lib.cerec_sample_elems(self._file), "shape mismatch"
        self.batch = batch
        self._pf = lib.cerec_prefetcher_start(
            self._file, batch, int(shuffle), seed, workers, capacity)

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        data = np.empty((self.batch,) + self.sample_shape, np.float32)
        labels = np.empty((self.batch,), np.int32)
        rc = self._lib.cerec_prefetcher_next(
            self._pf, data.reshape(-1), labels)
        if rc != 0:
            raise StopIteration
        return {"data": data, "label": labels}

    def close(self):
        if getattr(self, "_pf", None):
            self._lib.cerec_prefetcher_stop(self._pf)
            self._pf = None
        if getattr(self, "_file", None):
            self._lib.cerec_close(self._file)
            self._file = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def native_bsc_pack(w: np.ndarray, block_shape, threads: int = 8):
    """Dense (K, N) -> padded BSC arrays via the native packer. Returns
    (blocks, block_row, bcol_nnz, max_bw) or None when unavailable."""
    lib = load_library()
    if lib is None:
        return None
    w = np.ascontiguousarray(w, np.float32)
    rows, cols = w.shape
    bk, bn = block_shape
    n_bcols = -(-cols // bn)
    bcol_nnz = np.zeros(n_bcols, np.int32)
    max_bw = int(lib.bsc_scan(w, rows, cols, bk, bn, bcol_nnz, threads))
    blocks = np.zeros((n_bcols, max_bw, bk, bn), np.float32)
    block_row = np.zeros((n_bcols, max_bw), np.int32)
    lib.bsc_pack(w, rows, cols, bk, bn, max_bw, blocks.reshape(-1),
                 block_row.reshape(-1), threads)
    return blocks, block_row, bcol_nnz, max_bw
