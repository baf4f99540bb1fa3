"""Weight alignment: the per-layer dense -> sparse "compile" pass.

TPU-native re-design of `BaseConvolutionLayer::WeightAlign`
(`src/caffe/layers/base_conv_layer.cpp:46-273`), invoked once after weights are
loaded (`src/caffe/net.cpp:819`). The reference builds CSR weights, stretches
column indices into padded-input offsets, and column-blocks the CSR for the
AVX kernel's cache. Here the pass builds, from a conv weight W[KH,KW,Cin,Cout]:

* the GEMM view Wmat[K = KH*KW*Cin, Cout] (rows ordered (kh, kw, cin) to match
  the im2col patch layout);
* a ``BSC`` of Wmat with a per-layer (bk, bn) block shape — bk is clipped to a
  divisor of Cin so every K-block decodes to one (kernel offset, cin-block),
  which is what lets the direct-conv kernel turn block indices into shifted
  ifmap slices (the stretch-transform, see formats.BSC docstring);
* an ``ELL`` of Wmat^T (rows = output channels — the reference's CSR row
  orientation) for unstructured sparsity semantics;
* sparsity statistics mirroring the reference's logging
  (`base_conv_layer.cpp:143-189`): global sparsity, per-offset nnz histogram,
  per-output-channel nnz.

Grouped convolution is expanded to a block-diagonal Wmat: group structure IS
structured sparsity, so the sparse kernels handle groups with zero extra code
(the reference needed per-group CSR slices and kernel launches,
`base_conv_layer.cpp:627,778,836`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import numpy as np

from caffe_escoin_tpu.engine.context import ExecutionPolicy
from caffe_escoin_tpu.sparse.formats import (
    BSC,
    ELL,
    _register,
    _static_field,
    dense_to_bsc,
    dense_to_ell,
)


def _largest_alignable_divisor(cin: int, target: int, align: int = 8) -> int:
    """Largest d <= target with d | cin and d % align == 0 (or d == cin if cin
    itself is small/unaligned — a K-block then still maps to one offset)."""
    if cin <= target:
        return cin
    for d in range(target, 0, -1):
        if cin % d == 0 and (d % align == 0 or d == cin):
            return d
    return cin


def gemm_view(w_hwio: np.ndarray, groups: int = 1) -> np.ndarray:
    """[KH,KW,Cin/g,Cout] -> block-diagonal [KH*KW*Cin, Cout] (row order
    (kh, kw, cin), matching im2col_reference's column order)."""
    w = np.asarray(w_hwio)
    kh, kw, cin_g, cout = w.shape
    if groups == 1:
        return w.reshape(kh * kw * cin_g, cout)
    cout_g = cout // groups
    cin = cin_g * groups
    full = np.zeros((kh, kw, cin, cout), w.dtype)
    for g in range(groups):
        full[:, :, g * cin_g : (g + 1) * cin_g, g * cout_g : (g + 1) * cout_g] = w[
            ..., g * cout_g : (g + 1) * cout_g
        ]
    return full.reshape(kh * kw * cin, cout)


@dataclasses.dataclass(frozen=True)
class SparsityStats:
    """Mirror of the reference's WeightAlign sparsity logging."""

    sparsity: float
    nnz: int
    block_density: float
    nnz_per_offset: Tuple[int, ...]  # kernel-position histogram
    nnz_per_out_channel: Tuple[int, ...]


@_register
@dataclasses.dataclass(frozen=True)
class AlignedConvWeight:
    """All execution-ready representations of one conv layer's weight."""

    dense: jax.Array  # [KH,KW,Cin/g,Cout] as loaded
    bias: Optional[jax.Array]  # [Cout] or None
    bsc: Optional[BSC]  # GEMM-view block-sparse (None below threshold)
    ell_t: Optional[ELL]  # Wmat^T row-sparse (unstructured path)
    kernel_shape: Tuple[int, int] = _static_field(default=(0, 0))
    cin: int = _static_field(default=0)  # full Cin (groups expanded)
    cout: int = _static_field(default=0)
    groups: int = _static_field(default=1)
    sparsity: float = _static_field(default=0.0)
    block_density: float = _static_field(default=1.0)
    stats: Optional[SparsityStats] = _static_field(default=None)

    @property
    def k(self) -> int:
        return self.kernel_shape[0] * self.kernel_shape[1] * self.cin


def weight_align(
    w_hwio,
    bias=None,
    *,
    groups: int = 1,
    policy: Optional[ExecutionPolicy] = None,
    with_stats: bool = True,
) -> AlignedConvWeight:
    """Build the aligned sparse representations for one conv layer."""
    policy = policy or ExecutionPolicy()
    w = np.asarray(jax.device_get(w_hwio))
    kh, kw, cin_g, cout = w.shape
    cin = cin_g * groups
    wmat = gemm_view(w, groups)  # (K, Cout)
    nnz = int((wmat != 0).sum())
    # Sparsity accounting matches the reference: zeros of the *stored* weight,
    # not counting group-structural zeros of the expanded matrix.
    stored = w.size
    sparsity = 1.0 - (int((w != 0).sum()) / max(1, stored))

    bsc = None
    ell_t = None
    stats = None
    if sparsity >= min(policy.sparse_threshold, policy.sconv_threshold):
        bk_target, bn = policy.block_shape
        bk = _largest_alignable_divisor(cin, bk_target)
        bsc = dense_to_bsc(wmat, (bk, bn))
        ell_t = dense_to_ell(wmat.T, lane_pad=8)
    if with_stats:
        per_offset = (wmat != 0).reshape(kh * kw, cin, cout).sum(axis=(1, 2))
        per_oc = (wmat != 0).sum(axis=0)
        stats = SparsityStats(
            sparsity=sparsity,
            nnz=nnz,
            block_density=bsc.block_density if bsc is not None else 1.0,
            nnz_per_offset=tuple(int(x) for x in per_offset),
            nnz_per_out_channel=tuple(int(x) for x in per_oc),
        )
    return AlignedConvWeight(
        dense=jax.numpy.asarray(w),
        bias=None if bias is None else jax.numpy.asarray(bias),
        bsc=bsc,
        ell_t=ell_t,
        kernel_shape=(kh, kw),
        cin=cin,
        cout=cout,
        groups=groups,
        sparsity=sparsity,
        block_density=bsc.block_density if bsc is not None else 1.0,
        stats=stats,
    )
