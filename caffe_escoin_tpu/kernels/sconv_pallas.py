"""Direct sparse convolution Pallas kernel (SCONV / SCONV_PAR modes).

The TPU-native counterpart of the reference's custom CUDA kernels
(`caffe_gpu_sconv` + `sconv_shm`/`sconv_batch_tiled`,
`src/caffe/util/math_functions.cu:154-694`): convolution executed directly
from the sparse weight without materializing im2col — the activation tensor is
read ONCE (vs KH*KW times for the lowered path), which is what makes sparsity
pay on a bandwidth-bound chip.

Formulation (stride 1, dilation 1):

* The input is explicitly zero-padded (the reference's `copy_input_data`,
  `math_functions.cu:729-766`) and its spatial dims flattened:
  xf[n, h*Wp + w, c].
* Output is computed over M = Ho*Wp positions — the Wp-Wo "garbage columns"
  per row mix row edges and are discarded on reshape. This makes every kernel
  offset's contribution a *contiguous* row range of xf:
      out_flat[m] += xf[m + kh*Wp + kw] @ W[kh, kw]
  i.e. the reference's stretched column index (`caffe_gpu_stretch`,
  `math_functions.cu:706-727`) becomes a static slice offset, and the
  per-nonzero gather becomes an MXU matmul over a (TILE_M, bk) slice.
* Weights ride in the same BSC the lowered path uses (GEMM view, K-blocks
  ordered (kh, kw, cin-block)); each scalar-prefetched K-block index decodes
  statically to (offset, cin-block). The whole (grouped) weight stays VMEM
  resident across the batch — the reference's `sconv_batch_tiled` weight-reuse
  trick (`math_functions.cu:524-587`) taken to its limit.
* Bias and ReLU are fused into the epilogue (`sconv_relu_*` kernels,
  `math_functions.cu:203-223,404-457`).

Constraints (checked by `supported()`; callers fall back to the lowered
path, mirroring the reference's fallbacks at `base_conv_layer.cpp:752`):
unit stride/dilation, bk divides Cin, padded image slab fits the VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from caffe_escoin_tpu.sparse.weight_align import AlignedConvWeight

SLAB_BUDGET = 6 * 1024 * 1024  # max padded-image VMEM residency
W_BUDGET = 4 * 1024 * 1024  # max resident weight slice


def supported(x, aligned: AlignedConvWeight, policy) -> bool:
    if aligned.bsc is None or not policy.pallas_enabled():
        return False
    kh, kw = aligned.kernel_shape
    bk, bn = aligned.bsc.block_shape
    if x.shape[-1] != aligned.cin:
        return False
    cin_pad = aligned.cin_pad
    if cin_pad % bk != 0:
        return False  # K-blocks must not straddle kernel offsets
    n, h, w, c = x.shape
    # slab size after padding (upper bound: pad = kernel-1)
    hp, wp = h + kh - 1, w + kw - 1
    slab = (hp * wp + wp) * cin_pad * x.dtype.itemsize
    return slab <= SLAB_BUDGET


def _make_kernel(group_n, bk, bn, tile_m, kw_, wp, n_cin_b, relu, out_dtype,
                 mxu_dtype):
    def kernel(row_ref, nnz_ref, x_ref, w_ref, bias_ref, out_ref):
        g = pl.program_id(1)
        i = pl.program_id(2)
        m0 = i * tile_m
        for j in range(group_n):  # static unroll over cout block-columns
            jg = g * group_n + j

            def body(s, acc):
                kblk = row_ref[jg, s]
                off = kblk // n_cin_b  # kernel offset index (kh*KW + kw)
                cb = kblk % n_cin_b  # cin block (leading-dim select)
                khi = off // kw_
                kwi = off % kw_
                start = m0 + khi * wp + kwi
                # slab is channel-blocked (n_cin_b, L, bk): dynamic leading
                # index + dynamic sublane start + static full lanes — the
                # only combination Mosaic lowers (double-dynamic sublane+lane
                # indexing is rejected)
                a = x_ref[0, cb, pl.ds(start, tile_m), :]
                return acc + jnp.dot(
                    a.astype(mxu_dtype), w_ref[j, s],
                    preferred_element_type=jnp.float32,
                )

            acc = lax.fori_loop(
                0, nnz_ref[jg], body, jnp.zeros((tile_m, bn), jnp.float32),
            )
            acc = acc + bias_ref[0, j * bn : (j + 1) * bn][None, :]
            if relu:
                acc = jnp.maximum(acc, 0.0)
            out_ref[0, :, j * bn : (j + 1) * bn] = acc.astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "kernel_shape", "padding", "block_shape", "cin_pad", "cout", "relu",
        "tile_m", "interpret", "out_dtype_name", "mxu_dtype",
    ),
)
def _run(x, blocks, block_row, bcol_nnz, bias, *, kernel_shape, padding,
         block_shape, cin_pad, cout, relu, tile_m, interpret, out_dtype_name,
         mxu_dtype):
    n, h, w, c = x.shape
    kh, kw = kernel_shape
    ph, pw = padding
    bk, bn = block_shape
    out_dtype = jnp.dtype(out_dtype_name)
    mxu = jnp.dtype(mxu_dtype)

    hp, wp = h + 2 * ph, w + 2 * pw
    ho, wo = hp - kh + 1, wp - kw + 1
    m_out = ho * wp
    # out rows padded only to sublane granularity; the grid's final tile is
    # ragged (garbage rows computed but never written) — no tile_m
    # over-allocation + slice-copy of the output
    mp = -(-m_out // 8) * 8
    n_tiles = -(-mp // tile_m)
    # slab must cover the largest read: last tile start + tile_m + offsets
    slab_len = n_tiles * tile_m + (kh - 1) * wp + kw
    n_cin_b = cin_pad // bk
    # Weights cast to the MXU multiply dtype up front (half the W DMA, full
    # bf16 MXU rate; accumulation stays f32). The slab stays f32: Mosaic
    # requires dynamic sublane starts to be tile-aligned for packed bf16
    # layouts, and the kernel's per-offset slices are unaligned by design —
    # the A-tile is cast in-kernel instead.
    blocks = blocks.astype(mxu)
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, cin_pad - c)))
    xf = xp.reshape(n, hp * wp, cin_pad)
    xf = jnp.pad(xf, ((0, 0), (0, max(0, slab_len - hp * wp)), (0, 0)))
    # channel-blocked slab layout (see kernel comment)
    xf = xf.reshape(n, xf.shape[1], n_cin_b, bk).transpose(0, 2, 1, 3)

    n_bcols, max_bw = blocks.shape[:2]
    w_bytes = n_bcols * max_bw * bk * bn * blocks.dtype.itemsize
    n_groups = min(n_bcols, max(1, -(-w_bytes // W_BUDGET)))
    while n_bcols % n_groups != 0:
        n_groups += 1
    group_n = n_bcols // n_groups

    bias_p = jnp.pad(bias, (0, n_bcols * bn - bias.shape[0])).reshape(1, -1)

    kernel = _make_kernel(group_n, bk, bn, tile_m, kw, wp, n_cin_b, relu,
                          out_dtype, mxu)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # block_row, bcol_nnz
            grid=(n, n_groups, n_tiles),
            in_specs=[
                pl.BlockSpec((1, n_cin_b, xf.shape[2], bk),
                             lambda b, g, i, br, nz: (b, 0, 0, 0)),
                pl.BlockSpec(
                    (group_n, max_bw, bk, bn),
                    lambda b, g, i, br, nz: (g, 0, 0, 0),
                ),
                pl.BlockSpec((1, group_n * bn), lambda b, g, i, br, nz: (0, g)),
            ],
            out_specs=pl.BlockSpec(
                (1, tile_m, group_n * bn), lambda b, g, i, br, nz: (b, i, g)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n, mp, n_bcols * bn), out_dtype),
        interpret=interpret,
    )(block_row, bcol_nnz, xf, blocks, bias_p)

    # drop garbage columns and channel padding
    out = out[:, :m_out, :cout].reshape(n, ho, wp, cout)[:, :, :wo, :]
    return out


def sconv(x, aligned: AlignedConvWeight, *, padding, relu, policy,
          batch_parallel=True):
    """Direct sparse conv. x: [N,H,W,Cin] -> [N,Ho,Wo,Cout]. Stride 1 only
    (`supported()` gates); SCONV and SCONV_PAR share this kernel — the batch
    is always folded into the grid with the weight slice held resident."""
    bias = aligned.bias
    if bias is None:
        bias = jnp.zeros((aligned.cout,), jnp.float32)
    tile_m = policy.spmm_tile_m
    # clip tile to the output extent
    kh, kw = aligned.kernel_shape
    ph, pw = padding
    hp, wp = x.shape[1] + 2 * ph, x.shape[2] + 2 * pw
    m_out = (hp - kh + 1) * wp
    tile_m = min(tile_m, max(8, -(-m_out // 8) * 8))
    return _run(
        x,
        aligned.bsc.blocks,
        aligned.bsc.block_row,
        aligned.bsc.bcol_nnz,
        bias,
        kernel_shape=aligned.kernel_shape,
        padding=padding,
        block_shape=aligned.bsc.block_shape,
        cin_pad=aligned.cin_pad,
        cout=aligned.cout,
        relu=relu,
        tile_m=tile_m,
        interpret=policy.interpret,
        out_dtype_name=jnp.dtype(x.dtype).name,
        mxu_dtype=policy.resolved_mxu_dtype(),
    )
