"""Fused-slab direct sparse convolution (Pallas, v3).

The TPU counterpart of the reference's direct sparse conv CUDA kernels
(`caffe_gpu_sconv` + `sconv_shm`/`sconv_batch_tiled`,
`src/caffe/util/math_functions.cu:154-694`), redesigned after on-chip
profiling showed the v2 kernel spending 2-3x its MXU time in XLA data
movement *around* the custom call:

* XLA materializes an NHWC->2D reshape (a real retile copy when W % 8 != 0)
  and then stages the operand through scoped VMEM (another full copy);
* the host-side pad + channel-blocking transpose cost 2 more passes over the
  activation;
* the output garbage-column slice cost another.

v3 moves ALL data restructuring into the kernel's VMEM:

* input: the raw NHWC tensor. Grid = (batch, weight-groups); each step DMAs
  one image (1, H, W, C) — the activation is read from HBM exactly ONCE, in
  its native layout (the direct-conv property that makes sparsity pay; the
  lowered path reads it KH*KW times).
* a per-image zero-padded slab lives in VMEM scratch, channel-block major
  (n_cin_b, Hp*Wp, bk), built by per-row VMEM copies (the reference's
  `copy_input_data` pad, `math_functions.cu:729-766`, done at VMEM speed).
  Pad rows/columns are zeroed once at the first grid step and never
  overwritten (only interior rows are rewritten per image).
* weights ride in BSC (bf16 by policy), whole (or per-group) resident in
  VMEM across the entire batch — `sconv_batch_tiled`'s weight-reuse trick
  (`math_functions.cu:524-587`) taken to its limit.
* compute: for each output block-column and each whole-row M-tile
  (tile_m = q*Wp), a `fori_loop` over that column's nonzero K-blocks; each
  nonzero decodes statically to (kernel offset, cin-block) — the reference's
  stretched index (`caffe_gpu_stretch`, `math_functions.cu:706-727`) — and
  contributes one MXU matmul from a shifted slab slice.
* output: written as exact NHWC (1, Ho, Wo, Cout) by per-row stores from the
  accumulator — no garbage columns, no padding, no post-kernel slice. Bias
  and ReLU are fused into the store (`sconv_relu_*` kernels,
  `math_functions.cu:203-223`).

Everything between HBM-x and HBM-out happens in VMEM; per-layer HBM traffic
is the information-theoretic minimum (x once + out once + nnz weights).
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

VMEM_BUDGET = 10 * 1024 * 1024  # slab + acc + weights + out tile
W_BUDGET = 4 * 1024 * 1024


def _pack(n, hp, wp):
    """Images packed per grid step: enough padded rows to fill ~512-row MXU
    tiles (the reference's FMAP_BLOCK batching, `math_functions.cu:524-587`,
    generalized). Must divide the batch."""
    cap = max(1, 512 // (hp * wp))
    p = min(cap, n)
    while n % p != 0:
        p -= 1
    return p


def _sizes(x_shape, aligned, padding, tile_rows):
    n, h, w, c = x_shape
    kh, kw = aligned.kernel_shape
    ph, pw = padding
    hp, wp = h + 2 * ph, w + 2 * pw
    ho, wo = hp - kh + 1, wp - kw + 1
    bk, bn = aligned.bsc.block_shape
    n_cin_b = aligned.cin_pad // bk
    # Slab row stride: data rows start at multiples of wp_s (8-aligned so
    # every build/epilogue vector store is sublane-aligned). Left padding is
    # NOT materialized — a read at kwi < pw underflows into the previous
    # slab row's zeroed right-garbage columns (>= pw of them by
    # construction), which is exactly the zero padding. One leading zero row
    # covers the first data row's underflow.
    wp_s = -(-(w + pw) // 8) * 8
    pimg = _pack(n, hp, wp_s)
    img_len = hp * wp_s
    total_rows = pimg * hp  # padded rows across the packed images
    q = max(1, min(tile_rows, total_rows))
    n_tiles = -(-total_rows // q)
    # slab covers all reads: head row + tile rows + kernel offsets
    slab_len = (1 + n_tiles * q + kh - 1) * wp_s + kw
    slab_len = -(-slab_len // 8) * 8
    return dict(n=n, h=h, w=w, c=c, kh=kh, kw=kw, ph=ph, pw=pw, hp=hp, wp=wp,
                ho=ho, wo=wo, bk=bk, bn=bn, n_cin_b=n_cin_b, q=q,
                n_tiles=n_tiles, slab_len=slab_len, pimg=pimg,
                img_len=img_len, wp_s=wp_s)


def supported(x, aligned: AlignedConvWeight, padding, policy,
              tile_rows=None) -> bool:
    if aligned.bsc is None or not policy.pallas_enabled():
        return False
    if x.shape[-1] != aligned.cin or aligned.cin_pad % aligned.bsc.block_shape[0]:
        return False
    z = _sizes(x.shape, aligned, padding, tile_rows or _pick_tile_rows(
        x.shape, aligned, padding))
    slab = z["n_cin_b"] * z["slab_len"] * z["bk"] * 4
    n_bcols, max_bw = aligned.bsc.blocks.shape[:2]
    wmem = n_bcols * max_bw * z["bk"] * z["bn"] * 2
    out_tile = (z["pimg"] * z["ho"] * z["wo"] * n_bcols * z["bn"]
                * x.dtype.itemsize)
    ximg = z["pimg"] * z["h"] * z["w"] * z["c"] * x.dtype.itemsize
    acc = z["q"] * z["wp"] * z["bn"] * 4
    # double-buffered x/out + slab + resident weight slice (min group = 1
    # bcol keeps wmem/n under control; approximate with full then grouped)
    total = slab + min(wmem, W_BUDGET) + 2 * out_tile + 2 * ximg + 2 * acc
    return total <= VMEM_BUDGET


def _pick_tile_rows(x_shape, aligned, padding):
    # whole-row tiles: target ~512 M-rows per tile for MXU efficiency
    wp_s = -(-(x_shape[2] + padding[1]) // 8) * 8
    return max(1, 512 // wp_s)


def _make_kernel(z, group_n, n_bcols, relu, out_dtype, mxu_dtype, n_groups):
    kh, kw, wp, bk, bn = z["kh"], z["kw"], z["wp"], z["bk"], z["bn"]
    n_cin_b, q, n_tiles, slab_len = (z["n_cin_b"], z["q"], z["n_tiles"],
                                     z["slab_len"])
    h, w, c, ph, pw, ho, wo = (z["h"], z["w"], z["c"], z["ph"], z["pw"],
                               z["ho"], z["wo"])
    pimg, img_len, hp, wp_s = z["pimg"], z["img_len"], z["hp"], z["wp_s"]
    tile_m = q * wp_s
    # bulk fast paths when slab rows coincide exactly with data rows
    # (pad-free 8-multiple widths, i.e. 1x1 convs on aligned feature maps)
    aligned_w = (ph == 0 and pw == 0 and w == wp_s)

    def kernel(row_ref, nnz_ref, x_hbm, w_ref, bias_ref, out_ref, slab_ref):
        b = pl.program_id(0)
        g = pl.program_id(1) if n_groups > 1 else 0

        # --- zero the slab once: pad rows/cols stay zero forever ---
        @pl.when(jnp.logical_and(b == 0, g == 0))
        def _zero():
            slab_ref[...] = jnp.zeros_like(slab_ref)

        # --- build the padded slab for the packed images (first group) ---
        @pl.when(g == 0 if n_groups > 1 else b >= 0)
        def _build():
            for cb in range(n_cin_b):
                c0 = cb * bk
                cw = min(bk, c - c0)  # channel tail (cin_pad > c)
                for p in range(pimg):
                    base = (1 + p * hp) * wp_s
                    if aligned_w:
                        # contiguous rows: copy in ~512-row chunks with a
                        # layout-free (rr, w, bk) -> (rr*w, bk) regroup
                        rr = max(1, 512 // w)
                        for r0 in range(0, h, rr):
                            rn = min(rr, h - r0)
                            v = x_hbm[p, r0:r0 + rn, :, c0:c0 + cw]
                            slab_ref[cb, pl.ds(base + r0 * w, rn * w),
                                     0:cw] = v.reshape(rn * w, cw).astype(
                                         jnp.float32)
                    else:
                        for r in range(h):
                            dst = base + (ph + r) * wp_s  # 8-aligned
                            slab_ref[cb, pl.ds(dst, w), 0:cw] = x_hbm[
                                p, r, :, c0:c0 + cw].astype(jnp.float32)

        # --- compute: per block-column, per packed-row tile ---
        for j in range(group_n):
            jg = g * group_n + j if n_groups > 1 else j
            for t in range(n_tiles):
                m0 = (1 + t * q) * wp_s

                def body(s, acc):
                    kblk = row_ref[jg, s]
                    off = kblk // n_cin_b
                    cb = kblk % n_cin_b
                    khi = off // kw
                    kwi = off % kw
                    # kwi < pw underflows into the previous row's zeroed
                    # garbage columns == left padding
                    start = m0 + khi * wp_s + kwi - pw
                    a = slab_ref[cb, pl.ds(start, tile_m), :]
                    return acc + jnp.dot(
                        a.astype(mxu_dtype), w_ref[j, s],
                        preferred_element_type=jnp.float32)

                acc = lax.fori_loop(
                    0, nnz_ref[jg], body,
                    jnp.zeros((tile_m, bn), jnp.float32))
                acc = acc + bias_ref[0, j * bn:(j + 1) * bn][None, :]
                if relu:
                    acc = jnp.maximum(acc, 0.0)
                acc = acc.astype(out_dtype)
                # exact NHWC stores (no garbage columns leave VMEM).
                # Tile rows are global padded rows gr in [t*q, t*q+q) over
                # the packed images: image p = gr // hp, local row rr =
                # gr % hp, valid output row when rr < ho.
                # Free regroup (wp_s % 8 == 0 keeps sublane groups intact),
                # then ONE masked store per maximal run of valid output rows
                # (instead of ho per-row stores — profiling showed per-row
                # stores dominating kernels with large Ho).
                v = acc.reshape(q, wp_s, bn)
                dr = 0
                while dr < q:
                    gr = t * q + dr
                    p, rr = gr // hp, gr % hp
                    if p >= pimg or rr >= ho:
                        dr += 1  # inter-image / bottom-pad garbage row
                        continue
                    rn = min(q - dr, ho - rr)
                    out_ref[p, rr:rr + rn, :, j * bn:(j + 1) * bn] = v[
                        dr:dr + rn, 0:wo, :]
                    dr += rn

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("kernel_shape", "padding", "block_shape", "cin_pad",
                     "cout", "relu", "tile_rows", "interpret",
                     "out_dtype_name", "mxu_dtype"),
)
def _run(x, blocks, block_row, bcol_nnz, bias, *, kernel_shape, padding,
         block_shape, cin_pad, cout, relu, tile_rows, interpret,
         out_dtype_name, mxu_dtype):

    class _A:  # minimal shim for _sizes
        pass

    a = _A()
    a.kernel_shape = kernel_shape
    a.cin_pad = cin_pad

    class _B:
        pass

    a.bsc = _B()
    a.bsc.block_shape = block_shape
    z = _sizes(x.shape, a, padding, tile_rows)
    n = x.shape[0]
    out_dtype = jnp.dtype(out_dtype_name)
    mxu = jnp.dtype(mxu_dtype)
    blocks = blocks.astype(mxu)

    n_bcols, max_bw = blocks.shape[:2]
    bk, bn = block_shape
    w_bytes = n_bcols * max_bw * bk * bn * blocks.dtype.itemsize
    n_groups = min(n_bcols, max(1, -(-w_bytes // W_BUDGET)))
    while n_bcols % n_groups != 0:
        n_groups += 1
    group_n = n_bcols // n_groups

    bias_p = jnp.pad(bias, (0, n_bcols * bn - bias.shape[0])).reshape(1, -1)
    kernel = _make_kernel(z, group_n, n_bcols, relu, out_dtype, mxu, n_groups)

    pimg = z["pimg"]
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n // pimg, n_groups),
            in_specs=[
                pl.BlockSpec((pimg,) + x.shape[1:],
                             lambda b, g, br, nz: (b, 0, 0, 0)),
                pl.BlockSpec((group_n, max_bw, bk, bn),
                             lambda b, g, br, nz: (g, 0, 0, 0)),
                pl.BlockSpec((1, group_n * bn), lambda b, g, br, nz: (0, g)),
            ],
            out_specs=pl.BlockSpec(
                (pimg, z["ho"], z["wo"], group_n * bn),
                lambda b, g, br, nz: (b, 0, 0, g)),
            scratch_shapes=[
                pltpu.VMEM((z["n_cin_b"], z["slab_len"], bk), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n, z["ho"], z["wo"], n_bcols * bn), out_dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            has_side_effects=True),
    )(block_row, bcol_nnz, x, blocks, bias_p)

    if n_bcols * bn != cout:
        out = out[..., :cout]
    return out


def sconv(x, aligned: AlignedConvWeight, *, padding, relu, policy):
    """Direct sparse conv on native NHWC. x: [N,H,W,Cin] -> [N,Ho,Wo,Cout].
    Stride 1 / dilation 1 (callers gate via `supported`)."""
    bias = aligned.bias
    if bias is None:
        bias = jnp.zeros((aligned.cout,), jnp.float32)
    return _run(
        x, aligned.bsc.blocks, aligned.bsc.block_row, aligned.bsc.bcol_nnz,
        bias,
        kernel_shape=aligned.kernel_shape,
        padding=tuple(padding),
        block_shape=aligned.bsc.block_shape,
        cin_pad=aligned.cin_pad,
        cout=aligned.cout,
        relu=relu,
        tile_rows=_pick_tile_rows(x.shape, aligned, padding),
        interpret=policy.interpret,
        out_dtype_name=jnp.dtype(x.dtype).name,
        mxu_dtype=policy.resolved_mxu_dtype(),
    )
