"""Pallas TPU block-sparse SpMM: dense (M, K) @ BSC (K, N) -> (M, N).

The performance engine of the lowered sparse path — the TPU-native answer to
cuSPARSE csrmm2 (`src/caffe/util/math_functions.cu:48-79`). Design (v2, after
profiling on-chip):

* Grid has ONE step per M-tile. Each step keeps the full K-width A-tile
  (tile_m, Kp) in VMEM plus the *entire* padded block-sparse weight
  (n_bcols, max_bw, bk, bn), which the pipeline fetches once and reuses across
  every M-tile (constant index map). This mirrors the reference's
  `sconv_batch_tiled` trick of amortizing one weight fetch across images
  (`math_functions.cu:524-587`) — here one weight residency amortizes across
  all M-tiles.
* Inside the step, a static unroll over output block-columns with a
  `fori_loop` over that column's nonzero K-blocks: each iteration does an
  MXU matmul (tile_m, bk) @ (bk, bn) against a *dynamically lane-sliced*
  A sub-tile selected by the scalar-prefetched ``block_row`` index. Compute
  scales with nnz blocks; zero blocks cost nothing (the fori trip count is
  ``bcol_nnz[j]``).
* An earlier design put nonzero blocks in the grid's inner dimension
  (megablox-style); per-grid-step overhead (~0.4-1.2us) capped it at ~20
  TF/s vs XLA dense's 64 TF/s on the same chip. The in-kernel loop removes
  that machinery from the per-block cost.

VMEM budget: A-tile (tile_m*Kp*4) + weights (nnz_blocks*bk*bn*4) + out tile
(tile_m*Np*4). `supported()`-style sizing is handled by the caller falling
back to the jnp executor when K is huge; typical conv GEMM K <= 4608 fits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from caffe_escoin_tpu.sparse.formats import BSC


def pallas_supported(bsc: BSC) -> bool:
    """Mosaic lowers dynamic lane slices only at 128-aligned offsets; a
    single K-block degenerates to a static slice and is always fine."""
    bk, _ = bsc.block_shape
    return bk % 128 == 0 or bsc.n_brows == 1


def _make_kernel(group_n, bk, bn, tile_m, n_brows, out_dtype, mxu_dtype):
    def kernel(row_ref, nnz_ref, a_ref, w_ref, out_ref):
        g = pl.program_id(0)
        for j in range(group_n):  # static unroll over the group's block-columns
            jg = g * group_n + j

            def body(s, acc):
                if n_brows == 1:
                    ablk = a_ref[:, 0:bk]  # static (see pallas_supported)
                else:
                    kblk = row_ref[jg, s]
                    off = pl.multiple_of(kblk * bk, 128)
                    ablk = a_ref[:, pl.ds(off, bk)]
                return acc + jnp.dot(
                    ablk.astype(mxu_dtype), w_ref[j, s],
                    preferred_element_type=jnp.float32,
                )

            acc = lax.fori_loop(
                0, nnz_ref[jg], body, jnp.zeros((tile_m, bn), jnp.float32),
                unroll=False,
            )
            out_ref[:, j * bn : (j + 1) * bn] = acc.astype(out_dtype)

    return kernel


def _pad_to(x, mult, axis):
    rem = (-x.shape[axis]) % mult
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads)


@functools.partial(
    jax.jit,
    static_argnames=(
        "shape", "block_shape", "tile_m", "interpret", "out_dtype_name",
        "w_budget", "mxu_dtype",
    ),
)
def _run(amat, blocks, block_row, bcol_nnz, *, shape, block_shape,
         tile_m, interpret, out_dtype_name, w_budget, mxu_dtype):
    bk, bn = block_shape
    k_logical, n_logical = shape
    m = amat.shape[0]
    # Weights cast to the MXU multiply dtype up front (tiny, reused across
    # all M-tiles); the A-tile is cast *in-kernel* — a pre-cast pass over A
    # would cost a full extra HBM round-trip, which is exactly what kills a
    # bandwidth-bound 1x1 layer. Accumulation stays f32.
    mxu = jnp.dtype(mxu_dtype)
    blocks = blocks.astype(mxu)
    # M is NOT padded to tile_m: pallas handles a ragged final tile (the
    # out-of-range rows compute garbage that is never written back), so the
    # output needs no over-allocation + slice-copy. Only sublane alignment
    # (8) and the K blocking are physical requirements.
    a = _pad_to(_pad_to(amat, 8, 0), bk, 1)
    mp, kp = a.shape
    n_bcols, max_bw = blocks.shape[:2]
    out_dtype = jnp.dtype(out_dtype_name)

    # Column grouping keeps the resident weight slice under a VMEM budget
    # (~4MB): within a group's grid column, M-tiles stream while the weight
    # slice stays put (grid order g outer, i inner -> weight fetched once per
    # group).
    w_bytes = n_bcols * max_bw * bk * bn * blocks.dtype.itemsize
    n_groups = min(n_bcols, max(1, -(-w_bytes // w_budget)))
    while n_bcols % n_groups != 0:  # need equal groups (bounded by n_bcols)
        n_groups += 1
    group_n = n_bcols // n_groups

    n_brows = -(-k_logical // bk)
    kernel = _make_kernel(group_n, bk, bn, tile_m, n_brows, out_dtype, mxu)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # block_row, bcol_nnz
            grid=(n_groups, -(-mp // tile_m)),
            in_specs=[
                pl.BlockSpec((tile_m, kp), lambda g, i, br, nz: (i, 0)),
                pl.BlockSpec(
                    (group_n, max_bw, bk, bn),
                    lambda g, i, br, nz: (g, 0, 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (tile_m, group_n * bn), lambda g, i, br, nz: (i, g)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((mp, n_bcols * bn), out_dtype),
        interpret=interpret,
        # let XLA fuse the (free) reshape/pad producers of A directly into
        # the kernel's operand reads instead of materializing a staged copy
        compiler_params=None if interpret else pltpu.CompilerParams(
            allow_input_fusion=[False, False, True, False]),
    )(block_row, bcol_nnz, a, blocks)
    return out[:m, :n_logical]


def bsc_spmm_pallas(amat, bsc: BSC, *, tile_m: int = 512, out_dtype=None,
                    interpret: bool = False, w_budget: int = 4 * 1024 * 1024,
                    mxu_dtype: str = "float32"):
    """amat: (M, K) dense; bsc: (K, N). Returns (M, N)."""
    if amat.shape[1] != bsc.shape[0]:
        raise ValueError(f"amat cols {amat.shape[1]} != sparse K {bsc.shape[0]}")
    out_dtype = jnp.dtype(out_dtype or amat.dtype)
    tile_m = min(tile_m, max(8, _pad_to(amat, 8, 0).shape[0]))
    return _run(
        amat,
        bsc.blocks,
        bsc.block_row,
        bsc.bcol_nnz,
        shape=bsc.shape,
        block_shape=bsc.block_shape,
        tile_m=tile_m,
        interpret=interpret,
        out_dtype_name=out_dtype.name,
        w_budget=w_budget,
        mxu_dtype=mxu_dtype,
    )
