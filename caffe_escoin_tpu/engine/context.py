"""Execution policy: the TPU-native replacement for `Caffe::conv_mode`.

The reference selects the convolution algorithm through a *global* singleton
enum settable only from the `test` CLI command, with hardcoded profitability
thresholds (`include/caffe/common.hpp:112,154`, `tools/caffe.cpp:293-301`,
thresholds 0.5/0.8/0.2 in `src/caffe/layers/base_conv_layer.cpp:548,727,752`).
SURVEY.md flags this as a wart; here the policy is an explicit, per-layer
configurable object threaded through op construction — no global mutable
state inside jit-traced code (mode choices are trace-time static).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple


class ConvMode(enum.IntEnum):
    """Convolution execution modes (reference `Caffe::ConvMode`,
    `include/caffe/common.hpp:112`). Same four capabilities, TPU meanings:

    LOWERED_GEMM   — dense XLA convolution (`lax.conv_general_dilated`), the
                     MXU-native dense baseline (reference: im2col + cuBLAS).
    LOWERED_SPARSE — im2col (patch extraction) + sparse weight SpMM
                     (reference: cuSPARSE csrmm2). ELL for unstructured CSR
                     semantics, BSR for MXU block-skipping performance.
    SCONV          — direct sparse convolution, no materialized im2col:
                     per-kernel-offset block-sparse shift-matmul Pallas kernel
                     streaming the padded ifmap through VMEM (reference:
                     `caffe_gpu_sconv` custom kernels).
    SCONV_PAR      — batch-parallel direct sparse conv: one weight-block fetch
                     amortized over the whole batch (reference:
                     `sconv_batch_tiled`, FMAP_BLOCK register blocking). On TPU
                     this folds the batch dim into the kernel grid so weight
                     blocks stay VMEM-resident across images.
    """

    LOWERED_GEMM = 0
    LOWERED_SPARSE = 1
    SCONV = 2
    SCONV_PAR = 3


class SparseFormat(enum.Enum):
    CSR = "csr"  # interchange only
    ELL = "ell"  # unstructured, gather-FMA kernels
    BSR = "bsr"  # block-structured, MXU block-skip kernels


@dataclasses.dataclass(frozen=True)
class ExecutionPolicy:
    """Per-layer (or net-default) execution policy.

    ``sparse_threshold`` / ``sconv_threshold``: minimum weight sparsity at
    which the sparse paths are profitable; below them the layer silently falls
    back to dense GEMM, mirroring the reference's density-based fallbacks
    (`base_conv_layer.cpp:548,727,752`) but configurable instead of hardcoded.
    """

    conv_mode: ConvMode = ConvMode.LOWERED_GEMM
    sparse_format: SparseFormat = SparseFormat.BSR
    block_shape: Tuple[int, int] = (8, 128)  # (cin-block, cout-block) MXU tile
    sparse_threshold: float = 0.5  # LOWERED_SPARSE profitability
    sconv_threshold: float = 0.5  # SCONV/SCONV_PAR profitability
    fuse_relu: bool = True  # fold layer's ReLU into the sparse kernel epilogue
    compute_dtype: object = None  # e.g. jnp.bfloat16; None = input dtype
    # with compute_dtype set: True casts each conv layer's output back to
    # its input dtype (per-layer mixed precision); False keeps outputs in
    # compute_dtype so the whole net runs (and moves bytes) at that width —
    # the bf16 end-to-end inference deployment
    cast_back: bool = True
    use_pallas: Optional[bool] = None  # None = auto (pallas on TPU backends)
    interpret: bool = False  # run pallas kernels in interpreter mode (tests)
    spmm_tile_m: int = 512  # pallas SpMM M-tile
    # MXU multiply dtype inside the Pallas kernels (accumulation is always
    # f32). "auto" = bf16 on real TPU, f32 under interpret — matching XLA's
    # DEFAULT precision, which runs f32 convs/matmuls with bf16 multiplier
    # passes on the MXU; a true-f32 sparse kernel would pay ~4-6x per FLOP
    # against that dense baseline. Set "float32" to force full-precision
    # multiplies (Precision.HIGHEST parity).
    mxu_dtype: str = "auto"
    # XLA-native static block-sparse unroll (kernels/xla_block_sparse.py) as
    # the primary sparse-conv executor; False forces the Pallas kernels.
    use_xla_sparse: bool = True
    # XBSP formulation: "unroll" (per-block-column dot chains — wins on
    # compute-bound k>1 and reduce-1x1 shapes), "gathered" (single GEMM over
    # the union of live K-blocks, output written once — wins on
    # write-bound expand-1x1 shapes), or "auto" (per-shape heuristic from
    # on-chip profiling; the reference's per-shape kernel dispatch,
    # `math_functions.cu:589-694`, reborn as a policy rule).
    xbsp_arm: str = "auto"
    # Measured per-(shape, pattern) arm selection with a dense never-lose
    # floor (engine/autotune.py): at trace time each candidate arm —
    # including the dense bf16 conv — is device-timed once and the winner
    # cached. Supersedes the xbsp_arm="auto" heuristic when on. Off by
    # default: it compiles 3 candidates per unique conv shape on first
    # trace (the deployment/bench switch, not the unit-test one).
    autotune: bool = False
    autotune_cache: str = ""  # JSON file persisting the measured table
    # Native host direct sparse conv (csrc/sconv.cc via pure_callback) when
    # running on the CPU backend — the reference's AVX blocked-sconv product
    # path (`sconv.hpp:83-678`) rebuilt over the BSC layout. Opt-in: the
    # jnp executors remain the default CPU test target.
    native_cpu: bool = False

    def resolved_mxu_dtype(self):
        if self.mxu_dtype == "auto":
            return "float32" if self.interpret else "bfloat16"
        return self.mxu_dtype

    def pallas_enabled(self) -> bool:
        if self.use_pallas is not None:
            return self.use_pallas
        import jax

        return jax.default_backend() != "cpu" or self.interpret

    def replace(self, **kw) -> "ExecutionPolicy":
        return dataclasses.replace(self, **kw)


_DEFAULT = ExecutionPolicy()


def default_policy() -> ExecutionPolicy:
    return _DEFAULT


def set_default_conv_mode(mode: ConvMode) -> None:
    """Convenience for CLI parity with `caffe test -conv_mode N`. Only affects
    nets built afterwards (policies are captured at construction)."""
    global _DEFAULT
    _DEFAULT = _DEFAULT.replace(conv_mode=ConvMode(mode))
