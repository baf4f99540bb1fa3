"""Direct sparse convolution Pallas kernel (placeholder gating module).

Populated in the Pallas-engine milestone; `supported()` gates the fast path so
`ops.conv` can dispatch today and transparently pick the kernel up when it
lands. Until then SCONV/SCONV_PAR execute the lowered sparse path (correct,
slower), mirroring the reference's gemm fallback.
"""

from __future__ import annotations


def supported(x, aligned, policy) -> bool:
    return False


def sconv(x, aligned, *, padding, relu, policy, batch_parallel):
    raise NotImplementedError("direct sparse conv Pallas kernel not yet wired")
