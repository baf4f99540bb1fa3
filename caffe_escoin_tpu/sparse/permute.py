"""Sparsity-pattern-aware channel permutation.

The MXU only skips work at block granularity, and a random unstructured
pattern at 90% sparsity has essentially no empty (128,128) blocks
(P(empty) = 0.9^16384 ~ 0). REAL pruned weights are not random — magnitude
pruning kills correlated structures (weak channels, weak offset planes) —
so reordering input/output channels can concentrate the survivors into far
fewer live blocks. This module finds such permutations greedily.

Permutation semantics: for W[K, Cout] with K = (offset, cin) rows,
* a Cout permutation reorders output channels — FREE to deploy when the
  consumer's weights are permuted along cin to match (for conv chains,
  producer cout-perm == consumer cin-perm);
* a cin permutation reorders input channels within every kernel offset —
  free when the producer's cout was permuted identically.
The greedy objective is the number of live (bk, bn) blocks of the permuted
GEMM-view weight, i.e. exactly the XBSP executors' work term.

This is the TPU counterpart of the literature's channel-permutation tricks
for N:M sparsity (and of the reference's column-blocked CSR reordering goal,
`base_conv_layer.cpp:108-231`, which blocked columns for cache locality).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _live_blocks(mask: np.ndarray, bk: int, bn: int) -> int:
    """Number of (bk, bn) blocks of boolean mask with any nonzero."""
    K, N = mask.shape
    Kp, Np = -(-K // bk) * bk, -(-N // bn) * bn
    m = np.zeros((Kp, Np), bool)
    m[:K, :N] = mask
    return int(
        m.reshape(Kp // bk, bk, Np // bn, bn).any(axis=(1, 3)).sum())


def _greedy_group(sig: np.ndarray, group: int) -> np.ndarray:
    """Greedy grouping of columns by signature union.

    sig: [C, S] bool — per column, which signature bits (row-blocks) are
    live. Returns a permutation of range(C) such that consecutive groups of
    ``group`` columns have (locally) minimal signature-union sizes: seed each
    group with the densest unassigned column, then repeatedly add the column
    whose union increase is smallest.
    """
    C = sig.shape[0]
    unassigned = np.ones(C, bool)
    order = []
    weights = sig.sum(axis=1)
    while unassigned.any():
        cand = np.where(unassigned)[0]
        seed = cand[np.argmax(weights[cand])]
        cur = sig[seed].copy()
        members = [seed]
        unassigned[seed] = False
        while len(members) % group != 0 and unassigned.any():
            cand = np.where(unassigned)[0]
            # union growth if added; tie-break toward denser columns (pack
            # heavy columns together, leaving later groups sparser)
            growth = (~cur & sig[cand]).sum(axis=1)
            pick = cand[np.lexsort((-weights[cand], growth))[0]]
            cur |= sig[pick]
            members.append(pick)
            unassigned[pick] = False
        order.extend(members)
    return np.asarray(order)


def block_permutation(
    wmat: np.ndarray,
    block_shape: Tuple[int, int],
    *,
    kernel_offsets: int = 1,
    passes: int = 2,
    optimize_rows: bool = True,
) -> Tuple[np.ndarray, np.ndarray, dict]:
    """Find (row_perm_within_cin, col_perm) minimizing live blocks.

    wmat: [K, Cout] GEMM-view weight with K = kernel_offsets * cin rows in
    (offset, cin) order. The row permutation acts on the cin index and is
    replicated across offsets (so it stays deployable as a channel perm);
    the column permutation acts on Cout.

    Returns (cin_perm, cout_perm, stats); apply as
        w2 = wmat.reshape(off, cin, cout)[:, cin_perm][:, :, cout_perm]
    """
    bk, bn = block_shape
    K, N = wmat.shape
    cin = K // kernel_offsets
    mask = wmat != 0
    cin_perm = np.arange(cin)
    cout_perm = np.arange(N)
    before = _live_blocks(mask, bk, bn)

    def apply_perms():
        m = mask.reshape(kernel_offsets, cin, N)[:, cin_perm][:, :, cout_perm]
        return m.reshape(K, N)

    for _ in range(passes):
        m = apply_perms()
        # cout pass: signature = live bk-row-blocks per output channel
        Kp = -(-K // bk) * bk
        mp = np.zeros((Kp, N), bool)
        mp[:K] = m
        sig_c = mp.reshape(Kp // bk, bk, N).any(axis=1).T  # [N, Kp/bk]
        cout_perm = cout_perm[_greedy_group(sig_c, max(1, bn))]
        if not optimize_rows:
            # cout-only mode: deployable by permuting just the consumer's
            # input rows, no upstream propagation needed
            continue
        m = apply_perms()
        # cin pass: signature = live bn-col-blocks per INPUT channel,
        # unioned across kernel offsets (the row perm must be shared)
        Np = -(-N // bn) * bn
        mp = np.zeros((K, Np), bool)
        mp[:, :N] = m
        per_row = mp.reshape(K, Np // bn, bn).any(axis=2)  # [K, Np/bn]
        sig_r = per_row.reshape(kernel_offsets, cin, -1).any(axis=0)
        group_rows = max(1, bk if cin >= bk else cin)
        cin_perm = cin_perm[_greedy_group(sig_r, group_rows)]

    after = _live_blocks(apply_perms(), bk, bn)
    stats = dict(blocks_before=before, blocks_after=after,
                 reduction=round(1.0 - after / max(1, before), 4))
    return cin_perm, cout_perm, stats


def permute_conv_weight(w_hwio: np.ndarray, cin_perm, cout_perm) -> np.ndarray:
    """Apply channel permutations to a conv weight [KH,KW,Cin,Cout]."""
    return np.asarray(w_hwio)[:, :, cin_perm][:, :, :, cout_perm]
