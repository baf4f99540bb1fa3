"""A/B max-pool formulations on-chip.

The GoogLeNet op profile (exp_gln_profile_r5.py, r5 capture) showed
`reduce_window_max` running 4-6x above its bytes bound on the hot pool
shapes (s1 3x3 on 28x28x192: 121us vs ~21us bound; s2 3x3 on
56x56x192: 88us), while XLA's own concat+pool fusions run near bound.
Candidates:
  rw     - lax.reduce_window (current pool2d path)
  slice9 - single fusion: max of kh*kw shifted strided slices of the
           padded input (the LRN shifted-slice trick, ops/norm.py)
  twopass- 1-D W-max (stride sw) then 1-D H-max (stride sh): two
           bytes-bound fusions, no strided multi-window reads
Prints JSONL per shape.  Run on the chip."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from caffe_escoin_tpu.ops.pool import _pooled_size
from caffe_escoin_tpu.utils.benchmark import device_time


def pool_rw(x, k, s, p):
    ho = _pooled_size(x.shape[1], k, s, p, True)
    wo = _pooled_size(x.shape[2], k, s, p, True)
    need = (ho - 1) * s + k
    pad2 = max(0, need - x.shape[1] - p)
    xp = jnp.pad(x, ((0, 0), (p, pad2), (p, pad2), (0, 0)),
                 constant_values=-jnp.inf)
    out = lax.reduce_window(xp, -jnp.inf, lax.max,
                            (1, k, k, 1), (1, s, s, 1), "VALID")
    return out[:, :ho, :wo, :]


def pool_slice9(x, k, s, p):
    ho = _pooled_size(x.shape[1], k, s, p, True)
    wo = _pooled_size(x.shape[2], k, s, p, True)
    need = (ho - 1) * s + k
    pad2 = max(0, need - x.shape[1] - p)
    xp = jnp.pad(x, ((0, 0), (p, pad2), (p, pad2), (0, 0)),
                 constant_values=-jnp.inf)
    out = None
    for i in range(k):
        for j in range(k):
            sl = xp[:, i:i + (ho - 1) * s + 1:s, j:j + (wo - 1) * s + 1:s, :]
            out = sl if out is None else jnp.maximum(out, sl)
    return out


def pool_twopass(x, k, s, p):
    ho = _pooled_size(x.shape[1], k, s, p, True)
    wo = _pooled_size(x.shape[2], k, s, p, True)
    need = (ho - 1) * s + k
    pad2 = max(0, need - x.shape[1] - p)
    xp = jnp.pad(x, ((0, 0), (p, pad2), (p, pad2), (0, 0)),
                 constant_values=-jnp.inf)
    m = None
    for j in range(k):
        sl = xp[:, :, j:j + (wo - 1) * s + 1:s, :]
        m = sl if m is None else jnp.maximum(m, sl)
    out = None
    for i in range(k):
        sl = m[:, i:i + (ho - 1) * s + 1:s, :, :]
        out = sl if out is None else jnp.maximum(out, sl)
    return out


SHAPES = [
    # (shape, k, s, p, tag)
    ((16, 28, 28, 192), 3, 1, 1, "gln_3a_poolbranch"),
    ((16, 56, 56, 192), 3, 2, 0, "gln_pool2"),
    ((16, 112, 112, 64), 3, 2, 0, "gln_pool1"),
    ((32, 112, 112, 64), 3, 2, 1, "rn50_pool1_b32"),
    ((16, 14, 14, 512), 3, 1, 1, "gln_4b_poolbranch"),
    ((32, 28, 28, 96), 3, 2, 0, "alexnet_pool1ish"),
]


def main():
    rng = np.random.default_rng(0)
    for shape, k, s, p, tag in SHAPES:
        args = [jnp.asarray(rng.standard_normal(shape).astype(np.float32)
                            ).astype(jnp.bfloat16) for _ in range(4)]
        row = {"kind": "pool_ab", "tag": tag, "shape": list(shape),
               "k": k, "s": s, "p": p}
        ref = None
        for name, fn in [("rw", pool_rw), ("slice9", pool_slice9),
                         ("twopass", pool_twopass)]:
            f = lambda x, fn=fn: fn(x, k, s, p)
            y = np.asarray(jax.jit(f)(args[0]), np.float32)
            if ref is None:
                ref = y
            else:
                assert np.array_equal(ref, y), (tag, name)
            t = device_time(f, args[0], iters=20,
                            arg_sets=[(a,) for a in args])
            row[f"t_{name}_us"] = round(t * 1e6, 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
