"""On-chip benchmarking utilities.

Replaces the reference's `Timer`/`CPUTimer` (`include/caffe/util/benchmark.hpp`)
with harnesses that survive two TPU-measurement hazards discovered while
profiling this environment:

1. **XLA dead-code elimination**: timing `f(x)[0,0]` in a loop lets XLA slice
   the computation to one element. The harness chains the FULL output back
   into the next iteration's input (same-shape ops) or folds it with a
   `jnp.sum` consumed by the carry.
2. **Fixed per-execution overhead** (~tens of ms through remote-dispatch
   relays): `slope_time` runs the in-graph loop at two iteration counts and
   reports (T(n2) - T(n1)) / (n2 - n1), cancelling any per-execution constant.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax


def _loop_fn(op: Callable, iters: int, same_shape: bool):
    if same_shape:
        @jax.jit
        def rep(x):
            def body(i, x):
                return (op(x) * 0.999).astype(x.dtype)
            return lax.fori_loop(0, iters, body, x)
    else:
        @jax.jit
        def rep(x):
            def body(i, carry):
                delta, x = carry
                out = op(x)
                return (jnp.sum(out).astype(jnp.float32) * 1e-30 + delta * 0.5,
                        x)
            # the op's input is loop-invariant here; to defeat hoisting we
            # perturb x by the (tiny) carry scalar each iteration
            def body2(i, carry):
                delta, x = carry
                y = (x + delta.astype(x.dtype)).astype(x.dtype)
                out = op(y)
                return (jnp.sum(out).astype(jnp.float32) * 1e-30 + delta * 0.5,
                        x)
            return lax.fori_loop(0, iters, body2,
                                 (jnp.float32(0.0), x))[0]
    return rep


def _best_total(rep, x, repeats: int = 2) -> float:
    rep(x)  # compile + warm
    jax.block_until_ready(rep(x))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(rep(x))
        best = min(best, time.perf_counter() - t0)
    return best


def slope_time(op: Callable, x, *, n1: int = 50, n2: int = 250,
               same_shape: bool = False, repeats: int = 2) -> float:
    """Seconds per op execution, fixed dispatch cost cancelled."""
    t1 = _best_total(_loop_fn(op, n1, same_shape), x, repeats)
    t2 = _best_total(_loop_fn(op, n2, same_shape), x, repeats)
    return max(1e-9, (t2 - t1) / (n2 - n1))


def wall_time(f: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Plain dispatch timing (includes per-call overhead) — for end-to-end
    model latency where that overhead is part of the user experience."""
    import numpy as np

    for _ in range(warmup):
        jax.block_until_ready(f(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
