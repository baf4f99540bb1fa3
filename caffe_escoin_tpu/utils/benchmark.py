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
            # The op's input is loop-invariant; to defeat hoisting we perturb
            # x by the (tiny) carry scalar each iteration. The
            # optimization_barrier forces the FULL output to materialize —
            # without it XLA fuses the op into the scalar consumer and (e.g.)
            # a conv's output never touches HBM, under-reporting the cost of
            # any op measured this way (and unfairly so when comparing
            # against pallas custom calls, which always materialize).
            def body(i, carry):
                delta, x = carry
                y = (x + delta.astype(x.dtype)).astype(x.dtype)
                out = lax.optimization_barrier(op(y))
                probe = out.ravel()[0].astype(jnp.float32)
                return (probe * 1e-30 + delta * 0.5, x)
            return lax.fori_loop(0, iters, body,
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


def row_major_format(ndim: int):
    """A jit out_shardings Format pinning the entry output to row-major
    {N-1,...,0}. XLA's default entry-layout choice for conv-shaped outputs
    can differ from a pallas kernel's (fixed) row-major result layout,
    inserting a transpose copy that exists only at the jit boundary — in a
    real net the consumer is the next kernel, which constrains row-major."""
    import jax
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    return Format(Layout(major_to_minor=tuple(range(ndim))),
                  SingleDeviceSharding(jax.devices()[0]))


def device_time(f: Callable, *args, iters: int = 20, out_format=None,
                arg_sets=None) -> float:
    """Median on-device seconds per execution of jit(f)(*args), measured from
    the XLA device timeline via jax.profiler.

    This is the ground-truth timer on this environment: host-side
    wall-clock timing through the remote-dispatch relay carries tens of ms
    of non-deterministic queueing noise, which `slope_time` differencing
    only partially cancels. The profiler's "XLA Modules" track records the
    actual device execution span of each module run.

    ``arg_sets`` (a list of >=2 argument tuples, cycled across iterations)
    defeats the warm-VMEM hazard: repeating the SAME module on the SAME
    buffers lets parameters stay VMEM-resident across executions, so
    memory-bound modules report times far below their HBM roofline (a
    4096x4096 bf16 matmul "measures" 12us warm vs ~46us cold = its actual
    weight-streaming bound). Cycling distinct buffers restores the
    cold-read cost every layer pays inside a real net forward, where the
    rest of the network's traffic evicts it between uses. Pass it for any
    module whose operands fit in VMEM (~128MB on v5e).

    Falls back to `slope_time` when no device timeline is present (CPU
    interpret-mode runs).
    """
    import glob
    import gzip
    import json
    import os
    import statistics
    import tempfile

    fj = jax.jit(f) if out_format is None else jax.jit(
        f, out_shardings=out_format)
    sets = list(arg_sets) if arg_sets else [args]
    for s in sets:
        jax.block_until_ready(fj(*s))  # compile + warm every variant
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for i in range(iters):
                jax.block_until_ready(fj(*sets[i % len(sets)]))
        traces = glob.glob(
            os.path.join(td, "**", "*.trace.json.gz"), recursive=True)

        def _fallback():
            s0 = sets[0]
            if len(s0) == 1:
                return slope_time(f, s0[0])
            return slope_time(lambda x: f(x, *s0[1:]), s0[0])

        if not traces:
            return _fallback()
        with gzip.open(traces[0], "rt") as fh:
            data = json.load(fh)
    evs = data.get("traceEvents", [])
    device_pids = {
        e["pid"] for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "device:" in str(e.get("args", {}).get("name", ""))
    }
    module_tids = {
        (e["pid"], e["tid"]) for e in evs
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e["pid"] in device_pids
        and e.get("args", {}).get("name") == "XLA Modules"
    }
    durs = [
        e["dur"] for e in evs
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in module_tids
    ]
    if not durs:
        return _fallback()
    # one module execution per iteration; if several modules ran per
    # iteration (multi-dispatch fns), group by execution order
    per_iter = max(1, len(durs) // iters)
    totals = [
        sum(durs[i : i + per_iter]) for i in range(0, len(durs), per_iter)
    ]
    return statistics.median(totals) * 1e-6


def device_time_cycle(pairs, *, iters: int = 20) -> float:
    """Like ``device_time(..., arg_sets=...)`` but for CLOSURE variants:
    ``pairs`` is a list of (callable, args-tuple); each callable closes over
    its own weight replica (needed when the sparse pattern must be concrete
    at trace time, so weights cannot be jit arguments). Cycling distinct
    modules+buffers defeats the warm-VMEM repeated-dispatch hazard the same
    way arg_sets does (validated: a 4096x4096 bf16 matmul measures 12us
    warm-identical, 47us cycling 4 closures, vs its 41us HBM bound).

    Returns median on-device seconds per execution across all variants.
    """
    import glob
    import gzip
    import json
    import os
    import statistics
    import tempfile

    fjs = [(jax.jit(f), a) for f, a in pairs]
    for fj, a in fjs:
        jax.block_until_ready(fj(*a))
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for i in range(iters):
                fj, a = fjs[i % len(fjs)]
                jax.block_until_ready(fj(*a))
        traces = glob.glob(
            os.path.join(td, "**", "*.trace.json.gz"), recursive=True)
        if not traces:
            f0, a0 = pairs[0]
            return slope_time(lambda x: f0(x, *a0[1:]), a0[0])
        with gzip.open(traces[0], "rt") as fh:
            data = json.load(fh)
    evs = data.get("traceEvents", [])
    device_pids = {
        e["pid"] for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "device:" in str(e.get("args", {}).get("name", ""))
    }
    module_tids = {
        (e["pid"], e["tid"]) for e in evs
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e["pid"] in device_pids
        and e.get("args", {}).get("name") == "XLA Modules"
    }
    durs = [
        e["dur"] for e in evs
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in module_tids
    ]
    if not durs:
        f0, a0 = pairs[0]
        return slope_time(lambda x: f0(x, *a0[1:]), a0[0])
    per_iter = max(1, len(durs) // iters)
    totals = [
        sum(durs[i : i + per_iter]) for i in range(0, len(durs), per_iter)
    ]
    return statistics.median(totals) * 1e-6


def force_platform(name: str) -> str:
    """Route jax onto the requested platform, tolerating proxied backends.

    Under a remote-TPU relay (e.g. axon) the TPU is reachable through a
    custom platform registration: `jax_platforms="tpu"` would try to
    initialize a LOCAL TPU and die with "No ... device found" even though
    `jax.devices()` serves a TPU. Requesting "tpu" therefore first tries
    the literal platform and falls back to automatic selection, which
    resolves to the proxied chip when one is present. Returns the backend
    actually selected."""
    import jax

    if name in ("", "auto"):
        return jax.default_backend()
    try:
        jax.config.update("jax_platforms", name)
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        try:  # drop any cached failed-init state before reprobing
            jax.clear_backends()
        except Exception:
            pass
        try:  # the failed init can leave backend state wedged; keep the
            got = jax.default_backend()  # descriptive error either way
        except Exception as e:
            raise RuntimeError(
                f"platform {name!r} unavailable (backend reprobe failed: "
                f"{e!r})") from e
        if got != name:
            raise RuntimeError(
                f"platform {name!r} unavailable (auto selected {got!r})")
    return jax.default_backend()
