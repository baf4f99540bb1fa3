"""Round-5 stability probe: the composed packed sparse ResNet-50 forward
measured 0.923ms in the session that freshly autotuned+calibrated it and
1.287ms in a later session serving the SAME cached arms (identical HLO —
hash-verified deterministic). Dense baselines matched exactly (2.090ms)
both times, so this is not chip clock state. Hypotheses probed, one
process each phase:

  A: time the sparse net 3x cold-start (reproduce the slow mode?)
  B: execute a zoo of ~60 varied small modules (what the fresh-autotune
     session did before its composed timings), then re-time 3x
  C: re-jit the same net fresh and time again
  D: control: dense-bf16 net timed at start and end

If B recovers the fast mode, allocator/executable-load state explains the
bimodality and bench can adopt a standard pre-measurement warmup.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "CESCOIN_AUTOTUNE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".autotune_tpu.json"))


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from caffe_escoin_tpu.engine import autotune
    from caffe_escoin_tpu.engine.context import ConvMode, ExecutionPolicy
    from caffe_escoin_tpu.models import ZOO
    from caffe_escoin_tpu.nn import Net
    from caffe_escoin_tpu.nn.fuse import fuse_inference, pack_narrow_chains
    from caffe_escoin_tpu.utils.benchmark import device_time
    from caffe_escoin_tpu.utils.pruning import prune_conv_weight

    print("backend:", jax.default_backend(), flush=True)
    builder, ish = ZOO["resnet50"]
    pol_s = ExecutionPolicy(conv_mode=ConvMode.SCONV_PAR,
                            block_shape=(128, 128),
                            compute_dtype=jnp.bfloat16, cast_back=False,
                            autotune=True)
    pol_d = ExecutionPolicy(compute_dtype=jnp.bfloat16, cast_back=False)
    shapes = {"data": (32, 224, 224, 3)}
    net_d = Net(builder(), policy=pol_d, phase="test")
    net_s = Net(builder(), policy=pol_s, phase="test")
    params = net_d.init(jax.random.PRNGKey(0), shapes)
    pruned = dict(params)
    for layer in net_s.layers:
        n = layer.spec.name
        if n not in pruned or layer.spec.type not in (
                "Convolution", "ConvolutionReLU"):
            continue
        w = np.asarray(pruned[n]["w"])
        if w.shape[0] * w.shape[1] * w.shape[2] < 32:
            continue
        pruned[n] = dict(pruned[n], w=jnp.asarray(
            prune_conv_weight(w, 0.9, (128, 128))))
    net_db, params_db = fuse_inference(net_d, params, state=net_d.state0)
    net_s.blob_shapes = dict(net_d.blob_shapes)
    net_s, pruned_s = fuse_inference(net_s, pruned, state=net_d.state0)
    net_s = pack_narrow_chains(net_s)
    aligned = net_s.weight_align(pruned_s)
    rngx = np.random.default_rng(0)
    xvars = [jnp.asarray(rngx.standard_normal(
        shapes["data"]).astype(np.float32) * 0.1) for _ in range(4)]
    x = xvars[0]

    def first(out):
        return out[next(iter(out))]

    fwd_db = jax.jit(lambda p, i: net_db.apply(p, i))

    def time_dense():
        return device_time(
            lambda p, y: first(fwd_db(p, {"data": y})), params_db, x,
            iters=20, arg_sets=[(params_db, xv) for xv in xvars])

    def time_sparse(tag):
        with autotune.net_scope("resnet50"):
            fn = net_s.inference_fn(aligned)
            t = device_time(lambda y: first(fn({"data": y})), x, iters=20,
                            arg_sets=[(xv,) for xv in xvars])
            # profiler-free cross-check: wall-clock a 200-iter dispatch
            # loop (relay queueing amortizes over the loop). If this
            # disagrees with the profiler number, the session variance is
            # measurement attribution, not device execution.
            jfn = jax.jit(lambda y: first(fn({"data": y})))
            for xv in xvars:
                jax.block_until_ready(jfn(xv))
            t0 = time.time()
            outs = None
            for i in range(200):
                outs = jfn(xvars[i % 4])
            jax.block_until_ready(outs)
            wall = (time.time() - t0) / 200
        print(json.dumps({"phase": tag, "t_sparse_ms": round(t * 1e3, 4),
                          "wall_ms": round(wall * 1e3, 4),
                          "ts": time.strftime("%H:%M:%S")}), flush=True)
        return t

    td0 = time_dense()
    print(json.dumps({"phase": "dense_start",
                      "t_ms": round(td0 * 1e3, 4)}), flush=True)
    for i in range(3):
        time_sparse(f"A{i}")

    # phase B: the zoo — varied small modules like a fresh-autotune session
    rng = np.random.default_rng(1)
    t0 = time.time()
    for i in range(60):
        hw = int(rng.choice([7, 14, 28, 56]))
        cc = int(rng.choice([64, 128, 256, 512]))
        a = jnp.asarray(rng.standard_normal(
            (8, hw, hw, cc)).astype(np.float32)).astype(jnp.bfloat16)
        wz = jnp.asarray(rng.standard_normal(
            (cc, 128)).astype(np.float32)).astype(jnp.bfloat16)
        f = jax.jit(lambda u, v: jnp.maximum(
            jax.lax.dot_general(u, v, (((3,), (0,)), ((), ())) ), 0))
        jax.block_until_ready(f(a, wz))
    print(json.dumps({"phase": "zoo_done",
                      "s": round(time.time() - t0, 1)}), flush=True)
    for i in range(3):
        time_sparse(f"B{i}")

    # phase C: fresh re-jit
    for i in range(2):
        time_sparse(f"C{i}")
    td1 = time_dense()
    print(json.dumps({"phase": "dense_end",
                      "t_ms": round(td1 * 1e3, 4)}), flush=True)


if __name__ == "__main__":
    main()
