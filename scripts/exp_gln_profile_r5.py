"""Op-level profile of the composed sparse GoogLeNet forward (b16,
calibrated arms): dump the top device ops by total time to localize the
non-conv bucket (pool branches / LRN / the 9 inception concats) that
holds the e2e at 1.13x vs dense-bf16.  Same harness as
exp_opprofile_r5.py but for the googlenet graph.  Run on the chip."""
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "CESCOIN_AUTOTUNE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".autotune_tpu.json"))


def build_fn(batch=16, packed=False):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from caffe_escoin_tpu.engine.context import ConvMode, ExecutionPolicy
    from caffe_escoin_tpu.models import ZOO
    from caffe_escoin_tpu.nn import Net
    from caffe_escoin_tpu.nn.fuse import fuse_inference, pack_narrow_chains
    from caffe_escoin_tpu.utils.pruning import prune_conv_weight

    builder, ish = ZOO["googlenet"]
    pol_s = ExecutionPolicy(conv_mode=ConvMode.SCONV_PAR,
                            block_shape=(128, 128),
                            compute_dtype=jnp.bfloat16, cast_back=False,
                            autotune=True)
    shapes = {"data": (batch, 224, 224, 3)}
    net_s = Net(builder(), policy=pol_s, phase="test")
    params = net_s.init(jax.random.PRNGKey(0), shapes)
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
    net_s, pruned_s = fuse_inference(net_s, pruned, state=net_s.state0)
    if packed:
        net_s = pack_narrow_chains(net_s)
    aligned = net_s.weight_align(pruned_s)
    rngx = np.random.default_rng(0)
    xvars = [jnp.asarray(rngx.standard_normal(
        shapes["data"]).astype(np.float32) * 0.1) for _ in range(4)]
    return net_s, aligned, xvars


def main():
    import jax
    from caffe_escoin_tpu.engine import autotune

    net_s, aligned, xvars = build_fn()
    out_top = net_s.specs[-1].tops[0]
    with autotune.net_scope("googlenet"):
        fn = net_s.inference_fn(aligned)
        for xv in xvars:
            jax.block_until_ready(fn({"data": xv})[out_top])
        td = tempfile.mkdtemp()
        with jax.profiler.trace(td):
            for i in range(12):
                jax.block_until_ready(
                    fn({"data": xvars[i % 4]})[out_top])
    traces = glob.glob(os.path.join(td, "**", "*.trace.json.gz"),
                       recursive=True)
    with gzip.open(traces[0], "rt") as fh:
        data = json.load(fh)
    evs = data.get("traceEvents", [])
    device_pids = {e["pid"] for e in evs
                   if e.get("ph") == "M" and e.get("name") == "process_name"
                   and "device:" in str(e.get("args", {}).get("name", ""))}
    tracks = {}
    for e in evs:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e["pid"] in device_pids):
            tracks[(e["pid"], e["tid"])] = e["args"]["name"]
    agg = {}
    mod_total = 0.0
    for e in evs:
        if e.get("ph") != "X":
            continue
        tname = tracks.get((e.get("pid"), e.get("tid")))
        if tname == "XLA Modules":
            mod_total += e["dur"]
        elif tname and tname.startswith("XLA Ops"):
            nm = e.get("name", "?")
            agg[nm] = agg.get(nm, 0.0) + e["dur"]
    print(json.dumps({"module_total_ms_per_iter":
                      round(mod_total / 12 * 1e-3, 4)}))
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:60]
    tot = sum(agg.values())
    for nm, us in top:
        print(f"{us/12:10.1f} us/iter  {us/max(tot,1)*100:5.1f}%  {nm[:110]}")


if __name__ == "__main__":
    main()
