"""Round-5 experiment: padded-k3 aligned formulations on the blocker shapes.

The r4 verdict localized the last 1.2% to the 2.0x-bf16 ResNet-50 bar to
KERNEL headroom on padded k3 shapes (56x56 64->64 k3 at 1.95x of its traffic
bound = the padded-ifmap materialization; pad-free valid slices measured
SLOWER — unaligned reads). This measures every candidate ALIGNED
formulation on the real chip so the r5 kernel work is evidence-driven:

  unroll        current default arm (materialized jnp.pad)
  gcols         gathered_cols arm
  dense         XLA's own conv on the pruned weight (the floor)
  fused         the Pallas fused-slab kernel (in-VMEM pad; gated off r4)
  bbox          NEW: XLA conv on the live-offset bounding-box cropped kernel
                with asymmetric implicit padding (no pad materialization)
  prepad        unroll consuming an ALREADY-padded input (padding=0 on the
                58x58 buffer) — upper bound for a producer-pads protocol
  padonly       the jnp.pad op alone (what prepad would reclaim)
  padconcat     producer-side cost probe: per-column spatial pad BEFORE the
                channel concat vs plain concat (does XLA fuse pad+concat
                into one write?)

Usage: python scripts/exp_k3_r5.py [--shapes 56] [--batch 32] [--out f.jsonl]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--sparsity", type=float, default=0.9)
    ap.add_argument("--shapes", default="56,28,14,7",
                    help="comma list of map sizes to run")
    ap.add_argument("--arms", default="unroll,gcols,dense,fused,bbox,"
                    "prepad,padonly,padconcat")
    ap.add_argument("--out", default="logs/exp_k3_r5.jsonl")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from caffe_escoin_tpu.engine.context import ExecutionPolicy
    from caffe_escoin_tpu.kernels import xla_block_sparse as xbs
    from caffe_escoin_tpu.kernels import sconv_fused
    from caffe_escoin_tpu.sparse.weight_align import weight_align
    from caffe_escoin_tpu.utils.benchmark import device_time
    from caffe_escoin_tpu.utils.pruning import prune_conv_weight

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
        flush=True)

    SHAPES = {  # map -> (cin, cout) for the ResNet-50 k3 family
        56: (64, 64), 28: (128, 128), 14: (256, 256), 7: (512, 512)}
    todo = [int(s) for s in args.shapes.split(",") if s]
    arms = set(args.arms.split(","))
    policy = ExecutionPolicy(block_shape=(128, 128), spmm_tile_m=512,
                             compute_dtype=jnp.bfloat16, cast_back=False)
    rng = np.random.default_rng(0)
    outfh = open(args.out, "a")

    def emit(**kw):
        kw["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        outfh.write(json.dumps(kw) + "\n")
        outfh.flush()
        print(json.dumps(kw), flush=True)

    for hw in todo:
        cin, cout = SHAPES[hw]
        n = args.batch
        k, p = 3, 1
        xvars = [jnp.asarray(rng.standard_normal(
            (n, hw, hw, cin)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
            for _ in range(4)]
        wt = rng.standard_normal((k, k, cin, cout)).astype(np.float32) * .05
        wp = prune_conv_weight(wt, args.sparsity, (128, 128))
        aligned = weight_align(wp, None, policy=policy)
        wb = jnp.asarray(wp).astype(jnp.bfloat16)
        xsets = [(xv,) for xv in xvars]
        tag = f"{hw}x{hw} {cin}->{cout} k3 b{n}"

        # live offsets for the bbox arm
        block_row = np.asarray(jax.device_get(aligned.bsc.block_row))
        bcol_nnz = np.asarray(jax.device_get(aligned.bsc.bcol_nnz))
        n_cin_b = aligned.cin_pad // aligned.bsc.block_shape[0]
        live_off = sorted({int(block_row[j, s]) // n_cin_b
                           for j in range(block_row.shape[0])
                           for s in range(int(bcol_nnz[j]))})
        lo_rc = [(o // k, o % k) for o in live_off]
        nlive = int(bcol_nnz.sum())
        print(f"--- {tag}: live blocks={nlive} "
              f"live offsets={lo_rc}", flush=True)

        def timeit(name, fn, sets=None):
            try:
                t0 = time.time()
                t = device_time(fn, *(sets or xsets)[0],
                                iters=12, arg_sets=sets or xsets)
                emit(shape=tag, arm=name, us=round(t * 1e6, 2),
                     compile_s=round(time.time() - t0, 1), live=nlive,
                     offsets=str(lo_rc))
            except Exception as e:
                emit(shape=tag, arm=name, error=repr(e)[:200])

        if "unroll" in arms:
            timeit("unroll", lambda y: xbs.conv(
                y, aligned, stride=(1, 1), padding=(p, p)))
        if "gcols" in arms:
            timeit("gathered_cols", lambda y: xbs.conv_gathered_cols(
                y, aligned, stride=(1, 1), padding=(p, p)))
        if "dense" in arms:
            timeit("dense_bf16", lambda y: lax.conv_general_dilated(
                y, wb, (1, 1), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        if "fused" in arms and sconv_fused.supported(
                xvars[0], aligned, (p, p), policy):
            timeit("fused_pallas", lambda y: sconv_fused.sconv(
                y, aligned, padding=(p, p), relu=False, policy=policy))

        if "bbox" in arms and lo_rc:
            r0 = min(r for r, _ in lo_rc)
            r1 = max(r for r, _ in lo_rc)
            c0 = min(c for _, c in lo_rc)
            c1 = max(c for _, c in lo_rc)
            wcrop = wb[r0:r1 + 1, c0:c1 + 1]
            padt, padb = p - r0, r1 - p
            padl, padr = p - c0, c1 - p

            def bbox_conv(y):
                return lax.conv_general_dilated(
                    y, wcrop, (1, 1), [(padt, padb), (padl, padr)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            timeit(f"bbox{r1-r0+1}x{c1-c0+1}", bbox_conv)

        if "prepad" in arms:
            xpvars = [(jnp.pad(xv, ((0, 0), (p, p), (p, p), (0, 0))),)
                      for xv in xvars]
            timeit("prepad_unroll", lambda y: xbs.conv(
                y, aligned, stride=(1, 1), padding=(0, 0)), sets=xpvars)

        if "padonly" in arms:
            timeit("padonly", lambda y: jnp.pad(
                y, ((0, 0), (p, p), (p, p), (0, 0))))

        if "padconcat" in arms:
            # producer-side probe at this map size: a 1x1 conv with
            # cout=2*128 (two block-columns) whose epilogue concats —
            # does padding each column before the concat cost extra?
            cin2 = 256
            co_col = 128
            x2 = [jnp.asarray(rng.standard_normal(
                (n, hw, hw, cin2)).astype(np.float32) * .1).astype(
                    jnp.bfloat16) for _ in range(4)]
            w2 = [jnp.asarray(rng.standard_normal(
                (cin2, co_col)).astype(np.float32) * .05).astype(
                    jnp.bfloat16) for _ in range(2)]

            def prod_plain(y):
                cols = [jax.lax.dot_general(
                    y, w2[j], (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                    for j in range(2)]
                cols = [jnp.maximum(c, 0).astype(jnp.bfloat16)
                        for c in cols]
                return jnp.concatenate(cols, axis=-1)

            def prod_padded(y):
                cols = [jax.lax.dot_general(
                    y, w2[j], (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                    for j in range(2)]
                cols = [jnp.pad(jnp.maximum(c, 0).astype(jnp.bfloat16),
                                ((0, 0), (p, p), (p, p), (0, 0)))
                        for c in cols]
                return jnp.concatenate(cols, axis=-1)

            x2sets = [(xv,) for xv in x2]
            timeit("prod_concat_plain", prod_plain, sets=x2sets)
            timeit("prod_concat_padded", prod_padded, sets=x2sets)
            # single-column producer: pad after the (fused) cast
            w1 = w2[0]

            def prod1_plain(y):
                c = jax.lax.dot_general(
                    y, w1, (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return jnp.maximum(c, 0).astype(jnp.bfloat16)

            def prod1_padded(y):
                return jnp.pad(prod1_plain(y),
                               ((0, 0), (p, p), (p, p), (0, 0)))
            timeit("prod_single_plain", prod1_plain, sets=x2sets)
            timeit("prod_single_padded", prod1_padded, sets=x2sets)

    outfh.close()


if __name__ == "__main__":
    main()
