"""Round-5 experiment: W-pair packed layout on the C=64 towers (chip A/B).

Measures the packed reparametrizations (ops/wpack.py) against the current
unpacked executors on the ResNet-50 stage-1 shapes at b32 — the family
measured at its C=64 physical-lane-padding bound in exp_k3_r5:

  k3_unpacked      current XBSP unroll (76us baseline)
  k3_packed_conv   packed-domain conv, kernel cropped to live packed taps
  k3_packed_xbsp   packed-domain XBSP unroll on the packed aligned weight
  entry_unpacked   1x1 256->64 dense bf16 conv (the tower entry)
  entry_packed     (1,2)-kernel stride-(1,2) conv emitting packed output
  exit_unpacked    1x1 64->256 dense bf16 conv (the tower exit)
  exit_packed      lhs-dilated conv consuming packed input
  tower_unpacked   composed entry -> k3(sparse) -> exit, one jit
  tower_packed     composed packed entry -> packed k3 -> packed exit
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
    ap.add_argument("--hw", type=int, default=56)
    ap.add_argument("--cin", type=int, default=64)
    ap.add_argument("--big", type=int, default=256,
                    help="entry/exit wide channel count")
    ap.add_argument("--out", default="logs/exp_wpack_r5.jsonl")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    from caffe_escoin_tpu.engine.context import ExecutionPolicy
    from caffe_escoin_tpu.kernels import xla_block_sparse as xbs
    from caffe_escoin_tpu.ops import wpack
    from caffe_escoin_tpu.sparse.weight_align import weight_align
    from caffe_escoin_tpu.utils.benchmark import device_time
    from caffe_escoin_tpu.utils.pruning import prune_conv_weight

    print(f"backend={jax.default_backend()}", flush=True)
    n, hw, c, big = args.batch, args.hw, args.cin, args.big
    r = wpack.pack_factor(c, hw)
    assert r > 1, "nothing to pack"
    policy = ExecutionPolicy(block_shape=(128, 128), spmm_tile_m=512,
                             compute_dtype=jnp.bfloat16, cast_back=False)
    rng = np.random.default_rng(0)
    outfh = open(args.out, "a")

    def emit(**kw):
        kw["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        outfh.write(json.dumps(kw) + "\n")
        outfh.flush()
        print(json.dumps(kw), flush=True)

    def timeit(name, fn, sets, check=None):
        try:
            t0 = time.time()
            t = device_time(fn, *sets[0], iters=12, arg_sets=sets)
            row = dict(shape=f"{hw}x{hw} c{c} r{r} b{n}", arm=name,
                       us=round(t * 1e6, 2),
                       compile_s=round(time.time() - t0, 1))
            if check is not None:
                row["max_err"] = float(check)
            emit(**row)
        except Exception as e:
            emit(shape=f"{hw}x{hw} c{c} r{r} b{n}", arm=name,
                 error=repr(e)[:300])

    # --- tensors ---
    xbig = [jnp.asarray(rng.standard_normal((n, hw, hw, big)).astype(
        np.float32) * .1).astype(jnp.bfloat16) for _ in range(4)]
    xsm = [jnp.asarray(rng.standard_normal((n, hw, hw, c)).astype(
        np.float32) * .1).astype(jnp.bfloat16) for _ in range(4)]
    xsm_p = [jnp.asarray(wpack.pack_nhwc(np.asarray(v), r)) for v in xsm]

    w_entry = rng.standard_normal((1, 1, big, c)).astype(np.float32) * .05
    w_k3 = prune_conv_weight(
        rng.standard_normal((3, 3, c, c)).astype(np.float32) * .05,
        args.sparsity, (128, 128))
    w_exit = rng.standard_normal((1, 1, c, big)).astype(np.float32) * .05

    aligned = weight_align(w_k3, None, policy=policy)
    wk3_b = jnp.asarray(w_k3).astype(jnp.bfloat16)

    # --- packed weights ---
    wp_k3, (pl3, _) = wpack.packed_weight(w_k3, r, 1)
    pr3 = wpack.packed_pad_right(hw, 3, 1, r)
    # crop to live packed taps (rows of the (kh, kw_p) tap grid with any
    # nonzero) — the packed-domain bbox
    tap_nz = (np.abs(wp_k3).sum(axis=(2, 3)) > 0)
    rs = np.where(tap_nz.any(axis=1))[0]
    cs = np.where(tap_nz.any(axis=0))[0]
    r0, r1, c0, c1 = rs.min(), rs.max(), cs.min(), cs.max()
    wp_k3_crop = wp_k3[r0:r1 + 1, c0:c1 + 1]
    cpl_h, cpr_h = 1 - r0, r1 - 1
    cpl_w, cpr_w = pl3 - c0, c1 - (wp_k3.shape[1] - 1) + pr3
    wp_k3_b = jnp.asarray(wp_k3_crop).astype(jnp.bfloat16)
    print(f"packed k3: kw_p={wp_k3.shape[1]} live taps "
          f"rows {r0}-{r1} cols {c0}-{c1}", flush=True)

    we_p, (epl, _), esw = wpack.entry_weight(w_entry, r, 1, 0)
    epr = wpack.entry_pad_right(hw, 1, 1, 0, r)
    we_p_b = jnp.asarray(we_p).astype(jnp.bfloat16)
    we_b = jnp.asarray(w_entry).astype(jnp.bfloat16)

    wx_p, (xpl, _), xdil = wpack.exit_weight(w_exit, r, 0)
    xpr = wpack.exit_pad_right(hw // r, 1, 0, r)
    wx_p_b = jnp.asarray(wx_p).astype(jnp.bfloat16)
    wx_b = jnp.asarray(w_exit).astype(jnp.bfloat16)

    dn = ("NHWC", "HWIO", "NHWC")

    # --- correctness spot checks (device, bf16 tolerance) ---
    def maxerr(a, b):
        return float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                     - b.astype(jnp.float32))))

    k3_ref = lax.conv_general_dilated(xsm[0], wk3_b, (1, 1),
                                      [(1, 1), (1, 1)], dimension_numbers=dn)
    k3_pk = lax.conv_general_dilated(xsm_p[0], wp_k3_b, (1, 1),
                                     [(cpl_h, cpr_h), (cpl_w, cpr_w)],
                                     dimension_numbers=dn)
    err_k3 = maxerr(k3_ref, jnp.reshape(k3_pk, k3_ref.shape))

    en_ref = lax.conv_general_dilated(xbig[0], we_b, (1, 1),
                                      [(0, 0), (0, 0)], dimension_numbers=dn)
    en_pk = lax.conv_general_dilated(xbig[0], we_p_b, (1, esw),
                                     [(0, 0), (epl, epr)],
                                     dimension_numbers=dn)
    err_en = maxerr(en_ref, jnp.reshape(en_pk, en_ref.shape))

    ex_ref = lax.conv_general_dilated(xsm[0], wx_b, (1, 1),
                                      [(0, 0), (0, 0)], dimension_numbers=dn)
    ex_pk = lax.conv_general_dilated(xsm_p[0], wx_p_b, (1, 1),
                                     [(0, 0), (xpl, xpr)],
                                     lhs_dilation=(1, xdil),
                                     dimension_numbers=dn)
    err_ex = maxerr(ex_ref, ex_pk)
    print(f"max errs: k3={err_k3:.4g} entry={err_en:.4g} exit={err_ex:.4g}",
          flush=True)

    # --- arms ---
    s_sm = [(v,) for v in xsm]
    s_smp = [(v,) for v in xsm_p]
    s_big = [(v,) for v in xbig]

    timeit("k3_unpacked", lambda y: xbs.conv(
        y, aligned, stride=(1, 1), padding=(1, 1)), s_sm, err_k3)
    timeit("k3_packed_conv", lambda y: lax.conv_general_dilated(
        y, wp_k3_b, (1, 1), [(cpl_h, cpr_h), (cpl_w, cpr_w)],
        dimension_numbers=dn), s_smp, err_k3)

    # XBSP on the UNCROPPED packed weight (symmetric padding by
    # construction): the packed-domain twin of the current default arm
    aligned_p = weight_align(wp_k3, None, policy=policy)
    if pl3 == pr3:
        timeit("k3_packed_xbsp", lambda y: xbs.conv(
            y, aligned_p, stride=(1, 1), padding=(1, pl3)), s_smp)
    else:
        emit(shape=f"{hw}x{hw} c{c} r{r} b{n}", arm="k3_packed_xbsp",
             skipped="asymmetric packed padding")

    timeit("entry_unpacked", lambda y: lax.conv_general_dilated(
        y, we_b, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn), s_big,
        err_en)
    timeit("entry_packed", lambda y: lax.conv_general_dilated(
        y, we_p_b, (1, esw), [(0, 0), (epl, epr)], dimension_numbers=dn),
        s_big)
    timeit("exit_unpacked", lambda y: lax.conv_general_dilated(
        y, wx_b, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn), s_sm,
        err_ex)
    timeit("exit_packed", lambda y: lax.conv_general_dilated(
        y, wx_p_b, (1, 1), [(0, 0), (xpl, xpr)], lhs_dilation=(1, xdil),
        dimension_numbers=dn), s_smp)

    # --- composed tower ---
    def tower_unpacked(y):
        a = lax.conv_general_dilated(y, we_b, (1, 1), [(0, 0), (0, 0)],
                                     dimension_numbers=dn)
        a = jnp.maximum(a, 0)
        b = xbs.conv(a, aligned, stride=(1, 1), padding=(1, 1), relu=True)
        o = lax.conv_general_dilated(b, wx_b, (1, 1), [(0, 0), (0, 0)],
                                     dimension_numbers=dn)
        return jnp.maximum(o + y, 0)

    def tower_packed(y):
        a = lax.conv_general_dilated(y, we_p_b, (1, esw),
                                     [(0, 0), (epl, epr)],
                                     dimension_numbers=dn)
        a = jnp.maximum(a, 0)
        b = lax.conv_general_dilated(a, wp_k3_b, (1, 1),
                                     [(cpl_h, cpr_h), (cpl_w, cpr_w)],
                                     dimension_numbers=dn)
        b = jnp.maximum(b, 0)
        o = lax.conv_general_dilated(b, wx_p_b, (1, 1), [(0, 0), (xpl, xpr)],
                                     lhs_dilation=(1, xdil),
                                     dimension_numbers=dn)
        return jnp.maximum(o + y, 0)

    tw_err = maxerr(tower_unpacked(xbig[0]), tower_packed(xbig[0]))
    print(f"tower max err: {tw_err:.4g}", flush=True)
    timeit("tower_unpacked", tower_unpacked, s_big, tw_err)
    timeit("tower_packed", tower_packed, s_big)

    outfh.close()


if __name__ == "__main__":
    main()
