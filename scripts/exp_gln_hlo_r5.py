"""Dump the optimized HLO of the composed sparse GoogLeNet forward and
print the definitions of the hot ops found by exp_gln_profile_r5.py
(fusion.200 = 289us, reduce_window_max.93/.92, the unnamed fusion,
copy, fusion.9) so we know WHICH graph sites they are."""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "CESCOIN_AUTOTUNE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".autotune_tpu.json"))

HOT = sys.argv[1:] or ["fusion.200", "reduce_window_max.93",
                       "reduce_window_max.92", "fusion.9", "copy",
                       "fusion.12", "fusion.5", "fusion.30"]


def main():
    import jax
    from caffe_escoin_tpu.engine import autotune
    from exp_gln_profile_r5 import build_fn

    net_s, aligned, xvars = build_fn()
    with autotune.net_scope("googlenet"):
        fn = net_s.inference_fn(aligned)
        out = fn({"data": xvars[0]})
        jax.block_until_ready(out[net_s.specs[-1].tops[0]])
        # the jitted callable caches its executable; re-lower to text
        inner = getattr(fn, "_jitfn", fn)
        txt = None
        try:
            txt = inner.lower({"data": xvars[0]}).compile().as_text()
        except Exception as e:
            print("lower failed:", e)
            return
    with open("/tmp/gln_hlo.txt", "w") as fh:
        fh.write(txt)
    lines = txt.splitlines()
    # print computation bodies for hot fusions; for plain ops print the line
    for name in HOT:
        pat = re.compile(r"^\s*(ROOT\s+)?%?" + re.escape(name) + r"\s*=")
        for i, ln in enumerate(lines):
            if pat.match(ln):
                print("=" * 20, name)
                print(ln.strip()[:600])
                m = re.search(r"calls=%?([\w.\-]+)", ln)
                if m:
                    callee = m.group(1)
                    cpat = re.compile(r"^%?" + re.escape(callee) + r"\s")
                    for j, l2 in enumerate(lines):
                        if cpat.match(l2):
                            for k in range(j, min(j + 40, len(lines))):
                                print("   ", lines[k].strip()[:300])
                                if lines[k].strip() == "}":
                                    break
                            break
                break
    print("full HLO at /tmp/gln_hlo.txt, lines:", len(lines))


if __name__ == "__main__":
    main()
