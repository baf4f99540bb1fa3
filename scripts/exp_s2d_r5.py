"""A/B the space-to-depth stem-conv reformulation (ops/s2d.py) against
the stock strided conv on the chip, for the three flagship stems:

  googlenet conv1/7x7_s2  b16 224x224x3 -> 112x112x64   (289us composed)
  resnet50  conv1 7x7/s2  b32
  alexnet   conv1 11x11/s4 b32 227x227x3 -> 55x55x96

Each variant runs input-cast + conv + bias + relu inside one jit (the
deployment shape of the fused stem).  Exactness asserted, JSONL out."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from caffe_escoin_tpu.ops import s2d
from caffe_escoin_tpu.ops.conv import conv2d_dense
from caffe_escoin_tpu.utils.benchmark import device_time

CASES = [
    ("gln_conv1_b16", (16, 224, 224, 3), 64, 7, 2, 3),
    ("rn50_conv1_b32", (32, 224, 224, 3), 64, 7, 2, 3),
    ("alexnet_conv1_b32", (32, 227, 227, 3), 96, 11, 4, 0),
]


def main():
    rng = np.random.default_rng(0)
    for tag, ishape, cout, k, r, p in CASES:
        w = rng.standard_normal((k, k, ishape[-1], cout)).astype(np.float32)
        b = rng.standard_normal((cout,)).astype(np.float32) * 0.1
        wp = s2d.s2d_weight(w, r, (p, p))
        wj = jnp.asarray(w, jnp.bfloat16)
        wpj = jnp.asarray(wp, jnp.bfloat16)
        bj = jnp.asarray(b, jnp.bfloat16)
        xs = [jnp.asarray(rng.standard_normal(ishape).astype(np.float32))
              for _ in range(4)]

        def stock(x):
            return conv2d_dense(x.astype(jnp.bfloat16), wj, bj,
                                stride=(r, r), padding=(p, p), relu=True)

        def s2dv(x):
            xp = s2d.s2d_input(x.astype(jnp.bfloat16), r, (k, k), (p, p))
            return conv2d_dense(xp, wpj, bj, stride=(1, 1), padding=(0, 0),
                                relu=True)

        y0 = np.asarray(jax.jit(stock)(xs[0]), np.float32)
        y1 = np.asarray(jax.jit(s2dv)(xs[0]), np.float32)
        err = float(np.max(np.abs(y0 - y1)) / (np.max(np.abs(y0)) + 1e-9))
        t0 = device_time(stock, xs[0], iters=20,
                         arg_sets=[(a,) for a in xs])
        t1 = device_time(s2dv, xs[0], iters=20,
                         arg_sets=[(a,) for a in xs])
        print(json.dumps({
            "kind": "s2d_ab", "tag": tag, "k": k, "s": r, "p": p,
            "t_stock_us": round(t0 * 1e6, 2),
            "t_s2d_us": round(t1 * 1e6, 2),
            "speedup": round(t0 / t1, 3), "rel_err": round(err, 6)}),
            flush=True)


if __name__ == "__main__":
    main()
