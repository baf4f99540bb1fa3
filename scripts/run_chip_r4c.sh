#!/bin/bash
# r4 capture, part C — pad-free unroll A/B + fresh autotune + calibrated
# headlines on the NEW kernels. Launched with a waiter on the r4b pid;
# runs from the LIVE repo (this is the final-code measurement pass — do
# not edit compute-path code while it runs).
set -u
cd /root/repo
J=BENCH_SWEEP.jsonl
run() { echo "=== $(date +%T) $* ===" >&2; timeout 5400 "$@"; }

# 1. On-chip A/B of the pad-free unroll (forced arm, scratch cache so the
#    committed table is untouched): padded-variant rows carry
#    variant=padded; the same shapes with the new default follow.
export CESCOIN_AUTOTUNE_CACHE=/tmp/autotune_r4c_ab.json
rm -f /tmp/autotune_r4c_ab.json
CESCOIN_XBSP_PADDED=1 run python bench.py --per-layer --sparsity 0.9 \
    --xbsp-arm unroll --repeats 8 --jsonl $J
run python bench.py --per-layer --sparsity 0.9 \
    --xbsp-arm unroll --repeats 8 --jsonl $J

# 2. Fresh autotune on the new kernels: the committed cache's winners were
#    measured against the padded form — retire it and re-measure.
python - <<'EOF'
import json
path = ".autotune_tpu.json"
try:
    old = json.load(open(path))
    json.dump(old, open(".autotune_tpu_r3_padded.json.bak", "w"))
except Exception:
    old = {}
json.dump({}, open(path, "w"))
print(f"cleared {len(old)} cached arms (backup kept)")
EOF
export CESCOIN_AUTOTUNE_CACHE=/root/repo/.autotune_tpu.json

# 3. Per-layer sweep with fresh autotune (new kernel set) — the doc table
run python bench.py --per-layer --sparsity 0.9 --repeats 8 --jsonl $J

# 4. Calibrated headlines on the new kernels (the round's record numbers)
run python bench.py --e2e --batch 32 --repeats 8 --calibrate --buckets \
    --jsonl $J
run python bench.py --e2e --batch 8 --repeats 16 --calibrate --buckets \
    --jsonl $J
# b64 showed a throughput REGRESSION on the batch curve (24.0k img/s vs
# 30.3k at b32) — calibrate the b64 assignment too
run python bench.py --e2e --batch 64 --repeats 8 --calibrate --jsonl $J
run python bench.py --e2e --model googlenet --batch 16 --repeats 8 \
    --calibrate --buckets --jsonl $J
run python bench.py --e2e --model vgg16 --batch 16 --repeats 8 \
    --calibrate --jsonl $J
run python bench.py --e2e --model alexnet --batch 32 --repeats 8 \
    --calibrate --jsonl $J

# 5. The no-flag driver shape (warm cache; should reproduce step 4's b32)
run python bench.py

# 5b. model per-layer sweeps on the final kernels (r4a's vgg sweep hung
#     mid-run on a stuck remote compile; all doc tables should reflect
#     the shipping kernel set)
run python bench.py --per-layer --model vgg16 --sparsity 0.9 --repeats 8 \
    --jsonl $J
run python bench.py --per-layer --model googlenet --sparsity 0.9 \
    --repeats 8 --jsonl $J
run python bench.py --per-layer --model alexnet --sparsity 0.9 \
    --repeats 8 --jsonl $J

# 6. AlexNet-scale train->prune->fine-tune->sparse experiment (r4a's run
#    died on --platform tpu under the axon relay; force_platform fixes it)
run python examples/train_eval_sparse.py --model alexnet --platform tpu \
    --sparsities 0.9 --block 128,128 --iters 800 --finetune_iters 400 \
    --batch 64 --base_lr 0.01 --report docs/EXPERIMENTS_alexnet.md

# 7. On-chip test lane on the new kernels
CESCOIN_TPU_TESTS=1 run python -m pytest tests -m tpu -q

echo "r4c done" >&2
