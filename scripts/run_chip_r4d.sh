#!/bin/bash
# r4 capture, part D — priority-ordered calibrated headlines on the final
# kernels. The autotune cache is pre-seeded from the r3 table (the final
# kernels are behaviorally identical to r3's — the pad-free experiment is
# default-off), so each step goes straight to graph calibration instead
# of an hour of fresh arm compiles. Per-layer re-sweeps are dropped: the
# r3 rows plus today's padded-variant A/B rows ARE the current kernels'
# numbers.
set -u
cd /root/repo
J=BENCH_SWEEP.jsonl
export CESCOIN_AUTOTUNE_CACHE=/root/repo/.autotune_tpu.json
run() { echo "=== $(date +%T) $* ===" >&2; timeout 5400 "$@"; }

# 1. THE headline: resnet50 b32 calibrated
run python bench.py --e2e --batch 32 --repeats 8 --calibrate --buckets \
    --jsonl $J

# 2. googlenet calibrated on the final kernels (r4b's 1.125x row was on
#    the snapshot; this is the shipping number)
run python bench.py --e2e --model googlenet --batch 16 --repeats 8 \
    --calibrate --buckets --jsonl $J

# 3. b8 calibrated (the latency regime)
run python bench.py --e2e --batch 8 --repeats 16 --calibrate --buckets \
    --jsonl $J

# 4. AlexNet-scale train->prune->fine-tune->sparse experiment (the
#    accuracy story — VERDICT missing #1; nothing else covers it)
run python examples/train_eval_sparse.py --model alexnet --platform tpu \
    --sparsities 0.9 --block 128,128 --iters 800 --finetune_iters 400 \
    --batch 64 --base_lr 0.01 --report docs/EXPERIMENTS_alexnet.md

# 5. vgg16 + alexnet e2e calibrated
run python bench.py --e2e --model vgg16 --batch 16 --repeats 8 \
    --calibrate --jsonl $J
run python bench.py --e2e --model alexnet --batch 32 --repeats 8 \
    --calibrate --jsonl $J

# 6. the no-flag driver shape (warm calibrated cache)
run python bench.py

# 7. on-chip test lane
CESCOIN_TPU_TESTS=1 run python -m pytest tests -m tpu -q

# 8. if time remains: b64 calibrated (batch-curve regression)
run python bench.py --e2e --batch 64 --repeats 8 --calibrate --jsonl $J

echo "r4d done" >&2
