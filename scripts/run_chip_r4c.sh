#!/bin/bash
# r4 capture, part C (relaunch) — fresh autotune + calibrated headlines on
# the FINAL kernel set (padded-slab default restored after the A/B; the
# variant A/B rows are already captured). Runs from the LIVE repo — no
# compute-path edits while this runs.
set -u
cd /root/repo
J=BENCH_SWEEP.jsonl
export CESCOIN_AUTOTUNE_CACHE=/root/repo/.autotune_tpu.json
run() { echo "=== $(date +%T) $* ===" >&2; timeout 5400 "$@"; }

# 1. Per-layer sweep with fresh autotune (cache was cleared; winners land
#    in .autotune_tpu.json stamped with the current kernel fingerprint)
run python bench.py --per-layer --sparsity 0.9 --repeats 8 --jsonl $J

# 2. Calibrated headlines (the round's record numbers)
run python bench.py --e2e --batch 32 --repeats 8 --calibrate --buckets \
    --jsonl $J
run python bench.py --e2e --batch 8 --repeats 16 --calibrate --buckets \
    --jsonl $J
run python bench.py --e2e --batch 64 --repeats 8 --calibrate --jsonl $J
run python bench.py --e2e --model googlenet --batch 16 --repeats 8 \
    --calibrate --buckets --jsonl $J
run python bench.py --e2e --model vgg16 --batch 16 --repeats 8 \
    --calibrate --jsonl $J
run python bench.py --e2e --model alexnet --batch 32 --repeats 8 \
    --calibrate --jsonl $J

# 3. The no-flag driver shape (warm calibrated cache; should reproduce
#    the b32 number)
run python bench.py

# 4. model per-layer sweeps for the doc tables
run python bench.py --per-layer --model vgg16 --sparsity 0.9 --repeats 8 \
    --jsonl $J
run python bench.py --per-layer --model googlenet --sparsity 0.9 \
    --repeats 8 --jsonl $J
run python bench.py --per-layer --model alexnet --sparsity 0.9 \
    --repeats 8 --jsonl $J

# 5. AlexNet-scale train->prune->fine-tune->sparse experiment
run python examples/train_eval_sparse.py --model alexnet --platform tpu \
    --sparsities 0.9 --block 128,128 --iters 800 --finetune_iters 400 \
    --batch 64 --base_lr 0.01 --report docs/EXPERIMENTS_alexnet.md

# 6. On-chip test lane
CESCOIN_TPU_TESTS=1 run python -m pytest tests -m tpu -q

echo "r4c done" >&2
