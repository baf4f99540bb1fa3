#!/bin/bash
# Round-5 chip queue C (replaces the double-launched B): cache-hypothesis
# A/B first, then args-mode A/B, googlenet retry, halo tower capture,
# AlexNet AGP experiment. One instance only.
cd /root/repo || exit 1
L=logs/chip_r5c.log
echo "start $(date +%T)" >> "$L"

echo "=== X: constants-mode, FRESH compile cache $(date +%T)" >> "$L"
CESCOIN_COMPILE_CACHE=/root/.cache/cescoin_xla_fresh1 \
  timeout 4200 python bench.py --e2e --batch 32 --calibrate \
  --jsonl logs/r5_cachetest.jsonl >> "$L" 2>&1

echo "=== Z1: args-mode, shared cache (first=fresh compile) $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --batch 32 --calibrate \
  --weights-as-args --jsonl logs/r5_cachetest.jsonl >> "$L" 2>&1

echo "=== Z2: args-mode, shared cache (second=cache hit) $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --batch 32 --calibrate \
  --weights-as-args --jsonl logs/r5_cachetest.jsonl >> "$L" 2>&1

echo "=== googlenet retry $(date +%T)" >> "$L"
timeout 5400 python bench.py --e2e --model googlenet --batch 16 \
  --calibrate --calibrate-polish 8 --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1 \
  || timeout 5400 python bench.py --e2e --model googlenet --batch 16 \
  --calibrate --calibrate-polish 8 --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1

echo "=== halo tower $(date +%T)" >> "$L"
timeout 3600 python bench.py --halo --batch 16 >> "$L" 2>&1

echo "=== alexnet gradual (AGP) experiment $(date +%T)" >> "$L"
timeout 10800 python examples/train_eval_sparse.py --model alexnet \
  --platform tpu --sparsities 0.9 --block 128,128 --iters 1200 \
  --finetune_iters 500 --gradual_iters 800 --batch 64 --base_lr 0.01 \
  --filler xavier --modes gradual \
  --report docs/EXPERIMENTS_alexnet_gradual.md >> "$L" 2>&1

echo "C ALL DONE $(date +%T)" >> "$L"
