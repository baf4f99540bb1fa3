#!/bin/bash
cd /root/repo || exit 1
L=logs/chip_r5g.log
echo "start $(date +%T)" >> "$L"
echo "=== gradual block-95 $(date +%T)" >> "$L"
timeout 7200 python examples/train_eval_sparse.py --model alexnet \
  --platform tpu --sparsities 0.95 --block 128,128 --iters 1200 \
  --finetune_iters 500 --gradual_iters 800 --batch 64 --base_lr 0.01 \
  --filler xavier --modes gradual \
  --report docs/EXPERIMENTS_alexnet_gradual95.md >> "$L" 2>&1
echo "=== b8 buckets $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --batch 8 --calibrate \
  --calibrate-polish 8 --buckets --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
echo "=== headline lottery $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --batch 32 --calibrate \
  --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
echo "G ALL DONE $(date +%T)" >> "$L"
