#!/bin/bash
# r5i: BASELINE sparsity curve (70/80/95) + batch curve on the r5h code
# level (gather-free packed pool; 90% captured at 2.346x).
cd /root/repo
L=logs/r5i.log
echo "=== r5i start $(date +%T)" >> "$L"
for S in 0.7 0.8 0.95; do
  echo "=== resnet50 b32 sparsity $S $(date +%T)" >> "$L"
  timeout 4200 python bench.py --e2e --model resnet50 --batch 32 \
    --sparsity $S --calibrate --calibrate-polish 6 \
    --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
done
echo "=== batch curve $(date +%T)" >> "$L"
timeout 4200 python bench.py --batch-curve --model resnet50 \
  --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
echo "R5I ALL DONE $(date +%T)" >> "$L"
echo "=== halo overhead (one-entry chain) $(date +%T)" >> "$L"
timeout 4200 python bench.py --halo --jsonl SCALING.jsonl >> "$L" 2>&1
echo "R5I2 ALL DONE $(date +%T)" >> "$L"
