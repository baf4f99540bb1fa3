#!/bin/bash
# r5h captures: (1) googlenet e2e with the s2d stem fold, calibrated+polish;
# (2) resnet50 b32 e2e on the gather-free packed pool; (3) resnet50 b8
# (the fixed-cost-dominated regime the pool fix should help most).
cd /root/repo
L=logs/r5h.log
echo "=== r5h start $(date +%T)" >> "$L"
echo "=== googlenet s2d e2e $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --model googlenet --batch 16 --calibrate \
  --calibrate-polish 10 --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
echo "=== resnet50 b32 e2e (packed-pool fix) $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --model resnet50 --batch 32 --calibrate \
  --calibrate-polish 10 --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
echo "=== resnet50 b8 e2e $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --model resnet50 --batch 8 --calibrate \
  --calibrate-polish 8 --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
echo "R5H ALL DONE $(date +%T)" >> "$L"
echo "=== googlenet s2d NO-PACK A/B $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --model googlenet --batch 16 --no-pack \
  --calibrate --calibrate-polish 8 --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
echo "R5H2 ALL DONE $(date +%T)" >> "$L"
echo "=== vgg16 b16 e2e (packed-pool fast path) $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --model vgg16 --batch 16 --calibrate \
  --calibrate-polish 8 --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
echo "R5H3 ALL DONE $(date +%T)" >> "$L"
echo "=== resnet50 b64 e2e $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --model resnet50 --batch 64 --calibrate \
  --calibrate-polish 8 --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
echo "R5H4 ALL DONE $(date +%T)" >> "$L"
echo "=== alexnet b32 e2e (era recapture) $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --model alexnet --batch 32 --calibrate \
  --calibrate-polish 8 --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
echo "R5H5 ALL DONE $(date +%T)" >> "$L"
