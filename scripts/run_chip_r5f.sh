#!/bin/bash
cd /root/repo || exit 1
L=logs/chip_r5f.log
echo "start $(date +%T)" >> "$L"
echo "=== resnet50 aggressive polish $(date +%T)" >> "$L"
timeout 5400 python bench.py --e2e --batch 32 --calibrate \
  --calibrate-polish 16 --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
echo "=== vgg16 polish $(date +%T)" >> "$L"
timeout 5400 python bench.py --e2e --model vgg16 --batch 16 --calibrate \
  --calibrate-polish 8 --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
echo "F ALL DONE $(date +%T)" >> "$L"
