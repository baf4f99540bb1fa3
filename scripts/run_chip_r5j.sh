#!/bin/bash
# r5j: googlenet headline repeat (second measurement point for the
# best-of-N range reporting).
cd /root/repo
L=logs/r5j.log
timeout 3600 python bench.py --e2e --model googlenet --batch 16 --calibrate \
  --calibrate-polish 6 --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
echo "R5J DONE $(date +%T)" >> "$L"
