#!/bin/bash
# Round-5 queue E: halo tower re-capture (the tower chain crashed pre-fix
# in C), then a last headline session.
cd /root/repo || exit 1
L=logs/chip_r5e.log
for i in $(seq 1 1440); do
  grep -q "D ALL DONE" logs/chip_r5d.log 2>/dev/null && break
  sleep 10
done
echo "D done, starting E $(date +%T)" >> "$L"
echo "=== halo tower (re-run) $(date +%T)" >> "$L"
timeout 3600 python bench.py --halo --batch 16 >> "$L" 2>&1
echo "=== headline (repeat 3) $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --batch 32 --calibrate \
  --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
echo "E ALL DONE $(date +%T)" >> "$L"
echo "=== alexnet re-tune with polish $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --model alexnet --batch 32 --calibrate \
  --calibrate-polish 10 --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
echo "E2 ALL DONE $(date +%T)" >> "$L"
echo "=== no-pack A/B $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --batch 32 --calibrate --no-pack \
  --jsonl logs/r5_nopack.jsonl >> "$L" 2>&1
echo "E3 ALL DONE $(date +%T)" >> "$L"
