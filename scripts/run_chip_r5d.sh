#!/bin/bash
# Round-5 queue D: after C — op-profile diagnosis, final headline captures
# with buckets + repeat, b8 bucket diagnosis.
cd /root/repo || exit 1
L=logs/chip_r5d.log
for i in $(seq 1 1440); do
  grep -q "C ALL DONE" logs/chip_r5c.log 2>/dev/null && break
  sleep 10
done
echo "C done, starting D $(date +%T)" >> "$L"

echo "=== op profile $(date +%T)" >> "$L"
timeout 2400 python scripts/exp_opprofile_r5.py >> "$L" 2>&1

echo "=== headline + buckets (repeat 1) $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --batch 32 --calibrate --buckets \
  --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1

echo "=== headline (repeat 2) $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --batch 32 --calibrate \
  --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1

echo "=== googlenet repeat $(date +%T)" >> "$L"
timeout 4200 python bench.py --e2e --model googlenet --batch 16 \
  --calibrate --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1

echo "D ALL DONE $(date +%T)" >> "$L"
