#!/bin/bash
# Round-5 capture suite A: headline repeats + all-net e2e + the calibrated
# sparsity curve + batch regimes. Serialized on the single chip; every row
# appends to BENCH_SWEEP.jsonl. Safe to re-run: autotune arms and XLA
# executables cache incrementally.
cd /root/repo || exit 1
L=logs/chip_r5a.log
run() {
  echo "=== $(date +%T) bench $*" >> "$L"
  timeout 5400 python bench.py "$@" --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1
  echo "=== exit $? $(date +%T)" >> "$L"
}

# headline repeat (error bar for the 2.26x row)
run --e2e --batch 32 --calibrate
# the other flagship nets, calibrated, packed
run --e2e --model googlenet --batch 16 --calibrate --calibrate-polish 8
run --e2e --model vgg16 --batch 16 --calibrate
run --e2e --model alexnet --batch 32 --calibrate
# BASELINE's own metric line: deployment-config e2e sparsity curve
run --e2e --batch 32 --sparsity 0.7 --calibrate
run --e2e --batch 32 --sparsity 0.8 --calibrate
run --e2e --batch 32 --sparsity 0.95 --calibrate
# batch regimes (b8 small-batch, b64 regression diagnosis)
run --e2e --batch 8 --calibrate
run --e2e --batch 64 --calibrate --calibrate-polish 6
# throughput curve with packing
run --batch-curve
echo "ALL DONE $(date +%T)" >> "$L"
