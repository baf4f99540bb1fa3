#!/bin/bash
# r4 capture, part B — graph-level calibration captures + halo overhead.
# Launched with a waiter on the r4a pid; runs from the .snap_r4b snapshot.
set -u
cd /root/repo/.snap_r4b
R=/root/repo
J=$R/BENCH_SWEEP.jsonl
export CESCOIN_AUTOTUNE_CACHE=$R/.autotune_tpu.json
run() { echo "=== $(date +%T) $* ===" >&2; timeout 5400 "$@"; }

# 1. THE fix capture: googlenet e2e with graph-level calibration
#    (VERDICT r4 task #1; target >=1.2x vs bf16, stretch >=2x vs f32)
run python bench.py --e2e --model googlenet --batch 16 --repeats 8 \
    --calibrate --buckets --jsonl "$J"

# 2. e2e guard on the headline: resnet50 b32 calibrated (VERDICT task #6 —
#    calibration must not regress a healthy assignment)
run python bench.py --e2e --batch 32 --repeats 8 --calibrate --buckets \
    --jsonl "$J"

# 3. b8 calibrated (the small-batch regime may want different arms; the
#    autotune key includes the batch dimension)
run python bench.py --e2e --batch 8 --repeats 16 --calibrate --jsonl "$J"

# 4. single-chip halo overhead (VERDICT task #5)
run python bench.py --halo --jsonl "$R/SCALING.jsonl"

# 5. vgg16 + alexnet e2e with calibration (regression guard at graph scope)
run python bench.py --e2e --model vgg16 --batch 16 --repeats 8 \
    --calibrate --jsonl "$J"
run python bench.py --e2e --model alexnet --batch 32 --repeats 8 \
    --calibrate --jsonl "$J"

echo "r4b done" >&2
