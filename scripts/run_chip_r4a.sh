#!/bin/bash
# r4 capture, part A — the diagnostics VERDICT r3 flagged as missing plus
# the r3c captures that never ran. Runs from the .snap_r4a code snapshot so
# concurrent development in /root/repo cannot change later steps' behavior
# (the r3 lesson: each step launches fresh python from the script's cwd).
# Outputs land in the live repo.
set -u
cd /root/repo/.snap_r4a
R=/root/repo
J=$R/BENCH_SWEEP.jsonl
export CESCOIN_AUTOTUNE_CACHE=$R/.autotune_tpu.json
run() { echo "=== $(date +%T) $* ===" >&2; timeout 3600 "$@"; }

# 1. googlenet composition diagnostics (VERDICT r3 weak #1 / next #1):
#    forced-dense sparse arm isolates graph/dispatch overhead from arm
#    choice; --no-autotune isolates the measured-autotune picks from the
#    heuristic ones; the per-layer sweep gives per-shape ground truth.
run python bench.py --e2e --model googlenet --batch 16 --repeats 8 \
    --xbsp-arm dense --jsonl "$J"
run python bench.py --e2e --model googlenet --batch 16 --repeats 8 \
    --no-autotune --jsonl "$J"
run python bench.py --e2e --model googlenet --batch 16 --repeats 8 \
    --buckets --jsonl "$J"
run python bench.py --per-layer --model googlenet --sparsity 0.9 \
    --jsonl "$J"

# 2. resnet b8 regime diagnosis (VERDICT next #2): bucket split at b8
#    says whether the 1.55x regime is dispatch-bound or kernel-bound.
run python bench.py --e2e --batch 8 --repeats 16 --buckets --jsonl "$J"

# 3. batch curve (docs/SCALING.md cites it; rows were never captured)
run python bench.py --batch-curve --repeats 8 --jsonl "$J"

# 4. unstructured e2e recapture (r3c step 1; gate now precedes autotune)
run python bench.py --e2e --granularity unstructured --sparsity 0.9 \
    --batch 32 --repeats 8 --jsonl "$J"

# 5. AlexNet-scale train->prune->fine-tune->sparse experiment (the
#    reference's validation methodology, run.sh:3-20; LONG — ~1h budget)
run python examples/train_eval_sparse.py --model alexnet --platform tpu \
    --sparsities 0.9 --block 128,128 --iters 800 --finetune_iters 400 \
    --batch 64 --base_lr 0.01 --report "$R/docs/EXPERIMENTS_alexnet.md"

# 6. per-layer model sweeps for the remaining flagship models
run python bench.py --per-layer --model vgg16 --sparsity 0.9 --jsonl "$J"
run python bench.py --per-layer --model alexnet --sparsity 0.9 --jsonl "$J"

# 7. on-chip test lane
CESCOIN_TPU_TESTS=1 run python -m pytest tests -m tpu -q

echo "r4a done" >&2
