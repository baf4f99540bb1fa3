#!/bin/bash
# Full on-chip measurement suite (run when the single TPU chip is free).
# CRITICAL measurements first (fused+autotuned e2e, the honest unstructured
# number, the FC bucket), sweep points after — so a truncated run still
# captures what the round needs. Every bench.py mode appends BOTH its
# per-layer rows and its headline row to the --jsonl file itself (r2 had a
# `| tee -a $J` here that double-appended the e2e headline — removed).
set -u
cd "$(dirname "$0")/.."
J=BENCH_SWEEP.jsonl
export CESCOIN_AUTOTUNE_CACHE=.autotune_tpu.json
run() { echo "=== $* ===" >&2; timeout 3600 "$@"; }

# 1. whole-net end-to-end with buckets (fusion + autotune: the headline);
#    batch 32 matches the reference's ResNet-50 test prototxt batch
#    (models/resnet/test_sconv.prototxt:40) and is where throughput peaks
run python bench.py --e2e --buckets --batch 32 --repeats 8 --jsonl $J
run python bench.py --e2e --batch 8 --repeats 8 --jsonl $J

# 2. the reference's true workload: unstructured element pruning
run python bench.py --granularity unstructured --sparsity 0.9 --layers 6 --jsonl $J

# 3. sparse FC microbench (VGG-16 fc6/fc7 — the reference's fc bucket)
run python bench.py --fc --model vgg16 --batch 32 --sparsity 0.9 --jsonl $J

# 4. more e2e models
run python bench.py --e2e --model alexnet --batch 16 --repeats 8 --jsonl $J
run python bench.py --e2e --model googlenet --batch 16 --repeats 8 --jsonl $J
run python bench.py --e2e --model vgg16 --batch 8 --repeats 6 --jsonl $J

# 5. on-chip kernel test lane
CESCOIN_TPU_TESTS=1 run python -m pytest tests -m tpu -q

# 6. sweep
for s in 0.9 0.7 0.8 0.95; do run python bench.py --sparsity $s --jsonl $J; done
for s in 0.7 0.9; do run python bench.py --model alexnet --sparsity $s --jsonl $J; done
run python bench.py --model googlenet --sparsity 0.9 --jsonl $J
run python bench.py --model vgg16     --sparsity 0.9 --jsonl $J

# 7. single-chip saturation curve (docs/SCALING.md evidence)
run python bench.py --batch-curve --repeats 8 --jsonl $J
echo "suite done" >&2
