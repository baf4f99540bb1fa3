#!/bin/bash
# Full on-chip measurement suite (run when the single TPU chip is free).
# CRITICAL measurements first (e2e with the stride fix, the honest
# unstructured number, the FC bucket), sweep points after — so a truncated
# run still captures what the round needs. Appends per-layer rows to
# BENCH_SWEEP.jsonl; headline JSON lines accumulate there too.
set -u
cd "$(dirname "$0")/.."
J=BENCH_SWEEP.jsonl
run() { echo "=== $* ===" >&2; timeout 3000 "$@"; }

# 1. whole-net end-to-end with buckets (stride-fix validation)
run python bench.py --e2e --buckets --batch 8 --repeats 8 --jsonl $J | tee -a $J

# 2. the reference's true workload: unstructured element pruning
run python bench.py --granularity unstructured --sparsity 0.9 --layers 6 --jsonl $J | tee -a $J

# 3. sparse FC microbench (VGG-16 fc6/fc7 — the reference's fc bucket)
run python bench.py --fc --model vgg16 --batch 32 --sparsity 0.9 --jsonl $J | tee -a $J

# 4. more e2e models
run python bench.py --e2e --model alexnet --batch 16 --repeats 8 --jsonl $J | tee -a $J
run python bench.py --e2e --model vgg16  --batch 8 --repeats 6 --jsonl $J | tee -a $J

# 5. on-chip kernel test lane
CESCOIN_TPU_TESTS=1 run python -m pytest tests -m tpu -q

# 6. sweep (the 90% headline row is already captured)
for s in 0.7 0.8 0.95; do run python bench.py --sparsity $s --jsonl $J | tee -a $J; done
for s in 0.7 0.9; do run python bench.py --model alexnet --sparsity $s --jsonl $J | tee -a $J; done
run python bench.py --model googlenet --sparsity 0.9 --jsonl $J | tee -a $J
run python bench.py --model vgg16     --sparsity 0.9 --jsonl $J | tee -a $J
echo "suite done" >&2
