#!/bin/bash
# r3 cold-methodology recapture, part 2 (after bench.py's no-flag default
# became the e2e headline): per-layer sweeps now pass --per-layer
# explicitly, and the fc bucket step (missing from part 1) is restored.
# Priority order: anything this script captures before it is cut off is
# what the round reports.
set -u
cd "$(dirname "$0")/.."
J=BENCH_SWEEP.jsonl
export CESCOIN_AUTOTUNE_CACHE=.autotune_tpu.json
run() { echo "=== $* ===" >&2; timeout 3600 "$@"; }

# 1. sparse FC microbench (VGG-16 fc6/fc7 — the reference's fc bucket)
run python bench.py --fc --model vgg16 --batch 32 --sparsity 0.9 --jsonl $J

# 2. per-layer sweep with roofline bound_us columns (headline sparsity)
run python bench.py --per-layer --sparsity 0.9 --jsonl $J

# 3. remaining e2e models
run python bench.py --e2e --model googlenet --batch 16 --repeats 8 --jsonl $J
run python bench.py --e2e --model vgg16 --batch 8 --repeats 6 --jsonl $J

# 4. per-layer sparsity sweep + other models
for s in 0.7 0.8 0.95; do run python bench.py --per-layer --sparsity $s --jsonl $J; done
run python bench.py --per-layer --model alexnet --sparsity 0.9 --jsonl $J
run python bench.py --per-layer --model googlenet --sparsity 0.9 --jsonl $J
run python bench.py --per-layer --model vgg16     --sparsity 0.9 --jsonl $J

# 5. single-chip saturation curve (docs/SCALING.md evidence)
run python bench.py --batch-curve --repeats 8 --jsonl $J

# 6. on-chip kernel test lane
CESCOIN_TPU_TESTS=1 run python -m pytest tests -m tpu -q
echo "remainder-b done" >&2
