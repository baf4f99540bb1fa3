#!/bin/bash
# r3 cold-methodology recapture: remaining suite steps (fc + alexnet e2e
# already captured this session).
set -u
cd "$(dirname "$0")/.."
J=BENCH_SWEEP.jsonl
export CESCOIN_AUTOTUNE_CACHE=.autotune_tpu.json
run() { echo "=== $* ===" >&2; timeout 3600 "$@"; }

run python bench.py --e2e --buckets --batch 32 --repeats 8 --jsonl $J
run python bench.py --e2e --batch 8 --repeats 8 --jsonl $J
run python bench.py --granularity unstructured --sparsity 0.9 --layers 6 --jsonl $J
run python bench.py --e2e --model googlenet --batch 16 --repeats 8 --jsonl $J
run python bench.py --e2e --model vgg16 --batch 8 --repeats 6 --jsonl $J
CESCOIN_TPU_TESTS=1 run python -m pytest tests -m tpu -q
for s in 0.9 0.7 0.8 0.95; do run python bench.py --sparsity $s --jsonl $J; done
for s in 0.7 0.9; do run python bench.py --model alexnet --sparsity $s --jsonl $J; done
run python bench.py --model googlenet --sparsity 0.9 --jsonl $J
run python bench.py --model vgg16     --sparsity 0.9 --jsonl $J
run python bench.py --batch-curve --repeats 8 --jsonl $J
echo "remainder done" >&2
