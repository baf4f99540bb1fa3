#!/bin/bash
# r3 capture, part 3 — runs after the e2e model captures; prioritized over
# the long per-layer model sweeps:
#  1. unstructured e2e RECAPTURE (block-density gate now precedes autotune;
#     expect ~1.0x instead of the defective 0.43x row)
#  2. AlexNet-scale train->prune->fine-tune->sparse-exec experiment on the
#     chip (VERDICT r2 item 6: replace the LeNet-only accuracy story)
#  3. remaining sparsity sweep points + batch curve + on-chip test lane
set -u
cd "$(dirname "$0")/.."
J=BENCH_SWEEP.jsonl
export CESCOIN_AUTOTUNE_CACHE=.autotune_tpu.json
run() { echo "=== $* ===" >&2; timeout 3600 "$@"; }

run python bench.py --e2e --granularity unstructured --sparsity 0.9 \
    --batch 32 --repeats 8 --jsonl $J

run python examples/train_eval_sparse.py --model alexnet --platform tpu \
    --sparsities 0.9 --block 128,128 --iters 800 --finetune_iters 400 \
    --batch 64 --base_lr 0.01 \
    --report docs/EXPERIMENTS_alexnet.md

# diagnostic: googlenet e2e lost (0.89x vs bf16) with autotuned arms —
# separate arm-pick effects (warm-bias) from structural effects
# (cin_pad copies per inception branch, concat retiles): forced-dense
# sparse arm should measure ~1.0x; the gap below 1.0 is structural.
run python bench.py --e2e --model googlenet --batch 16 --repeats 8 \
    --xbsp-arm dense
run python bench.py --e2e --model googlenet --batch 16 --repeats 8 \
    --no-autotune

for s in 0.7 0.95 0.8; do run python bench.py --per-layer --sparsity $s --jsonl $J; done
run python bench.py --batch-curve --repeats 8 --jsonl $J
CESCOIN_TPU_TESTS=1 run python -m pytest tests -m tpu -q
run python bench.py --per-layer --model googlenet --sparsity 0.9 --jsonl $J
run python bench.py --per-layer --model vgg16     --sparsity 0.9 --jsonl $J
run python bench.py --per-layer --model alexnet   --sparsity 0.9 --jsonl $J
# drive the driver's end-of-round invocation shape (no flags = fused e2e
# headline; compile-cache-warm by now)
run python bench.py
echo "remainder-c done" >&2
