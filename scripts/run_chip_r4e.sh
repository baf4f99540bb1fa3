#!/bin/bash
# r4 capture, part E — polish pass on the two headline configs (bounded
# alternative-arm search at graph scope), after r4d.
set -u
cd /root/repo
J=BENCH_SWEEP.jsonl
export CESCOIN_AUTOTUNE_CACHE=/root/repo/.autotune_tpu.json
run() { echo "=== $(date +%T) $* ===" >&2; timeout 5400 "$@"; }

run python bench.py --e2e --batch 32 --repeats 8 --calibrate \
    --calibrate-polish 14 --buckets --jsonl $J
run python bench.py --e2e --model googlenet --batch 16 --repeats 8 \
    --calibrate --calibrate-polish 14 --jsonl $J
run python bench.py --e2e --batch 8 --repeats 16 --calibrate \
    --calibrate-polish 10 --jsonl $J
# final no-flag driver shape on the polished cache
run python bench.py

# AlexNet-scale experiment RETRY with xavier fillers: the classic
# gaussian-0.01 init plateaued at chance (8.6%) on the digits set —
# r4d's run produced an unlearned model
run python examples/train_eval_sparse.py --model alexnet --platform tpu \
    --sparsities 0.9 --block 128,128 --iters 1200 --finetune_iters 500 \
    --batch 64 --base_lr 0.01 --filler xavier \
    --report docs/EXPERIMENTS_alexnet.md

# remaining per-layer model sweeps (VERDICT #3): alexnet never ran; vgg
# died after 2 shapes on the wedged compile — vgg goes LAST (its
# 56x56x256x256 fresh arm compiles are the wedge suspects)
run python bench.py --per-layer --model alexnet --sparsity 0.9 \
    --repeats 8 --jsonl $J
run python bench.py --per-layer --model vgg16 --sparsity 0.9 \
    --repeats 8 --jsonl $J
echo "r4e done" >&2
