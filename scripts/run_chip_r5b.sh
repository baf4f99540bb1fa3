#!/bin/bash
# Round-5 chip queue B (v2): cache-deserialization hypothesis test first
# (sparse e2e measured 0.923ms in the session that COMPILED it and
# 1.287ms in sessions SERVING the persistent executable cache, while
# dense rows match r4 exactly), then the stability probe, googlenet
# retry, halo tower capture, and the AlexNet gradual-pruning experiment.
cd /root/repo || exit 1
L=logs/chip_r5b.log

for i in $(seq 1 1080); do
  grep -q "ALL DONE" logs/chip_r5a.log 2>/dev/null && break
  sleep 10
done
echo "suite A done at $(date +%T), starting B" >> "$L"

echo "=== cache hypothesis: fresh-compile e2e $(date +%T)" >> "$L"
CESCOIN_COMPILE_CACHE=/root/.cache/cescoin_xla_fresh_$$ \
  timeout 5400 python bench.py --e2e --batch 32 --calibrate \
  --jsonl logs/r5_cachetest.jsonl >> "$L" 2>&1

echo "=== cache hypothesis: cached-compile e2e again $(date +%T)" >> "$L"
timeout 5400 python bench.py --e2e --batch 32 --calibrate \
  --jsonl logs/r5_cachetest.jsonl >> "$L" 2>&1

echo "=== stability probe $(date +%T)" >> "$L"
timeout 2400 python scripts/exp_stability_r5.py >> "$L" 2>&1

echo "=== googlenet retry $(date +%T)" >> "$L"
timeout 5400 python bench.py --e2e --model googlenet --batch 16 \
  --calibrate --calibrate-polish 8 --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1 \
  || timeout 5400 python bench.py --e2e --model googlenet --batch 16 \
  --calibrate --calibrate-polish 8 --jsonl BENCH_SWEEP.jsonl >> "$L" 2>&1

echo "=== halo tower $(date +%T)" >> "$L"
timeout 3600 python bench.py --halo --batch 16 >> "$L" 2>&1

echo "=== alexnet gradual (AGP) experiment $(date +%T)" >> "$L"
timeout 10800 python examples/train_eval_sparse.py --model alexnet \
  --platform tpu --sparsities 0.9 --block 128,128 --iters 1200 \
  --finetune_iters 500 --gradual_iters 800 --batch 64 --base_lr 0.01 \
  --filler xavier --modes gradual \
  --report docs/EXPERIMENTS_alexnet_gradual.md >> "$L" 2>&1

echo "B ALL DONE $(date +%T)" >> "$L"
