"""Render the BASELINE sweep table for docs/PERFORMANCE.md from
BENCH_SWEEP.jsonl (the headline JSON lines emitted by bench.py runs).
Every published number traces to a captured row."""

import json
import sys


def main(path="BENCH_SWEEP.jsonl"):
    rows = []
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        r = json.loads(line)
        if "metric" in r:
            rows.append(r)
    print("| metric | batch | vs dense-bf16 | vs dense-f32 | notes |")
    print("|---|---|---|---|---|")
    for r in rows:
        notes = []
        if "gnnz_per_s" in r:
            notes.append(f"{r['gnnz_per_s']/1000:.1f} Tnnz/s")
        if "t_sparse_ms" in r:
            notes.append(f"sparse {r['t_sparse_ms']}ms "
                         f"bf16 {r['t_dense_bf16_ms']}ms")
        vs_f32 = r.get("speedup_vs_dense_f32", "")
        print(f"| {r['metric']} | {r.get('batch','')} | "
              f"{r.get('value','')}x | "
              f"{vs_f32}{'x' if vs_f32 != '' else ''} | "
              f"{', '.join(notes)} |")


if __name__ == "__main__":
    main(*sys.argv[1:])
