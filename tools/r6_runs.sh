#!/usr/bin/env bash
# Round-6 evidence runs (BENCH/BASELINE.md §8). Run sequentially — never
# two Spark jobs at once on this host.
set -euo pipefail
cd "$(dirname "$0")/.."

# 1. merged-vs-delta frontier A/B, two backlog/round ratios, interleaved
#    (budget 50: backlog ~6x round; budget 15 x 8 rounds: ~20x round)
python tools/delta_ab.py 8 50 2 > BENCH/delta_ab_r6/b50.json 2> BENCH/delta_ab_r6/b50.err
WCF_AMDAHL_ROUNDS=8 python tools/delta_ab.py 8 15 2 > BENCH/delta_ab_r6/b15.json 2> BENCH/delta_ab_r6/b15.err

# 2. IVF recall: center / boundary / random query families (VERDICT r5 #4)
python tools/ann_ivf_vs_lsh.py 100000 64 16 > BENCH/ivf_families_r6.json

# 3. doc-dedup crawl cost at the driver-bench shape (VERDICT r5 #6):
#    one invocation runs the dedup-off headline crawl (min-of-k) AND the
#    dedup-on crawl in the same sitting — the per-round delta is the
#    dedup stage's marginal cost
WCF_BENCH_DOC_DEDUP=1 python bench.py > BENCH/bench_dedup_r6.json
