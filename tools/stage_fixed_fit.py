"""Decompose the budgeted-mode per-round fixed cost by STAGE.

BENCH/BASELINE.md §7.2 established wall_r ≈ a + b·fetched_r with
a ≈ 21-28 s/round and attributed `a` to "8-9 write actions + state
reads + periodic compaction" — an inference from the action list, not
a measurement. This tool measures it: run the 8-core budgeted cells at
two budgets with WCF_STAGE_TIMING=1,

  WCF_STAGE_TIMING=1 python tools/amdahl_probe.py --cell 8 50  \
      > cell50.json 2> stage50.log
  WCF_STAGE_TIMING=1 python tools/amdahl_probe.py --cell 8 500 \
      > cell500.json 2> stage500.log
  python tools/stage_fixed_fit.py cell50.json stage50.log \
      cell500.json stage500.log

then fit lap_s(stage, round) = a_stage + b_stage·fetched_round over
the 9 (budget-50: 6, budget-500: 3) rounds per stage. Σ a_stage is the
measured per-round fixed cost, now attributed per stage.

The stderr log contains the untimed warm-up crawl's laps first; the
real crawl restarts round numbering at 0, so laps are taken from the
LAST "round=0 schedule+bloom" marker onward.
"""

from __future__ import annotations

import json
import re
import sys

LAP = re.compile(r"\[stage-timing\] round=(\d+) (.+): ([0-9.]+)s")


def parse_laps(log_path: str) -> dict[tuple[int, str], float]:
    lines = open(log_path).read().splitlines()
    start = 0
    for i, ln in enumerate(lines):
        m = LAP.search(ln)
        if m and m.group(1) == "0" and m.group(2) == "schedule+bloom":
            start = i  # keep the LAST round-0 block (skips the warm-up)
    laps: dict[tuple[int, str], float] = {}
    for ln in lines[start:]:
        m = LAP.search(ln)
        if m:
            laps[(int(m.group(1)), m.group(2))] = float(m.group(3))
    return laps


def fit(points: list[tuple[int, float]]) -> tuple[float, float]:
    n = len(points)
    sx = sum(p[0] for p in points)
    sy = sum(p[1] for p in points)
    sxx = sum(p[0] * p[0] for p in points)
    sxy = sum(p[0] * p[1] for p in points)
    denom = n * sxx - sx * sx
    if denom == 0:
        return sum(p[1] for p in points) / n, 0.0
    b = (n * sxy - sx * sy) / denom
    return (sy - b * sx) / n, b


def main(argv: list[str]) -> None:
    pairs = [(argv[i], argv[i + 1]) for i in range(0, len(argv), 2)]
    points: dict[str, list[tuple[int, float]]] = {}
    for cell_path, log_path in pairs:
        cell = json.load(open(cell_path))
        fetched = {int(k): v for k, v in cell["round_fetched"].items()}
        for (rnd, stage), lap in parse_laps(log_path).items():
            if rnd in fetched:
                points.setdefault(stage, []).append((fetched[rnd], lap))

    rows = []
    for stage, pts in points.items():
        a, b = fit(sorted(pts))
        rows.append((stage, a, b, len(pts)))
    rows.sort(key=lambda r: -r[1])
    tot_a = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    print("| stage | fixed a (s/round) | slope b (s/100k URLs) | n |")
    print("|---|---|---|---|")
    for stage, a, b, n in rows:
        print(f"| {stage} | {a:.1f} | {b * 1e5:.1f} | {n} |")
    print(f"| **total** | **{tot_a:.1f}** | **{tot_b * 1e5:.1f}** | |")
    print(
        json.dumps(
            {
                "stages": {
                    s: {"a_s": round(a, 2), "b_per_100k": round(b * 1e5, 2)}
                    for s, a, b, _ in rows
                },
                "total_fixed_s": round(tot_a, 2),
            }
        )
    )


if __name__ == "__main__":
    main(sys.argv[1:])
