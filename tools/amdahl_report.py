"""Render tools/amdahl_probe.py JSON into the BENCH/BASELINE.md table:
per-cell walls/efficiency, the per-core-count linear fit
wall_r = a + b*fetched_r, the slope-only (fixed-cost-free) efficiency,
and the per-round residual wall_r - b*fetched_r (is the 'fixed' share
actually constant, or growing with cumulative state?).

Usage: python tools/amdahl_report.py /tmp/r5/amdahl.json
"""

from __future__ import annotations

import json
import sys


def main(path: str) -> None:
    d = json.load(open(path))
    cells = d["cells"]
    print("| cell | wall (s) | rounds | fetched | urls/s |")
    print("|---|---|---|---|---|")
    for k, c in sorted(cells.items()):
        print(
            f"| {k} | {c['wall']} | {c['rounds']} | {c['fetched']:,} "
            f"| {c['fetched'] / c['wall']:,.0f} |"
        )
    for b in (50, 500):
        print(f"eff_2to8_b{b} = {d[f'eff_2to8_b{b}']}")
    for c in (2, 8):
        f = d[f"fit_c{c}"]
        print(
            f"fit c{c}: fixed={f['fixed_sec_per_round']}s/round "
            f"slope={f['sec_per_1k_urls']}s/1k urls ({f['points']} pts)"
        )
    b2 = d["fit_c2"]["sec_per_1k_urls"]
    b8 = d["fit_c8"]["sec_per_1k_urls"]
    if b8:
        print(f"slope-only 2->8 efficiency (fixed-cost-free) = {b2 / b8 / 4:.3f}")
    # residuals: per-round wall minus the scalable part — constant would
    # mean a true per-round fixed cost; growth with round index means
    # cumulative-state reads (bloom/seen deltas) dominate instead
    for c in (2, 8):
        b = d[f"fit_c{c}"]["sec_per_1k_urls"] / 1000.0
        for budget in (50, 500):
            cell = cells[f"c({c}, {budget})"] if f"c({c}, {budget})" in cells else cells[f"c{c}_b{budget}"]
            resid = {
                r: round(cell["round_walls"][r] - b * cell["round_fetched"][r], 1)
                for r in sorted(cell["round_walls"], key=int)
            }
            print(f"resid c{c} b{budget}: {resid}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r5/amdahl.json")
