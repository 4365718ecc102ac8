"""Merged vs delta frontier A/B (VERDICT r5 item 1 'done' evidence).

Runs the amdahl-probe budgeted cell (2000-host bench world, bloom,
compact-every-3) under frontier_mode merged and delta, INTERLEAVED
(pass 1: both modes, pass 2: both modes — this host swings 25-60%
across sittings), each cell in a fresh JVM with WCF_STAGE_TIMING=1.
Reports, per mode: cell wall (min across passes), total fetched, and
per-(round, stage) lap minimums — the direct check that the delta
layout turns the two O(|frontier|) flat stages (schedule+bloom,
next-frontier; BENCH §7.5: 9.1 + 9.4 s/round at budget 50) into
O(round delta) work.

Usage: python tools/delta_ab.py [cpus] [budget] [passes]
Env: WCF_AMDAHL_HOSTS / WCF_AMDAHL_ROUNDS as in amdahl_probe.
Prints one JSON line; stage logs land in /tmp/delta_ab_*.log.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LAP = re.compile(r"\[stage-timing\] round=(\d+) (.+): ([0-9.]+)s")


def parse_laps(log_path: str) -> dict[str, float]:
    """(round, stage) -> lap seconds; keeps the LAST round-0 block so the
    warm-up crawl's laps are skipped (same convention as
    stage_fixed_fit.parse_laps)."""
    lines = open(log_path).read().splitlines()
    start = 0
    for i, ln in enumerate(lines):
        m = LAP.search(ln)
        if m and m.group(1) == "0" and m.group(2) == "schedule+bloom":
            start = i
    laps: dict[str, float] = {}
    for ln in lines[start:]:
        m = LAP.search(ln)
        if m:
            laps[f"r{m.group(1)}:{m.group(2)}"] = float(m.group(3))
    return laps


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    budget = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cells: dict[str, list[dict]] = {"merged": [], "delta": []}
    stage_logs: dict[str, list[dict[str, float]]] = {"merged": [], "delta": []}
    for p in range(passes):
        for mode in ("merged", "delta"):
            log = f"/tmp/delta_ab_{mode}_{budget}_p{p}.log"
            env = dict(
                os.environ,
                WCF_FRONTIER_MODE=mode,
                WCF_STAGE_TIMING="1",
            )
            with open(log, "w") as err:
                out = subprocess.run(
                    [
                        sys.executable,
                        os.path.join(REPO, "tools", "amdahl_probe.py"),
                        "--cell", str(cpus), str(budget),
                    ],
                    env=env, stderr=err, stdout=subprocess.PIPE, cwd=REPO,
                    check=True,
                )
            cells[mode].append(json.loads(out.stdout.splitlines()[-1]))
            stage_logs[mode].append(parse_laps(log))
            print(
                f"[pass {p}] {mode}: wall={cells[mode][-1]['wall']}s "
                f"fetched={cells[mode][-1]['fetched']}",
                file=sys.stderr,
            )

    result: dict = {"cpus": cpus, "budget": budget, "passes": passes}
    for mode in ("merged", "delta"):
        walls = [c["wall"] for c in cells[mode]]
        keys = set()
        for laps in stage_logs[mode]:
            keys |= set(laps)
        lap_min = {
            k: min(laps[k] for laps in stage_logs[mode] if k in laps)
            for k in sorted(keys)
        }
        result[mode] = {
            "wall_min": min(walls),
            "walls": walls,
            "fetched": cells[mode][0]["fetched"],
            "rounds": cells[mode][0]["rounds"],
            "round_fetched": cells[mode][0]["round_fetched"],
            "stage_laps_min": lap_min,
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
