"""Two-cluster-size scaling evidence (BASELINE.md protocol).

Runs the identical bench.py job at N=local[8] and 4N=local[32] on the
identical synthetic input (same seed/world), in separate JVMs, and
writes BENCH/BASELINE.md with URLs/s at both sizes + scaling efficiency
(T8/T32)/4. Sandbox proxy for the north rule's N vs 4N executors.

Usage: python tools/bench_scaling.py [out_md]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env.setdefault("SPARK_DRIVER_MEMORY", "24g")  # local mode: one JVM does everything
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"bench.py (cpus={cpus}) produced no JSON")
    return json.loads(lines[-1])


def main() -> None:
    out_md = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH", "BASELINE.md")
    r8 = run(8)
    r32 = run(32)
    t8 = r8["queries"]["crawl_3_rounds"]
    t32 = r32["queries"]["crawl_3_rounds"]
    eff = (t8 / t32) / 4 if t32 else 0.0
    os.makedirs(os.path.dirname(out_md), exist_ok=True)
    with open(out_md, "w") as f:
        f.write(
            f"""# BENCH — two-parallelism scaling evidence

Identical `bench.py` crawl job (synthetic world, seed 7,
{r8["crawl_fetched"]} URLs fetched+parsed over 3 rounds) on the identical
input at two parallelism levels (sandbox proxy for N vs 4N executors,
per BASELINE.md protocol).

| metric | local[8] | local[32] |
|---|---|---|
| URLs fetched+parsed / s | {r8["urls_fetched_parsed_per_sec"]} | {r32["urls_fetched_parsed_per_sec"]} |
| crawl wall-clock (3 rounds, s) | {t8} | {t32} |
| scaling efficiency (T8/T32)/4 | — | {eff:.3f} (target >= 0.8) |

Raw bench lines:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```
"""
        )
    print(json.dumps({"t8": t8, "t32": t32, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
