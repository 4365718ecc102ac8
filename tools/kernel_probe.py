"""Spark-free parse-kernel scaling probe (BENCH/BASELINE.md evidence).

Runs the exact per-page Python kernel the fetch stage executes
(World.fetch -> spans_columns) over the same page set under
multiprocessing at 1/8/32 workers, so JVM/shuffle effects are excluded
and the measured decay isolates the VM's memory-bandwidth ceiling for
string-heavy work. A pure-CPU control loop is timed alongside to show
the cores themselves scale.

Usage: python tools/kernel_probe.py [n_hosts] [pages_per_host]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webcrawlerfull_spark.operators.parse_spans import spans_columns  # noqa: E402
from webcrawlerfull_spark.synthgen import World  # noqa: E402

SEED = 7
N_HOSTS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
PER_HOST = int(sys.argv[2]) if len(sys.argv) > 2 else 120


def _urls() -> list[str]:
    w = World(seed=SEED, n_hosts=N_HOSTS, base_pages=20000)
    urls = []
    for s in w.seeds():
        host = s.split("/")[2]
        path = w._host_params(host)["product_path"]
        for pid in range(PER_HOST):
            urls.append(f"https://{host}{path(pid)}")
    assert all(w.fetch(u) is not None for u in urls[:5])
    return urls


def parse_chunk(urls: list[str]) -> int:
    w = World(seed=SEED, n_hosts=N_HOSTS, base_pages=20000)
    n = 0
    for u in urls:
        html = w.fetch(u)
        if html is None:
            continue
        host = u.split("/")[2]
        k, _, _ = spans_columns(html, u, host)
        n += len(k)
    return n


def cpu_chunk(n: int) -> int:
    acc = 0
    for i in range(n):
        acc = (acc * 1103515245 + 12345) & 0x7FFFFFFF
    return acc


def run(workers: int, urls: list[str]) -> float:
    chunks = [urls[i::workers] for i in range(workers)]
    t0 = time.time()
    if workers == 1:
        parse_chunk(urls)
    else:
        with mp.Pool(workers) as pool:
            pool.map(parse_chunk, chunks)
    return time.time() - t0


def run_cpu(workers: int, total: int) -> float:
    t0 = time.time()
    if workers == 1:
        cpu_chunk(total)
    else:
        with mp.Pool(workers) as pool:
            pool.map(cpu_chunk, [total // workers] * workers)
    return time.time() - t0


def main() -> None:
    urls = _urls()
    out = {"pages": len(urls), "parse": {}, "cpu_control": {}}
    for wkr in (1, 8, 32):
        dt = run(wkr, urls)
        out["parse"][wkr] = {
            "sec": round(dt, 2),
            "pages_per_sec": round(len(urls) / dt, 1),
            "pages_per_sec_per_core": round(len(urls) / dt / wkr, 1),
        }
    base = out["parse"][1]["pages_per_sec"]
    out["parse_scaling_8_32"] = round(
        out["parse"][32]["pages_per_sec"] / out["parse"][8]["pages_per_sec"] / 4, 3
    )
    out["parse_speedup_32x"] = round(out["parse"][32]["pages_per_sec"] / base, 1)
    total = 800_000_000
    for wkr in (1, 32):
        out["cpu_control"][wkr] = round(run_cpu(wkr, total), 2)
    out["cpu_speedup_32x"] = round(
        out["cpu_control"][1] / out["cpu_control"][32], 1
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
