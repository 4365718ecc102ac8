"""Round-7 optimization probe — NOT the driver bench (bench.py is frozen).

Measures each bench operator query in isolation (same `.count()`
methodology as bench.py, min-of-k) and optionally dumps
`.explain("formatted")` for each to plans/r07/<query>_<tag>.txt.

Usage:
    python tools/r07_probe.py [--plans TAG] [--reps N] [--queries a,b,c]

Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_SF_DIR (default sf0.1).
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from webcrawlerfull_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    "p1_normalize_url",
    "p5_product_match",
    "o3_frontier_topk",
    "j7_first_touch",
    "g1_seqgen",
    "doc_fingerprint_dedup",
    "events_tumbling_agg",
    "ann_lsh_topk",
]


def fmt_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, help="dump plans with this tag")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--queries", default=None)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="r07-probe", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = args.queries.split(",") if args.queries else BENCH_QUERIES
    qs = entrymod.queries()
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r07")
    os.makedirs(plan_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        samples = []
        build_samples = []
        for rep in range(args.reps):
            if name == "ann_lsh_topk":
                spark.sparkContext.setJobDescription(f"{name}:build rep{rep}")
                t0 = time.monotonic()
                idx_path = entrymod.ann_index_build(spark, sf_dir)
                build_samples.append(round(time.monotonic() - t0, 3))
                spark.sparkContext.setJobDescription(f"{name}:probe rep{rep}")
                t0 = time.monotonic()
                n = entrymod.ann_probe(spark, sf_dir, idx_path).count()
                samples.append(round(time.monotonic() - t0, 3))
            else:
                spark.sparkContext.setJobDescription(f"{name} rep{rep}")
                t0 = time.monotonic()
                n = qs[name](spark, sf_dir).count()
                samples.append(round(time.monotonic() - t0, 3))
            assert n >= 0
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        if build_samples:
            out["ann_index_build"] = {
                "min": min(build_samples), "samples": build_samples
            }
        if args.plans:
            if name == "ann_lsh_topk":
                df = entrymod.ann_probe(spark, sf_dir, idx_path)
            else:
                df = qs[name](spark, sf_dir)
            with open(
                os.path.join(plan_dir, f"{name}_{args.plans}.txt"), "w"
            ) as f:
                f.write(fmt_plan(df))
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
