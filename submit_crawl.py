"""spark-submit entry point for the crawl engine (the north rule's
deployment shape: ``spark-submit --py-files dist/webcrawlerfull_spark.zip
submit_crawl.py ...`` on a multi-executor cluster).

The script takes NO SparkSession tuning of its own — master, executor
count/memory, and any ``--conf`` come from the spark-submit command
line, so the identical invocation runs at N and 4N executors for the
two-cluster-size comparison. Engine-scoped settings (AQE, Arrow) are
applied only if spark-submit didn't set them explicitly.

The fetch side is the deterministic synthetic World (SURVEY.md §2.1 —
the reference's aiohttp fetcher replaced by an in-process page
generator), so a run is fully specified by the world parameters +
crawl config, and two cluster sizes produce the identical crawl
(tests/test_scale_modes.py::test_crawl_invariant_under_parallelism).

Prints ONE JSON line with the run's lineage so callers (bench drivers,
cluster jobs) can scrape throughput without touching the catalog.

Example (local smoke):
    python tools/package_pyfiles.py
    spark-submit --master 'local[8]' \
        --py-files dist/webcrawlerfull_spark.zip \
        submit_crawl.py --catalog /tmp/cat --world-hosts 12 \
        --world-pages 60 --max-depth 2
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--catalog", required=True, help="catalog base dir (resume point)")
    p.add_argument(
        "--iceberg-catalog", default=None, metavar="NAME",
        help="use real Iceberg tables in the Spark catalog NAME instead "
        "of the parquet round-dir layout (requires the "
        "iceberg-spark-runtime jar on --jars/--packages and "
        "spark.sql.catalog.NAME configured; --catalog then names the "
        "table namespace)",
    )
    p.add_argument("--task-id", default="submit")
    p.add_argument("--world-seed", type=int, default=7)
    p.add_argument("--world-hosts", type=int, default=40)
    p.add_argument("--world-pages", type=int, default=20000)
    p.add_argument("--max-depth", type=int, default=3)
    p.add_argument("--budget", type=int, default=None,
                   help="per-host politeness budget (None = parity mode)")
    p.add_argument("--bloom", action="store_true",
                   help="bloom-gate the seen anti-join")
    p.add_argument("--compact-every", type=int, default=None)
    p.add_argument("--max-rounds", type=int, default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None,
                   help="override spark.sql.shuffle.partitions (else the "
                        "submitted conf / engine default applies)")
    args = p.parse_args()

    # imports AFTER arg parsing so --help works without the zip on path
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from webcrawlerfull_spark.config import CrawlConfig
    from webcrawlerfull_spark.sources.catalog import Catalog
    from webcrawlerfull_spark.streaming.driver import crawl
    from webcrawlerfull_spark.synthgen import World

    builder = SparkSession.builder.appName("webcrawlerfull-spark-submit")
    spark = builder.getOrCreate()
    # engine-required settings, only when the submit command didn't set
    # them explicitly. spark.conf.get(k) is NOT a usable probe here: for
    # registered SQL confs it returns the built-in default instead of
    # raising, so an except-branch fallback never fires and Arrow stays
    # off under a bare spark-submit. An explicit --conf (or
    # spark-defaults entry) lands in the SparkContext's SparkConf, which
    # reports only what was actually set.
    submitted = spark.sparkContext.getConf()
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        if not submitted.contains(k):
            spark.conf.set(k, v)

    shuffle = args.shuffle_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    world = World(
        seed=args.world_seed,
        n_hosts=args.world_hosts,
        base_pages=args.world_pages,
    )
    cfg = CrawlConfig(
        task_id=args.task_id,
        max_depth=args.max_depth,
        politeness_budget=args.budget,
        use_bloom=args.bloom,
        compact_every=args.compact_every,
        shuffle_partitions=shuffle,
    )
    if args.iceberg_catalog:
        from webcrawlerfull_spark.sources.catalog import IcebergCatalog

        # --catalog names the namespace inside the Iceberg catalog;
        # sanitize it — path basenames often carry '-' or '.' which are
        # invalid in an unquoted CREATE NAMESPACE identifier (ADVICE r5)
        raw_ns = os.path.basename(args.catalog.rstrip("/")) or "crawl"
        ns = re.sub(r"[^A-Za-z0-9_]", "_", raw_ns)
        cat = IcebergCatalog(
            spark,
            namespace=ns,
            catalog_name=args.iceberg_catalog,
        )
    else:
        cat = Catalog(spark, args.catalog)
    t0 = time.monotonic()
    res = crawl(spark, world.seeds(), cfg, world, cat, max_rounds=args.max_rounds)
    wall = time.monotonic() - t0
    fetched = res.lineage.agg(F.sum("fetched")).collect()[0][0] or 0
    out = {
        "task_id": args.task_id,
        "rounds_run": res.rounds_run,
        "fetched": int(fetched),
        "products": res.products.count(),
        "wall_sec": round(wall, 3),
        "urls_per_sec": round(fetched / wall, 2) if wall else 0.0,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
