"""Round-7 crawl stage probe — the bench-shaped flagship crawl (same
World/config as bench.py) run once with WCF_STAGE_TIMING=1 so per-round
stage laps land on stderr. Separate from the frozen bench.py.

Usage: WCF_STAGE_TIMING=1 python tools/r07_crawl_probe.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from webcrawlerfull_spark.config import CrawlConfig  # noqa: E402
from webcrawlerfull_spark.session import get_spark  # noqa: E402
from webcrawlerfull_spark.sources.catalog import Catalog  # noqa: E402
from webcrawlerfull_spark.streaming.driver import crawl  # noqa: E402
from webcrawlerfull_spark.synthgen import World  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_hosts = int(os.environ.get("BENCH_HOSTS", "600"))
    spark = get_spark(
        app_name="r07-crawl-probe", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    world = World(
        seed=7, n_hosts=n_hosts, base_pages=20000, cat_min=8, cat_span=4,
        per_page_min=30, per_page_span=20, max_pag=6, fail_rate=0.01,
    )
    # warm-up (same as bench.py)
    warm_world = World(seed=3, n_hosts=3, base_pages=30)
    with tempfile.TemporaryDirectory() as tmp:
        wcat = Catalog(spark, os.path.join(tmp, "wcat"))
        crawl(spark, warm_world.seeds(),
              CrawlConfig(max_depth=2, shuffle_partitions=cpus),
              warm_world, wcat)
    runs = []
    for _ in range(reps):
        with tempfile.TemporaryDirectory() as tmp:
            cat = Catalog(spark, os.path.join(tmp, "cat"))
            cfg = CrawlConfig(
                max_depth=3, politeness_budget=None, shuffle_partitions=cpus
            )
            t0 = time.monotonic()
            res = crawl(spark, world.seeds(), cfg, world, cat)
            wall = round(time.monotonic() - t0, 3)
            fetched = res.lineage.agg(F.sum("fetched")).collect()[0][0] or 0
            walls = {
                f"round{r['round']}": r["wall_ms"] / 1000.0
                for r in res.lineage.select("round", "wall_ms").collect()
            }
            runs.append({"wall": wall, "fetched": int(fetched),
                         "round_walls": walls})
            print(json.dumps(runs[-1]), file=sys.stderr)
    print(json.dumps(runs))
    spark.stop()


if __name__ == "__main__":
    main()
