"""Round-7 probe: doc-dedup cost at the BUDGETED operating shape
(VERDICT r6 item 7). The r6 measurement covered the parity shape (3 big
rounds); at the 10^10 operating point the crawl runs many small budgeted
rounds while the fp+band state accumulates, so the question is whether
the per-round dedup laps (sigs / delta-write) stay bounded by the ROUND's
text volume or grow with the accumulated state.

Runs the bench world with politeness_budget + doc_dedup over N rounds,
WCF_STAGE_TIMING laps land on stderr; this script re-parses them and
prints one JSON line: per-round fetched, docs_deduped, wall, and the
dedup stage laps.

Usage: WCF_STAGE_TIMING=1 python tools/r07_dedup_rounds.py [budget] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from webcrawlerfull_spark.config import CrawlConfig  # noqa: E402
from webcrawlerfull_spark.session import get_spark  # noqa: E402
from webcrawlerfull_spark.sources.catalog import Catalog  # noqa: E402
from webcrawlerfull_spark.streaming.driver import crawl  # noqa: E402
from webcrawlerfull_spark.synthgen import World  # noqa: E402


def main() -> None:
    budget = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="r07-dedup-rounds", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    world = World(
        seed=7, n_hosts=600, base_pages=20000, cat_min=8, cat_span=4,
        per_page_min=30, per_page_span=20, max_pag=6, fail_rate=0.01,
    )
    with tempfile.TemporaryDirectory() as tmp:
        cat = Catalog(spark, os.path.join(tmp, "cat"))
        cfg = CrawlConfig(
            max_depth=3, politeness_budget=budget, use_bloom=True,
            compact_every=3, doc_dedup=True, shuffle_partitions=cpus,
        )
        t0 = time.monotonic()
        res = crawl(spark, world.seeds(), cfg, world, cat, max_rounds=rounds)
        wall = round(time.monotonic() - t0, 3)
        lin = res.lineage.select(
            "round", "fetched", "docs_deduped", "wall_ms"
        ).collect()
        out = {
            "budget": budget,
            "rounds_run": res.rounds_run,
            "wall": wall,
            "per_round": {
                f"r{r['round']}": {
                    "fetched": r["fetched"],
                    "deduped": r["docs_deduped"],
                    "wall_s": r["wall_ms"] / 1000.0,
                }
                for r in sorted(lin, key=lambda x: x["round"])
            },
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
