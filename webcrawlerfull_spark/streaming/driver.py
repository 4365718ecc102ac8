"""The crawl driver — Structured-Streaming-style micro-batch rounds over
the frontier table, with per-round checkpointing and resume.

The reference's BFS loop (/root/reference/worker/src/tasks.py:415-544)
is a hand-rolled micro-batch stream: each depth reads the frontier,
fetches, parses, appends products, and re-materializes the frontier.
Here each round is one Spark job graph whose outputs are committed to
the catalog; the frontier is self-feeding (round k writes frontier
round=k+1), which a literal ``readStream``/foreachBatch can express but
a plain restartable loop expresses more simply (SURVEY.md §2.8) — the
checkpoint is the catalog itself, not a streaming checkpoint dir.

Resume (north rule "resumable after failure with no re-fetch of seen
URLs"): lineage round k is written last = commit marker; on restart we
drop partial state after max committed round and continue from the
frontier that round already wrote. Re-running a round is idempotent
(overwrite-by-round-dir) and the seen anti-join guarantees no URL is
ever scheduled twice across the whole run.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webcrawlerfull_spark import schemas
from webcrawlerfull_spark.config import CrawlConfig
from webcrawlerfull_spark.operators.bloom import update_filters
from webcrawlerfull_spark.operators.attribution import first_touch
from webcrawlerfull_spark.operators.frontier import seed_frontier
from webcrawlerfull_spark.plans.round import run_round
from webcrawlerfull_spark.sources.catalog import Catalog
from webcrawlerfull_spark.synthgen import World


@dataclass
class CrawlResult:
    products: DataFrame      # (task_id, domain, url, parser, depth, round)
    lineage: DataFrame       # per-round metrics
    seen: DataFrame          # (url, round)
    rounds_run: int


def _empty_seen(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], schema=schemas.SEEN_EXACT)


def crawl(
    spark: SparkSession,
    seeds: list[str],
    cfg: CrawlConfig,
    world: World,
    catalog: Catalog,
    robots: DataFrame | None = None,
    max_rounds: int | None = None,
) -> CrawlResult:
    """Run (or resume) a crawl to completion. ``max_rounds`` stops early
    (for resume tests); call again with the same catalog to continue."""
    committed = catalog.max_committed_round()
    if committed is None:
        round_id = 0
        frontier = seed_frontier(spark, seeds)
        catalog.write_round(frontier, "frontier", 0)
    else:
        catalog.drop_rounds_after(committed)
        round_id = committed + 1
        if not catalog.has_round("frontier", round_id):
            # finished run: previous round produced no next frontier
            return _result(spark, catalog, rounds_run=0)

    rounds_run = 0
    # seen cardinality is tracked incrementally (scheduled sets are
    # disjoint across rounds by construction) — resuming rebuilds the
    # running total from committed lineage instead of re-counting state
    prior_lineage = catalog.read_all("lineage")
    seen_total = (
        (prior_lineage.agg(F.sum("fetched")).collect()[0][0] or 0)
        if prior_lineage is not None
        else 0
    )
    # in parity mode one round == one reference depth, bounded by max_depth;
    # with a politeness budget the frontier drains over more rounds
    hard_stop = cfg.max_depth if cfg.politeness_budget is None else 10_000
    while round_id < hard_stop:
        if max_rounds is not None and rounds_run >= max_rounds:
            break
        frontier = catalog.read_round("frontier", round_id)
        frontier_size = frontier.count()
        if frontier_size == 0:
            break
        seen = catalog.read_all("seen", up_to_round=round_id - 1) or _empty_seen(spark)
        seen_filters = None
        if cfg.use_bloom and round_id > 0 and catalog.has_round("seen_bloom", round_id - 1):
            seen_filters = catalog.read_round("seen_bloom", round_id - 1)

        t0 = time.monotonic()
        out = run_round(
            frontier, seen, world, cfg, round_id, robots=robots,
            seen_filters=seen_filters,
        )
        out.scheduled.persist()
        out.pages.persist()
        out.page_arrays.persist()

        # seen delta FIRST (mark-before-fetch, tasks.py:438-440: even if the
        # rest of the round is re-run, these URLs are never re-scheduled —
        # but NOT committed until lineage lands, so a crash here is safe)
        catalog.write_round(
            out.scheduled.select("url").withColumn("round", F.lit(round_id)),
            "seen",
            round_id,
        )
        if cfg.use_bloom:
            # full filter state per round (simple + resume-friendly; an
            # Iceberg MERGE would rewrite only touched buckets)
            new_filters = update_filters(
                out.scheduled.select("url"), seen_filters, cfg.bloom_buckets,
                cfg.bloom_capacity_per_bucket, cfg.bloom_fpp,
            )
            catalog.write_round(new_filters, "seen_bloom", round_id)
        catalog.write_round(out.mentions, "mentions", round_id)
        catalog.write_round(
            out.page_stats.withColumn("round", F.lit(round_id)),
            "page_stats",
            round_id,
        )

        # attribution reads the stored mentions parquet back — the cascade
        # plan runs exactly once per round (J7)
        mentions_stored = catalog.read_round("mentions", round_id)
        prior = catalog.read_all("products", up_to_round=round_id - 1)
        new_products = first_touch(mentions_stored, ["queue_pos", "parser_rank"])
        if prior is not None:
            new_products = new_products.join(
                prior.select("url"), "url", "left_anti"
            )
        new_products = new_products.select(
            F.lit(cfg.task_id).alias("task_id"),
            "domain",
            "url",
            "parser",
            "depth",
            F.lit(round_id).alias("round"),
        )
        catalog.write_round(new_products, "products", round_id)
        catalog.write_round(out.next_frontier, "frontier", round_id + 1)

        # lineage LAST = the commit marker (A7 metrics, north-rule set).
        # pages has exactly one row per scheduled URL, so one agg job
        # yields both fetch and parse counts.
        counts = out.pages.agg(
            F.count("*").alias("fetched"),
            F.count(F.when(F.col("status") == "ok", F.lit(1))).alias("parsed"),
        ).collect()[0]
        fetched, parsed = counts["fetched"], counts["parsed"]
        n_products = catalog.read_round("products", round_id).count()
        seen_total += fetched
        seen_card = seen_total
        wall_ms = int((time.monotonic() - t0) * 1000)
        lineage_row = spark.createDataFrame(
            [
                {
                    "task_id": cfg.task_id,
                    "round": round_id,
                    "frontier_size": frontier_size,
                    "seen_cardinality": seen_card,
                    "fetched": fetched,
                    "parsed": parsed,
                    "products": n_products,
                    "wall_ms": wall_ms,
                }
            ],
            schema=schemas.LINEAGE,
        )
        catalog.write_round(lineage_row, "lineage", round_id)

        out.scheduled.unpersist()
        out.pages.unpersist()
        out.page_arrays.unpersist()
        round_id += 1
        rounds_run += 1
        if fetched == 0:
            break

    return _result(spark, catalog, rounds_run)


def _result(spark: SparkSession, catalog: Catalog, rounds_run: int) -> CrawlResult:
    products = catalog.read_all("products")
    lineage = catalog.read_all("lineage")
    seen = catalog.read_all("seen")
    empty_products = spark.createDataFrame([], schema=schemas.PRODUCTS)
    empty_lineage = spark.createDataFrame([], schema=schemas.LINEAGE)
    return CrawlResult(
        products=products if products is not None else empty_products,
        lineage=lineage if lineage is not None else empty_lineage,
        seen=seen if seen is not None else _empty_seen(spark),
        rounds_run=rounds_run,
    )
