"""A1-A5 — parser statistics aggregation.

Reference accumulators (/root/reference/worker/src/tasks.py:389-394,
619-621, 555-558, 289-361): per parser, ``total`` = sum over pages of
that parser's per-page found count (NOT cross-page-unique); ``unique`` =
count of URLs whose FIRST finder was that parser; ``domains`` = distinct
domain_netlocs where the parser found anything. All plain groupBy/agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawlerfull_spark import config as C


def parser_stats(page_stats: DataFrame, products: DataFrame) -> DataFrame:
    """page_stats: (page_url, host, domain, simple_found, config_found,
    seq_found) per page; products: first-touch attributed product table.
    Returns (parser, total, unique, domains) — aggregate_results_locally
    shape (tasks.py:328-358)."""
    pairs = [
        ("simple", "simple_found"),
        ("config", "config_found"),
        ("sequential", "seq_found"),
    ]
    if "ai_found" in page_stats.columns:
        pairs.insert(2, ("ai", "ai_found"))
    per_parser = []
    for parser, col in pairs:
        per_parser.append(
            page_stats.select(
                F.lit(parser).alias("parser"),
                F.col(col).alias("found"),
                F.when(F.col(col) > 0, F.col("host")).alias("hit_host"),
            )
        )
    stacked = per_parser[0]
    for extra in per_parser[1:]:
        stacked = stacked.unionByName(extra)
    totals = (
        stacked
        .groupBy("parser")
        .agg(
            F.sum("found").alias("total"),
            F.countDistinct("hit_host").alias("domains"),
        )
    )
    uniques = products.groupBy("parser").agg(F.count("*").alias("unique"))
    base = totals.join(uniques, "parser", "full_outer")
    # the AI stub never finds anything but keeps its row (parity with the
    # reference's fixed four-parser dict)
    all_parsers = products.sparkSession.createDataFrame(
        [(p,) for p in C.PARSER_NAMES], ["parser"]
    )
    return (
        all_parsers.join(base, "parser", "left")
        .select(
            "parser",
            F.coalesce("total", F.lit(0)).alias("total"),
            F.coalesce("unique", F.lit(0)).alias("unique"),
            F.coalesce("domains", F.lit(0)).alias("domains"),
        )
    )


def urls_count_by_domain(products: DataFrame) -> DataFrame:
    """A3 — distinct product URLs per domain (tasks.py:564,333-334)."""
    return products.groupBy("domain").agg(F.countDistinct("url").alias("urls_count"))
