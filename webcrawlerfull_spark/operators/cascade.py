"""O7/A1/J3 — the parser cascade as columnar logic.

Reference control flow (/root/reference/worker/src/tasks.py:607-633):
per page, run parsers in order [simple, config, ai]; after each parser
that found anything, stop if the page's cumulative product set reached 5.
The AI parser is a deterministic stub (returns nothing — SURVEY.md §2.3
H5), so the observable rule collapses to: simple always runs; config runs
iff the page's simple set has < 5 URLs; page product set = simple ∪
(config if it ran).

Everything here is one groupBy + windows over the page key — the
"short-circuit" is a when/otherwise condition, not control flow.

Output: ``page_products`` — distinct (page, product_url) with the
page-level attributed parser (cascade order within the page),
parser_rank, and the raw simple/config/config_ran flags so parser_stats
totals (tasks.py:619-621) are recoverable from the stored mentions with
no second cascade pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webcrawlerfull_spark import config as C
from webcrawlerfull_spark.functions import predicates as P

PAGE_COLS = ["url", "host", "domain", "depth", "queue_pos"]
PARSER_RANK = {name: i for i, name in enumerate(C.PARSER_CASCADE + ["sequential"])}


def product_candidates(pages: DataFrame) -> DataFrame:
    """Explode anchors of fetched pages and evaluate both pattern sets.
    The reference matches patterns on the joined absolute URL with NO
    internal-host filter (_pattern_parser.py:31-36) and emits
    ``full_url.rstrip('/')``."""
    anchors = (
        pages.where(F.col("status") == "ok")
        .select(
            F.col("url").alias("page_url"),
            "host",
            "domain",
            "depth",
            "queue_pos",
            F.explode("spans").alias("span"),
        )
        .where(F.col("span.kind").isin("link", "pagination"))
        .select(
            "page_url",
            "host",
            "domain",
            "depth",
            "queue_pos",
            F.col("span.media_ref").alias("full_url"),
        )
    )
    return anchors.withColumn(
        "product_url", P.rstrip_slash(F.col("full_url"))
    ).withColumn("simple_hit", P.is_product_url(F.col("full_url"))).withColumn(
        "config_hit",
        P.config_product_match(
            F.col("full_url"), P.config_key(P.url_authority(F.col("page_url")))
        ),
    )


def run_cascade(pages: DataFrame) -> DataFrame:
    cand = product_candidates(pages)
    purl = (
        cand.where(F.col("simple_hit") | F.col("config_hit"))
        .groupBy("page_url", "host", "domain", "depth", "queue_pos", "product_url")
        .agg(
            F.max("simple_hit").alias("simple"),
            F.max("config_hit").alias("config"),
        )
    )
    w_page = Window.partitionBy("page_url")
    purl = purl.withColumn(
        "n_simple",
        F.count(F.when(F.col("simple"), F.lit(1))).over(w_page),
    ).withColumn("config_ran", F.col("n_simple") < C.CASCADE_EARLY_EXIT)

    # the simple/config/config_ran flags travel with each product row so
    # per-page parser stats (A1) are derivable later from the stored
    # mentions alone — no second cascade pass
    page_products = (
        purl.where(F.col("simple") | (F.col("config") & F.col("config_ran")))
        .withColumn(
            "parser",
            F.when(F.col("simple"), F.lit("simple")).otherwise(F.lit("config")),
        )
        .withColumn(
            "parser_rank",
            F.when(F.col("simple"), F.lit(PARSER_RANK["simple"])).otherwise(
                F.lit(PARSER_RANK["config"])
            ),
        )
        .select(
            "page_url",
            "host",
            "domain",
            "depth",
            "queue_pos",
            F.col("product_url").alias("url"),
            "parser",
            "parser_rank",
            "simple",
            "config",
            "config_ran",
        )
    )
    return page_products


def page_stats_from_mentions(mentions: DataFrame) -> DataFrame:
    """A1 inputs recovered from the stored mentions table (one row per
    page-level product/sequential mention with cascade flags)."""
    return mentions.groupBy("page_url", "host", "domain", "depth", "queue_pos").agg(
        F.count(F.when(F.col("simple"), F.lit(1))).alias("simple_found"),
        F.count(
            F.when(F.col("config") & F.col("config_ran"), F.lit(1))
        ).alias("config_found"),
        F.count(F.when(F.col("parser") == "sequential", F.lit(1))).alias("seq_found"),
    )
