"""J7 — first-found parser attribution.

Reference: ``url_first_found_by.setdefault(url, parser)`` insert-if-absent
(/root/reference/worker/src/tasks.py:483-485,624-626), in processing
order: rounds ascending, pages in frontier order within a round
(queue_pos), parsers in cascade order within a page (parser_rank; the
sequential generator runs after the cascade, rank 3).

One window — WindowGroupLimit-optimized row_number()==1.

The reference keeps ``url_first_found_by`` PER DOMAIN (crawl_domain is a
per-seed-domain loop, tasks.py:376-584), so a product URL reachable from
two seed domains gets one attribution row per domain — the key is
(domain, url), not url alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_touch(
    mentions: DataFrame,
    order_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the first mention of each (partition key) in canonical
    processing order. ``mentions`` needs the partition cols (default
    ``["domain", "url"]`` — the reference's per-domain dict), (parser),
    and the order columns."""
    order_cols = order_cols or ["round", "queue_pos", "parser_rank"]
    partition_cols = partition_cols or ["domain", "url"]
    w = Window.partitionBy(*partition_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    return (
        mentions.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
