"""J7 — first-found parser attribution.

Reference: ``url_first_found_by.setdefault(url, parser)`` insert-if-absent
(/root/reference/worker/src/tasks.py:483-485,624-626), in processing
order: rounds ascending, pages in frontier order within a round
(queue_pos), parsers in cascade order within a page (parser_rank; the
sequential generator runs after the cascade, rank 3).

One window over url — WindowGroupLimit-optimized row_number()==1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_touch(mentions: DataFrame, order_cols: list[str] | None = None) -> DataFrame:
    """Keep the first mention of each url in canonical processing order.
    ``mentions`` needs (url, parser) + the order columns."""
    order_cols = order_cols or ["round", "queue_pos", "parser_rank"]
    w = Window.partitionBy("url").orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        mentions.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
