"""J7 — first-found parser attribution.

Reference: ``url_first_found_by.setdefault(url, parser)`` insert-if-absent
(/root/reference/worker/src/tasks.py:483-485,624-626), in processing
order: rounds ascending, pages in frontier order within a round
(queue_pos), parsers in cascade order within a page (parser_rank; the
sequential generator runs after the cascade, rank 3).

Shape (r7): ``groupBy(keys).agg(min(struct(order_cols, payload)))``
with MAP-SIDE partial aggregation, so the exchange carries at most one
row per (key, map task). min over a struct compiles to SortAggregate,
so a map-side sort remains — the win over the former
``row_number() == 1`` window is the removed Window/row_number/Filter
machinery on both sides of the exchange (plan evidence:
plans/r07/j7_first_touch_{before,after}.txt). Equivalent output because
every engine call site has order keys that are UNIQUE within a
partition key (page rank × parser rank within a domain; (orderkey,
linenumber) in the gate query) — on a genuine tie min(struct) falls
back to comparing the payload columns, where row_number picked an
arbitrary row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def first_touch(
    mentions: DataFrame,
    order_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the first mention of each (partition key) in canonical
    processing order. ``mentions`` needs the partition cols (default
    ``["domain", "url"]`` — the reference's per-domain dict), (parser),
    and the order columns. Order keys must be unique per partition key
    for a deterministic result (all engine call sites are)."""
    order_cols = order_cols or ["round", "queue_pos", "parser_rank"]
    partition_cols = partition_cols or ["domain", "url"]
    payload = [c for c in mentions.columns if c not in partition_cols]
    packed = order_cols + [c for c in payload if c not in order_cols]
    agg = mentions.groupBy(*partition_cols).agg(
        F.min(F.struct(*packed)).alias("_first")
    )
    return agg.select(
        *[
            F.col(c) if c in partition_cols else F.col(f"_first.{c}").alias(c)
            for c in mentions.columns
        ]
    )
