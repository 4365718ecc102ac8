"""P1 — URL normalization as native Spark column expressions.

Semantics of the reference ``normalize_url``
(/root/reference/worker/src/tasks.py:23-53), reproduced exactly:

- query params whose NAME (lowered, text before first '=') CONTAINS any
  of the 9 tracking substrings are dropped (substring match, tasks.py:38)
- params that are empty or have no '=' are dropped (tasks.py:36)
- netloc lowercased; path ``rstrip('/')`` (all trailing slashes);
  fragment dropped; scheme/param order otherwise preserved

Implemented with parse_url + higher-order array functions — zero Python,
stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from webcrawlerfull_spark import config as C

TRACKING_COMBINED = "|".join(C.TRACKING_PARAM_SUBSTRINGS)


def normalize_url(url: Column) -> Column:
    scheme = F.parse_url(url, F.lit("PROTOCOL"))
    netloc = F.lower(F.parse_url(url, F.lit("AUTHORITY")))
    path = F.regexp_replace(
        F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit("")), "/+$", ""
    )
    raw_query = F.parse_url(url, F.lit("QUERY"))
    kept = F.filter(
        F.split(F.coalesce(raw_query, F.lit("")), "&"),
        lambda p: (p != "")
        & p.contains("=")
        & ~F.lower(F.split_part(p, F.lit("="), F.lit(1))).rlike(TRACKING_COMBINED),
    )
    query = F.array_join(kept, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        netloc,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
