"""robots.txt parsing as pure column expressions (north-star component:
"per-host politeness buckets with robots.txt gating" — the reference has
no robots handling, so semantics follow the public robots.txt convention:
``User-agent: *`` sections' ``Disallow:`` path prefixes; an empty
Disallow value allows everything).

The per-line state machine (am I inside a ``*`` section?) folds over the
line array with ``aggregate`` — native, codegen-eligible, no Python. At
crawl scale the robots table is one small row per host, broadcast-joined
against the frontier (plans/round.apply_robots).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def disallow_prefixes(robots_txt: Column) -> Column:
    """array<string> of Disallow path prefixes that apply to ``*``.

    Grouping follows RFC 9309: CONSECUTIVE ``User-agent`` lines form one
    group header (``User-agent: *\\nUser-agent: googlebot\\nDisallow: /x``
    applies /x to ``*``), so a UA line only resets group membership when
    it STARTS a new header (the previous meaningful line was not a UA
    line). Blank lines and ``#`` comments are insignificant — they never
    split a header run. ``Allow`` lines are deliberately NOT implemented
    (this engine only needs prefix gating; an Allow line still terminates
    a header run like any other rule line), and non-group lines such as
    ``Sitemap:`` are ignored."""
    lines = F.split(robots_txt, "\n")
    init = F.struct(
        F.lit(False).alias("active"),
        F.lit(False).alias("in_ua"),  # previous meaningful line was a UA line
        F.array().cast("array<string>").alias("prefixes"),
    )

    def step(acc, raw):
        line = F.trim(raw)
        low = F.lower(line)
        is_ua = low.startswith("user-agent:")
        is_star = F.trim(F.substring(line, 12, 10_000)) == "*"
        is_skip = (line == "") | line.startswith("#")
        value = F.trim(F.substring(line, 10, 10_000))  # after 'disallow:'
        is_dis = low.startswith("disallow:") & acc["active"] & (value != "")
        active = F.when(
            is_ua, (acc["in_ua"] & acc["active"]) | is_star
        ).otherwise(acc["active"])
        in_ua = F.when(is_ua, F.lit(True)).otherwise(
            F.when(is_skip, acc["in_ua"]).otherwise(F.lit(False))
        )
        return F.struct(
            active.alias("active"),
            in_ua.alias("in_ua"),
            F.when(
                is_dis, F.array_append(acc["prefixes"], value)
            ).otherwise(acc["prefixes"]).alias("prefixes"),
        )

    return F.aggregate(lines, init, step, lambda acc: acc["prefixes"])


def parse_robots(
    df: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> (host, disallow_prefixes) — the shape
    plans/round.apply_robots consumes."""
    return df.select(
        F.col(host_col).alias("host"),
        disallow_prefixes(F.col(txt_col)).alias("disallow_prefixes"),
    )
