"""Column-expression predicates (SURVEY.md §2.2 P3-P8) — all native
``pyspark.sql.functions`` so they stay inside whole-stage codegen; the
big regex alternations are constant-folded and compiled once per task.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from webcrawlerfull_spark import config as C

SIMPLE_COMBINED = C.combined_regex(C.PATTERNS)
PAGINATION_COMBINED = C.combined_regex(C.PAGINATION_PATTERNS)
CATEGORY_COMBINED = C.combined_regex(C.CATEGORY_PRIORITY_PATTERNS)
IMPORTANT_COMBINED = "|".join(C.IMPORTANT_URL_KEYWORDS)
_DOMAIN_COMBINED = {k: C.combined_regex(v) for k, v in C.DOMAIN_PATTERNS.items()}

# Execution-side twins (r7, guide §1.2 per-task work): same matched
# language with the shared leading '/' factored out of the alternation —
# ~3x cheaper per Java-regex probe (see config.factored_regex). The
# *_COMBINED constants above are FROZEN: the DuckDB oracle SQL text
# interpolates them verbatim, so only these twins may be used in Spark
# expressions. Equality of the match sets is pinned by
# tests/test_extras.py::test_factored_regex_match_equivalence.
SIMPLE_FAST = C.factored_regex(C.PATTERNS)
PAGINATION_FAST = C.factored_regex(C.PAGINATION_PATTERNS)
CATEGORY_FAST = C.factored_regex(C.CATEGORY_PRIORITY_PATTERNS)
_DOMAIN_FAST = {k: C.factored_regex(v) for k, v in C.DOMAIN_PATTERNS.items()}


def is_product_url(url: Column) -> Column:
    """P5 — any of the 22 generic patterns (reference SimpleParser,
    worker/src/utils/config.py:44-74), matched on the absolute URL."""
    return url.rlike(SIMPLE_FAST)


def is_pagination_url(url_or_href: Column) -> Column:
    """P4 (URL-pattern half) — reference tests the raw href
    (worker/src/tasks.py:94-98)."""
    return url_or_href.rlike(PAGINATION_FAST)


def category_priority(url: Column) -> Column:
    """P7 — 0 for category-like URLs (crawled first), 1 otherwise
    (worker/src/tasks.py:513-526)."""
    return F.when(url.rlike(CATEGORY_FAST), F.lit(0)).otherwise(F.lit(1))


def is_important_url(url: Column) -> Column:
    """P8 — retry-worthy URLs (worker/src/tasks.py:594-601)."""
    return F.lower(url).rlike(IMPORTANT_COMBINED)


def config_key(netloc: Column) -> Column:
    """P6 key selection — first DOMAIN_PATTERNS key (dict insertion order)
    whose regex matches the page netloc, else 'default'
    (worker/src/parsers/config_parser.py:29-37). Insertion order is
    load-bearing: a netloc containing 'default' selects 'default' first."""
    expr = F.lit("default")
    for key in reversed(list(C.DOMAIN_PATTERNS)):
        expr = F.when(netloc.rlike(key), F.lit(key)).otherwise(expr)
    return expr


def config_product_match(url: Column, key: Column) -> Column:
    """P6 match — the key-selected pattern set, on the absolute URL."""
    expr = F.lit(False)
    for k, combined in _DOMAIN_FAST.items():
        expr = F.when(key == F.lit(k), url.rlike(combined)).otherwise(expr)
    return expr


def rstrip_slash(url: Column) -> Column:
    """Python ``str.rstrip('/')`` equivalence (removes ALL trailing
    slashes) — _pattern_parser.py:36 emits ``full_url.rstrip('/')``."""
    return F.regexp_replace(url, "/+$", "")


def url_authority(url: Column) -> Column:
    """netloc of an absolute URL (urlparse().netloc equivalence)."""
    return F.parse_url(url, F.lit("AUTHORITY"))
