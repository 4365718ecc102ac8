"""O7/G1/A1/J3 — the parser cascade, sequential generation, and per-page
stats as SHUFFLE-FREE higher-order array expressions.

Reference control flow (/root/reference/worker/src/tasks.py:607-633):
per page, run parsers in order [simple, config, ai]; after each parser
that found anything, stop once the page's cumulative product set has 5+
URLs. The AI parser is a deterministic stub (SURVEY.md §2.3 H5), so the
observable rule collapses to: simple always runs; config runs iff the
page's simple set has < 5 URLs; page product set = simple ∪ (config if
it ran). Sequential generation (tasks.py:112-163, canonicalized per
FIXTURES.md §5) then runs on pages with >= 3 products.

KEY SCALE PROPERTY: all of the above is per-page semantics, and a page's
anchors live in ONE row (the spans array). So the whole cascade is
``filter``/``transform``/``array_distinct``/``array_except``/``flatten``
on that array — a narrow projection, zero shuffle, whole-stage codegen.
The earlier implementation exploded ~45 anchors/page into a groupBy +
three windows (a multi-GB shuffle at 10^6 pages/round); this one
shuffles nothing until the cross-page operators (url dedup J2,
attribution J7), which genuinely need it.

Output ``mentions``: one row per (page, product-url, parser) in cascade
order, plus per-page ``page_stats`` scalars (A1 inputs).
"""

from __future__ import annotations



from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webcrawlerfull_spark import config as C
from webcrawlerfull_spark.functions import predicates as P

PAGE_COLS = ["page_url", "host", "domain", "depth", "queue_pos"]
PARSER_RANK = {name: i for i, name in enumerate(C.PARSER_CASCADE + ["sequential"])}

_SEQ_PATTERNS = C.SEQUENTIAL_NUMBER_PATTERNS
_NO_PATTERN = len(_SEQ_PATTERNS)  # sentinel: url matches no numeric pattern


def _link_urls(link_spans: Column) -> Column:
    """All anchor URLs of the page in document order (the reference
    matches product patterns on every anchor, internal or not —
    _pattern_parser.py:31-36). Consumes the slim ``link_spans`` column so
    parquet never decodes the prose text spans here."""
    return F.transform(link_spans, lambda s: s["media_ref"])


def _matched_products(urls: Column, pattern: str) -> Column:
    """Match on the full URL, emit rstrip('/'), distinct — H2 semantics
    (sortedness is irrelevant inside a set; ordering is canonicalized
    downstream)."""
    return F.array_distinct(
        F.transform(
            F.filter(urls, lambda u: u.rlike(pattern)),
            lambda u: F.regexp_replace(u, "/+$", ""),
        )
    )


def _config_products(urls: Column, key: Column) -> Column:
    expr = _matched_products(urls, P.SIMPLE_FAST)  # 'default' key
    for k, combined in P._DOMAIN_FAST.items():
        if k == "default":
            continue
        expr = F.when(key == F.lit(k), _matched_products(urls, combined)).otherwise(
            expr
        )
    return expr


def _tagged(arr: str, parser: str) -> Column:
    return F.transform(
        F.col(arr),
        lambda u: F.struct(
            u.alias("url"),
            F.lit(parser).alias("parser"),
            F.lit(PARSER_RANK[parser]).alias("parser_rank"),
        ),
    )


def _pat_idx(u: Column) -> Column:
    """Index of the first sequential-number pattern this URL matches."""
    expr = F.lit(_NO_PATTERN)
    for i in reversed(range(len(_SEQ_PATTERNS))):
        expr = F.when(
            F.regexp_extract(u, _SEQ_PATTERNS[i], 1) != "", F.lit(i)
        ).otherwise(expr)
    return expr


def _seq_metas(products_sorted: Column) -> Column:
    """G1 layer 1: per-sample-URL pattern metadata (url, pat, g0, g1)
    as ONE struct array, gated on the ≥3-products threshold so
    ineligible pages skip the regex walk entirely (CASE
    short-circuit). Materialized as a helper COLUMN (see
    _static_cascade_layers note 2): the downstream page_pat / matched /
    generated expressions each reference the array by NAME. Inlining
    this tree at every use site instead re-ran the per-URL
    regexp_extract chain once per reference — measured 3.85 → 1.33 s
    on the 216k-page cascade noop (r7): neither interpreted projection
    nor HOF lambda evaluation performs common-subexpression
    elimination, so structural sharing is the only sharing there is."""
    sample = F.slice(products_sorted, 1, C.SEQGEN_SAMPLE)
    metas = F.transform(
        sample, lambda u: F.struct(u.alias("url"), _pat_idx(u).alias("pat"))
    )

    def with_groups(m: Column) -> Column:
        g0 = F.lit(None).cast("string")
        g1 = F.lit(None).cast("string")
        for i in reversed(range(len(_SEQ_PATTERNS))):
            g0 = F.when(
                m["pat"] == i, F.regexp_extract(m["url"], _SEQ_PATTERNS[i], 0)
            ).otherwise(g0)
            g1 = F.when(
                m["pat"] == i, F.regexp_extract(m["url"], _SEQ_PATTERNS[i], 1)
            ).otherwise(g1)
        return F.struct(
            m["url"].alias("url"),
            m["pat"].alias("pat"),
            g0.alias("g0"),
            g1.alias("g1"),
        )

    return F.when(
        F.size(products_sorted) >= C.SEQGEN_MIN_PRODUCTS,
        F.transform(metas, with_groups),
    )


def _seq_generated(
    products_sorted: Column, metas: Column, page_pat: Column
) -> Column:
    """G1 layer 3: sample = first 10 sorted; page pattern = min matched
    index over the sample; generate n±1..3 (decrement only when
    positive — exactly the reference's num > i guard); exclude the
    page's own products; sorted 30-cap. ``metas``/``page_pat`` are the
    layered helper columns (_seq_metas / array_min over it); for
    ineligible pages metas is NULL and the size guard short-circuits
    before touching it."""
    matched = F.filter(metas, lambda m: m["pat"] == page_pat)

    def gen_for(m: Column) -> Column:
        num = m["g1"].cast("long")
        deltas = F.filter(
            F.array(num + 1, num + 2, num + 3, num - 1, num - 2, num - 3),
            lambda d: d > 0,
        )
        return F.transform(
            deltas,
            lambda d: F.replace(
                m["url"], m["g0"], F.replace(m["g0"], m["g1"], d.cast("string"))
            ),
        )

    generated = F.array_distinct(F.flatten(F.transform(matched, gen_for)))
    fresh = F.array_sort(F.array_except(generated, products_sorted))
    return F.when(
        (F.size(products_sorted) >= C.SEQGEN_MIN_PRODUCTS)
        & (page_pat != _NO_PATTERN),
        F.slice(fresh, 1, C.SEQGEN_MAX_URLS),
    ).otherwise(F.array().cast("array<string>"))


_static_cache: dict = {}


def _static_cascade_layers() -> dict:
    """The cascade's Column trees built ONCE per SparkContext as LAYERED
    select lists. Two fixed costs die here:

    1. Construction: hundreds of nested F.* calls, each a py4j round
       trip, measured ~0.7 s per call — the crawl paid it EVERY round (a
       pure fixed cost that scaling can't touch). Cached, it's paid once
       per context (keyed on the active SparkContext so a stop/start
       cycle in tests never reuses stale JVM references).
    2. Tree size: the page's anchor-url array (``_urls``) and the domain
       config key (``_cfg_key`` — a parse_url + rlike when-chain) used
       to be inlined at every use site, so ``config_arr`` carried SIX
       copies of the key chain and every downstream tree transitively
       re-embedded them. Materializing both as helper columns in the
       first layer makes later trees reference them by NAME; they are
       non-cheap multi-use expressions, so Catalyst's CollapseProject
       keeps the projects separate instead of re-inlining — analysis,
       canonicalization, and interpreted eval all shrink ~6x.

    Layers are applied as chained selects; each entry is the FULL column
    list for one select (same-select aliases can't reference each other,
    so each dependency level is its own layer)."""
    from pyspark import SparkContext

    # validate by IDENTITY against a STRONG reference to the context the
    # cache was built for: keying on id() alone lets CPython reuse a
    # dead context's id after a stop/start cycle and resurrect Column
    # trees wrapping py4j refs into the dead gateway
    ctx = SparkContext._active_spark_context
    if _static_cache.get("ctx") is not ctx:
        urls = F.col("_urls")
        page_cols = [F.col(c) for c in PAGE_COLS]
        carry2 = page_cols + [F.col("ai_arr")]
        empty = F.array().cast("array<string>")
        _static_cache.clear()
        _static_cache["ctx"] = ctx
        _static_cache["layers"] = {
            # L1 (over ok pages): page cols + the two shared helpers;
            # ai_arr is appended by the caller (it may carry a stand-in
            # expression over the raw page row)
            "l1": [
                F.col("url").alias("page_url"),
                F.col("host"),
                F.col("domain"),
                F.col("depth"),
                F.col("queue_pos"),
                _link_urls(F.col("link_spans")).alias("_urls"),
                P.config_key(P.url_authority(F.col("url"))).alias("_cfg_key"),
            ],
            # L2: the always-run simple parser (helpers carried on —
            # the config chain still needs them in L4)
            "l2": carry2
            + [
                F.col("_urls"),
                F.col("_cfg_key"),
                _matched_products(urls, P.SIMPLE_FAST).alias("simple_arr"),
            ],
            # L3: early-exit flag FIRST, so L4 can gate the config
            # parser's whole regex pass on it
            "l3": carry2
            + [
                F.col("_urls"),
                F.col("_cfg_key"),
                F.col("simple_arr"),
                (F.size("simple_arr") < C.CASCADE_EARLY_EXIT).alias(
                    "config_ran"
                ),
            ],
            # L4: config parser runs ONLY below the early-exit threshold
            # (r7): CASE short-circuiting skips the per-flavor regex
            # pass over the page's anchor array for every page the
            # cascade would exit early on anyway — observably identical
            # because every consumer reads config_arr behind a
            # when(config_ran, ...) guard (page_stats, the o7 gate
            # entry) or through config_only (itself gated). Helpers
            # dropped here.
            "l4": carry2
            + [
                F.col("simple_arr"),
                F.col("config_ran"),
                F.when(
                    F.col("config_ran"),
                    _config_products(urls, F.col("_cfg_key")),
                )
                .otherwise(empty)
                .alias("config_arr"),
            ],
            "l5c": carry2
            + [
                F.col("simple_arr"),
                F.col("config_arr"),
                F.col("config_ran"),
                F.when(
                    F.col("config_ran"),
                    F.array_except("config_arr", "simple_arr"),
                )
                .otherwise(empty)
                .alias("config_only"),
            ],
            "l5": carry2
            + [
                F.col("simple_arr"),
                F.col("config_arr"),
                F.col("config_ran"),
                F.col("config_only"),
                (
                    (F.size("simple_arr") + F.size("config_only"))
                    < C.CASCADE_EARLY_EXIT
                ).alias("ai_ran"),
            ],
            "l6": carry2
            + [
                F.col("simple_arr"),
                F.col("config_arr"),
                F.col("config_ran"),
                F.col("config_only"),
                F.col("ai_ran"),
                F.when(
                    F.col("ai_ran"),
                    F.array_except(
                        F.col("ai_arr"), F.concat("simple_arr", "config_only")
                    ),
                )
                .otherwise(empty)
                .alias("ai_only"),
            ],
            # L7 restores the historical enriched column ORDER exactly
            "l7": page_cols
            + [
                F.col("simple_arr"),
                F.col("config_arr"),
                F.col("ai_arr"),
                F.col("config_ran"),
                F.col("config_only"),
                F.col("ai_ran"),
                F.col("ai_only"),
                F.array_sort(
                    F.concat("simple_arr", "config_only", "ai_only")
                ).alias("products_sorted"),
            ],
            # L8 in three helper-column steps (see _seq_metas): the
            # struct-array metadata and the page pattern are materialized
            # as named columns so the seq expression references them
            # instead of re-inlining the regex subtree per use site
            "l8a_metas": _seq_metas(F.col("products_sorted")).alias(
                "_seq_metas"
            ),
            "l8b_pat": F.array_min(
                F.transform(F.col("_seq_metas"), lambda m: m["pat"])
            ).alias("_seq_pat"),
            "l8_seq": _seq_generated(
                F.col("products_sorted"),
                F.col("_seq_metas"),
                F.col("_seq_pat"),
            ).alias("seq_arr"),
            "mentions_explode": F.explode(
                F.concat(
                    _tagged("simple_arr", "simple"),
                    _tagged("config_only", "config"),
                    _tagged("ai_only", "ai"),
                    _tagged("seq_arr", "sequential"),
                )
            ).alias("m"),
            "page_stats_cols": page_cols
            + [
                F.size("simple_arr").alias("simple_found"),
                F.when(F.col("config_ran"), F.size("config_arr"))
                .otherwise(F.lit(0))
                .alias("config_found"),
                F.when(F.col("ai_ran"), F.size("ai_arr"))
                .otherwise(F.lit(0))
                .alias("ai_found"),
                F.size("seq_arr").alias("seq_found"),
            ],
            "page_stats_filter": (
                (F.col("simple_found") > 0)
                | (F.col("config_found") > 0)
                | (F.col("ai_found") > 0)
                | (F.col("seq_found") > 0)
            ),
        }
    return _static_cache["layers"]


def run_cascade(
    pages: DataFrame, ai_candidates: Column | None = None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """pages: PARSED_PAGE(+queue_pos). Returns (mentions, page_stats,
    page_arrays) — mentions in cascade order (parser_rank) per page;
    page_arrays is the shared per-page base both derive from (callers
    persist it so the cascade executes once per round).

    ``ai_candidates``: optional array<string> column expression (over the
    page row) standing in for the live-LLM parser's output — the AI rank
    runs iff the cumulative product set after config is still under the
    early-exit threshold (tasks.py:630-633). None (default) keeps the
    reference-parity stub behavior: the ai slot contributes nothing."""
    layers = _static_cascade_layers()

    ai_col = (
        ai_candidates
        if ai_candidates is not None
        else F.array().cast("array<string>")
    )
    enriched = (
        pages.where(F.col("status") == "ok")
        .select(*layers["l1"], ai_col.alias("ai_arr"))
        .select(*layers["l2"])
        .select(*layers["l3"])
        .select(*layers["l4"])
        .select(*layers["l5c"])
        .select(*layers["l5"])
        .select(*layers["l6"])
        .select(*layers["l7"])
        .withColumn("_seq_metas", layers["l8a_metas"])
        .withColumn("_seq_pat", layers["l8b_pat"])
        .withColumn("seq_arr", layers["l8_seq"])
        .drop("_seq_metas", "_seq_pat")
    )

    mentions = enriched.select(
        *PAGE_COLS, layers["mentions_explode"]
    ).select(*PAGE_COLS, "m.url", "m.parser", "m.parser_rank")

    page_stats = enriched.select(*layers["page_stats_cols"]).where(
        layers["page_stats_filter"]
    )
    return mentions, page_stats, enriched
