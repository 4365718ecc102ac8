"""G1 — sequential URL generation as native DataFrame ops.

Reference: generate_sequential_urls
(/root/reference/worker/src/tasks.py:112-163): for pages with >=3
product URLs, sample 10, find the FIRST of 5 numeric patterns matched by
any sample URL, substitute n±1..3 (decrement only when num > i) into
every sample URL matching that pattern, exclude already-known, cap 30.

Canonicalizations (FIXTURES.md §5, mirrored by the oracle):
  sample = first 10 in sorted order (reference: random.sample);
  output sorted before the 30-cap (reference: set order).

Rebuild-URL semantics: the reference does
``re.sub(pat, lambda m: m.group(0).replace(m.group(1), str(n)), url)``.
Here: ``replace(url, group0, replace(group0, group1, n))`` — exact for
URLs where the matched substring occurs once (always true for this
engine's URL grammar; a URL with two identical pattern matches would
diverge — documented deviation).

Plan shape: 3 narrow shuffles on the page key (count/rank windows) + one
explode — no Python, WindowGroupLimit-eligible row_number filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from webcrawlerfull_spark import config as C


def generate_sequential_urls(
    page_products: DataFrame,
    page_key: str = "page_url",
    url_col: str = "url",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """page_products: distinct (page_key, url[, carry…]) rows. Returns
    (page_key, url[, carry…]) of generated URLs, deduped/capped per page."""
    carry_cols = carry_cols or []
    w_page = Window.partitionBy(page_key)
    w_sample = w_page.orderBy(url_col)

    df = page_products.withColumn("_n_products", F.count("*").over(w_page)).where(
        F.col("_n_products") >= C.SEQGEN_MIN_PRODUCTS
    )
    sample = df.withColumn("_rn", F.row_number().over(w_sample)).where(
        F.col("_rn") <= C.SEQGEN_SAMPLE
    )

    # per-URL: index of the first pattern this URL matches (if any)
    pat_idx = F.lit(None).cast("int")
    for i in reversed(range(len(C.SEQUENTIAL_NUMBER_PATTERNS))):
        p = C.SEQUENTIAL_NUMBER_PATTERNS[i]
        pat_idx = F.when(
            F.regexp_extract(F.col(url_col), p, 1) != "", F.lit(i)
        ).otherwise(pat_idx)
    sample = sample.withColumn("_pat", pat_idx)
    # the page's chosen pattern = min matched index across the sample
    # (reference: outer pattern loop breaks on first pattern any URL hits)
    sample = sample.withColumn("_page_pat", F.min("_pat").over(w_page)).where(
        F.col("_pat") == F.col("_page_pat")
    )

    # extract the number + matched substring for the chosen pattern
    g0 = F.lit(None).cast("string")
    g1 = F.lit(None).cast("string")
    for i in reversed(range(len(C.SEQUENTIAL_NUMBER_PATTERNS))):
        p = C.SEQUENTIAL_NUMBER_PATTERNS[i]
        cond = F.col("_page_pat") == i
        g0 = F.when(cond, F.regexp_extract(F.col(url_col), p, 0)).otherwise(g0)
        g1 = F.when(cond, F.regexp_extract(F.col(url_col), p, 1)).otherwise(g1)
    sample = sample.withColumn("_g0", g0).withColumn("_g1", g1).withColumn(
        "_num", F.col("_g1").cast("long")
    )

    # ±1..3 deltas; decrement only when num > i (tasks.py:145-155)
    deltas = sample.select(
        page_key,
        url_col,
        "_g0",
        "_g1",
        "_num",
        *carry_cols,
        F.explode(F.sequence(F.lit(1), F.lit(3))).alias("_i"),
    ).select(
        page_key,
        url_col,
        "_g0",
        "_g1",
        "_num",
        "_i",
        *carry_cols,
        F.explode(
            F.when(
                F.col("_num") > F.col("_i"),
                F.array(F.col("_num") + F.col("_i"), F.col("_num") - F.col("_i")),
            ).otherwise(F.array(F.col("_num") + F.col("_i")))
        ).alias("_new_num"),
    )
    generated = deltas.select(
        page_key,
        *carry_cols,
        F.replace(
            F.col(url_col),
            F.col("_g0"),
            F.replace(F.col("_g0"), F.col("_g1"), F.col("_new_num").cast("string")),
        ).alias(url_col),
    ).dropDuplicates([page_key, url_col])

    # exclude URLs already in the page's product set (tasks.py:162)
    generated = generated.join(
        page_products.select(page_key, url_col), [page_key, url_col], "left_anti"
    )
    # sorted 30-cap per page
    w_cap = Window.partitionBy(page_key).orderBy(url_col)
    return (
        generated.withColumn("_rn", F.row_number().over(w_cap))
        .where(F.col("_rn") <= C.SEQGEN_MAX_URLS)
        .drop("_rn")
    )
