"""G1 sequential generation: Spark DataFrame implementation vs the
vendored reference semantics (tasks.py:112-163, canonicalized)."""

from __future__ import annotations

from webcrawlerfull_spark.operators.seqgen import generate_sequential_urls
from webcrawlerfull_spark.oracle.refparser import (
    generate_sequential_urls as oracle_gen,
)

PAGES = {
    # store flavor: /p/{n} — pattern 0
    "pgA": [f"https://h.example.com/p/{n}" for n in (3, 9, 120, 121)],
    # bigcommerce: -p{n} — pattern 3
    "pgB": [f"https://h.example.com/gizmo-p{n}" for n in (1, 2, 50)],
    # query p= — pattern 1 beats -p? mixture decides by min index
    "pgC": [
        "https://h.example.com/x?p=7",
        "https://h.example.com/y?p=9",
        "https://h.example.com/item-5.html",
    ],
    # below the >=3 threshold: no output
    "pgD": ["https://h.example.com/p/1", "https://h.example.com/p/2"],
    # no numeric pattern at all
    "pgE": [
        "https://h.example.com/products/widget-a",
        "https://h.example.com/products/widget-b",
        "https://h.example.com/products/widget-c",
    ],
    # _N.html — pattern 4
    "pgF": [f"https://h.example.com/f_{n}.html" for n in (2, 10, 11)],
    # num <= i edge: decrements suppressed
    "pgG": [f"https://h.example.com/p/{n}" for n in (1, 2, 3)],
    # >10 products: only first-10-sorted sampled
    "pgH": [f"https://h.example.com/p/{n}" for n in range(100, 125)],
}


def test_seqgen_matches_oracle(spark):
    rows = [
        {"page_url": pg, "url": u} for pg, urls in PAGES.items() for u in urls
    ]
    df = spark.createDataFrame(rows)
    out = generate_sequential_urls(df, "page_url", "url")
    got = {}
    for r in out.collect():
        got.setdefault(r["page_url"], []).append(r["url"])
    for pg in got:
        got[pg] = sorted(got[pg])
    for pg, urls in PAGES.items():
        expected = oracle_gen(set(urls))
        assert got.get(pg, []) == expected, (
            f"{pg}: {got.get(pg, [])} != {expected}"
        )


def test_cascade_seq_layers_match_row_operator(spark):
    """r7 optimization pin: the cascade's LAYERED array-expression form
    of G1 (_seq_metas / _seq_pat helper columns + _seq_generated) must
    produce the same generated set per page as the independent
    row-based operator, across the PAGES edge cases (<3 products,
    no-pattern pages, num<=i decrement suppression, >10-product
    sampling)."""
    from pyspark.sql import functions as F

    from webcrawlerfull_spark.operators import cascade as CS

    rows = [
        {"page_url": pg, "products_sorted": sorted(urls)}
        for pg, urls in PAGES.items()
    ]
    df = spark.createDataFrame(rows)
    layered = (
        df.withColumn("_seq_metas", CS._seq_metas(F.col("products_sorted")))
        .withColumn(
            "_seq_pat",
            F.array_min(
                F.transform(F.col("_seq_metas"), lambda m: m["pat"])
            ),
        )
        .withColumn(
            "seq_arr",
            CS._seq_generated(
                F.col("products_sorted"),
                F.col("_seq_metas"),
                F.col("_seq_pat"),
            ),
        )
    )
    got = {
        r["page_url"]: list(r["seq_arr"]) for r in layered.collect()
    }

    flat = [
        {"page_url": pg, "url": u} for pg, urls in PAGES.items() for u in urls
    ]
    row_out = generate_sequential_urls(
        spark.createDataFrame(flat), "page_url", "url"
    )
    want: dict = {pg: [] for pg in PAGES}
    for r in row_out.collect():
        want[r["page_url"]].append(r["url"])
    want = {pg: sorted(v)[: 30] for pg, v in want.items()}
    assert got == want
