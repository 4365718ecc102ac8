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
