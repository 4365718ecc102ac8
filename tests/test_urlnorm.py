"""P1 normalization: Spark-native column implementation vs the vendored
reference semantics (tasks.py:23-53), plus idempotence (SURVEY.md §5.5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawlerfull_spark.functions.urlnorm import normalize_url
from webcrawlerfull_spark.oracle.refparser import normalize_url as oracle_norm

CASES = [
    "https://www.Store1.example.com/p/12/",
    "https://shop.example.com/products/widget-3?utm_source=x&color=red",
    "https://shop.example.com/item?ref=home&id=9",
    "https://shop.example.com/a/b//",
    "https://shop.example.com/a?session_id=abc&keep=1&affiliate=z",
    "https://shop.example.com/a?noequals&x=1",
    "https://shop.example.com/a?&&x=1",
    "https://shop.example.com/path#fragment",
    "https://shop.example.com/path?page=2#frag",
    "https://shop.example.com",
    "https://shop.example.com/?utm_campaign=only",
    "https://shop.example.com/a?PREFERENCE=1",          # name contains 'ref'
    "https://shop.example.com/a?clickthrough=1&ok=2",   # name contains 'click'
    "https://shop.example.com/a?resource=1",            # contains 'source'
    "http://h.example.com:8080/x/?a=1&b=2",
]


def test_normalize_matches_reference(spark):
    df = spark.createDataFrame([(u,) for u in CASES], ["url"]).withColumn(
        "norm", normalize_url(F.col("url"))
    )
    got = {r["url"]: r["norm"] for r in df.collect()}
    for u in CASES:
        assert got[u] == oracle_norm(u), f"mismatch for {u!r}: {got[u]!r}"


def test_normalize_idempotent(spark):
    df = spark.createDataFrame([(u,) for u in CASES], ["url"])
    df = df.withColumn("n1", normalize_url(F.col("url"))).withColumn(
        "n2", normalize_url(F.col("n1"))
    )
    bad = df.where(F.col("n1") != F.col("n2")).collect()
    assert not bad, bad


def test_normalize_idempotent_hypothesis():
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:
        return

    paths = st.text(
        alphabet="abcdefgh0123456789/-_", min_size=0, max_size=20
    )
    params = st.lists(
        st.tuples(
            st.text(alphabet="abcdefutm_sorce", min_size=1, max_size=12),
            st.text(alphabet="xyz01", min_size=0, max_size=4),
        ),
        max_size=4,
    )

    @given(paths, params)
    @settings(max_examples=200, deadline=None)
    def check(path, ps):
        q = "&".join(f"{k}={v}" for k, v in ps)
        u = f"https://h.example.com/{path}" + (f"?{q}" if q else "")
        assert oracle_norm(oracle_norm(u)) == oracle_norm(u)

    check()
