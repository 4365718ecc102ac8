"""P10/P11 + the cascade's AI rank with a deterministic stand-in.

Reference: BaseAIParser._process_urls (ai_parser_langchain.py:109-128),
prompt truncation (ai_parser_langchain.py:82), cascade early exit
(tasks.py:630-633). Parity invariant: with no stand-in the cascade output
is byte-identical to the reference-stub behavior.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawlerfull_spark.functions import ai_slot
from webcrawlerfull_spark.operators.cascade import run_cascade


def _pages(spark, anchors_by_page):
    rows = []
    for i, anchors in enumerate(anchors_by_page):
        host = f"www.store{i}.example.com"
        rows.append(
            {
                "url": f"https://{host}/cat/c{i}",
                "host": host,
                "domain": host,
                "depth": 0,
                "queue_pos": i,
                "status": "ok",
                "link_spans": [
                    {"kind": "link", "media_ref": a, "offset": j}
                    for j, a in enumerate(anchors)
                ],
            }
        )
    return spark.createDataFrame(
        rows,
        "url string, host string, domain string, depth int, queue_pos long, "
        "status string, link_spans array<struct<kind:string, media_ref:string, "
        "offset:int>>",
    )


def _process_urls_reference(urls, base_url):
    """Verbatim reimplementation of BaseAIParser._process_urls
    (ai_parser_langchain.py:109-128) — the parity oracle."""
    processed, seen = [], set()
    for url in urls:
        if url.startswith("/"):
            base = base_url[:-1] if base_url.endswith("/") else base_url
            absolute_url = f"{base}{url}"
        elif not (url.startswith("http://") or url.startswith("https://")):
            absolute_url = f"{base_url.rstrip('/')}/{url.lstrip('/')}"
        else:
            absolute_url = url
        if absolute_url not in seen:
            seen.add(absolute_url)
            processed.append(absolute_url)
    return processed


def test_absolutize_and_dedup(spark):
    cases = [
        # '/'-prefixed resolves against the FULL page URL incl. path
        (["/x"], "https://h/cat/c3"),
        (["/x"], "https://h/cat/c3/"),
        # no-leading-slash relative gets exactly one separator
        (["detail/1"], "https://h.com"),
        (["detail/1"], "https://h.com///"),
        # mixed: dedup keeps first occurrence, order preserved
        (
            ["/a", "https://h.com/b", "/a", "https://x.org/a", "ftp://x/y"],
            "https://h.com/page?x=1",
        ),
    ]
    for urls, base in cases:
        df = spark.createDataFrame([(urls,)], "urls array<string>")
        out = df.select(
            ai_slot.absolutize_and_dedup(F.col("urls"), F.lit(base)).alias("o")
        ).first()["o"]
        assert out == _process_urls_reference(urls, base), (urls, base)


def test_truncate_html(spark):
    df = spark.createDataFrame([("x" * 50,)], ["html"])
    assert (
        df.select(F.length(ai_slot.truncate_html(F.col("html"), 10)).alias("n"))
        .first()["n"]
        == 10
    )
    assert (
        df.select(
            F.length(ai_slot.truncate_html(F.col("html"))).alias("n")
        ).first()["n"]
        == 50
    )


def test_cascade_ai_rank(spark):
    host0 = "https://www.store0.example.com"
    host1 = "https://www.store1.example.com"
    pages = _pages(
        spark,
        [
            # page 0: 2 simple products (< 5) -> config and ai both run;
            # ai stand-in contributes /detail anchors not already found
            [
                f"{host0}/product/widget-1",
                f"{host0}/p/2",
                f"{host0}/detail-page",     # no simple match ('/detail/' needs a path seg)
                "/buy-now",                  # relative, matches stand-in filter only
                f"{host0}/blog/post-9",
            ],
            # page 1: 5 simple products -> early exit before config AND ai
            [f"{host1}/product/widget-{k}" for k in range(5)]
            + [f"{host1}/detail-x"],
        ],
    )
    ai = ai_slot.fake_ai_candidates(F.col("link_spans"), F.col("url"))
    mentions, page_stats, arrays = run_cascade(pages, ai_candidates=ai)
    m = {
        (r["queue_pos"], r["parser"]): r["url"]
        for r in mentions.collect()
        if r["parser"] == "ai"
    }
    # page 0 got ai mentions (absolutized relative + absolute non-product);
    # the '/'-relative resolves against the FULL page URL (/cat/c0) per
    # _process_urls semantics
    ai_urls = sorted(
        r["url"] for r in mentions.collect()
        if r["parser"] == "ai" and r["queue_pos"] == 0
    )
    assert ai_urls == [
        f"{host0}/cat/c0/buy-now",
        f"{host0}/detail-page",
    ]
    # page 1 early-exited: no ai mentions despite a /detail anchor
    assert not any(k[0] == 1 for k in m)
    # ai parser_rank is the cascade slot (2), between config and sequential
    ranks = {r["parser"]: r["parser_rank"] for r in mentions.collect()}
    assert ranks.get("ai") == 2
    # ai_found surfaces in page_stats
    stats = {r["queue_pos"]: r["ai_found"] for r in page_stats.collect()}
    assert stats[0] == 2


def test_cascade_parity_without_ai(spark):
    """Default run_cascade (no stand-in) equals an explicitly-empty ai
    column — the reference-parity stub path is unchanged."""
    host = "https://www.shopify3.example.com"
    pages = _pages(
        spark,
        [[f"{host}/products/a", f"{host}/products/b", f"{host}/detail/x"]],
    )
    m_default, s_default, _ = run_cascade(pages)
    m_empty, s_empty, _ = run_cascade(
        pages, ai_candidates=F.array().cast("array<string>")
    )
    assert sorted(map(tuple, m_default.collect())) == sorted(
        map(tuple, m_empty.collect())
    )
    assert sorted(map(tuple, s_default.collect())) == sorted(
        map(tuple, s_empty.collect())
    )
    assert not any(r["parser"] == "ai" for r in m_default.collect())
