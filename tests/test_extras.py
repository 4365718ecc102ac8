"""Training-data pipeline extras: dedup, similarity, text stats,
multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawlerfull_spark.functions import textstats as T
from webcrawlerfull_spark.operators import multimodal as MM
from webcrawlerfull_spark.operators import similarity as SIM
from webcrawlerfull_spark.operators import textdedup as TD


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs away fast"),
        (2, "the quick brown fox jumps over the lazy dog and runs away"),  # near-dup of 1
        (3, "completely different text about spark engines and shuffles here now"),
        (4, "el gato y el perro en la casa de los abuelos es grande"),
        (5, "THE QUICK  brown fox jumps over the lazy dog and runs away fast"),  # case/ws dup of 1
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_normalizes_case_and_ws(spark, docs):
    out = TD.exact_dedup(docs)
    dupes = {r["kept_doc_id"]: r["n_dupes"] for r in out.collect()}
    assert dupes[1] == 2  # doc 5 collapses onto doc 1
    assert sum(dupes.values()) == 5


def test_minhash_finds_near_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in TD.minhash_candidate_pairs(docs, k=12, bands=4).collect()
    }
    assert (1, 2) in pairs or (1, 5) in pairs
    assert (1, 3) not in pairs and (3, 4) not in pairs


def test_ngram_jaccard_verify(spark, docs):
    cands = spark.createDataFrame(
        [(1, 2), (1, 3)], ["id_a", "id_b"]
    )
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in TD.ngram_jaccard_pairs(docs, cands, threshold=0.0).collect()
    }
    assert out[(1, 2)] > 0.5
    assert out[(1, 3)] < 0.1


def test_simhash_similar_docs_close(spark, docs):
    out = {r["doc_id"]: r["sh"] for r in docs.select(
        "doc_id", TD.simhash16(F.col("text")).alias("sh")
    ).collect()}
    ham_12 = bin(out[1] ^ out[2]).count("1")
    ham_13 = bin(out[1] ^ out[3]).count("1")
    assert ham_12 < ham_13


def test_lang_guess(spark, docs):
    out = {r["doc_id"]: r["lg"] for r in docs.select(
        "doc_id", T.lang_guess(F.col("text")).alias("lg")
    ).collect()}
    assert out[1] == "en"
    assert out[4] == "es"


def test_cosine_topk_self_first(spark):
    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)]) for i in range(50)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qv = rows[5][1]
    top = SIM.cosine_topk(emb, qv, k=3).collect()
    assert top[0]["vec_id"] in (5, 16, 27, 38, 49)  # identical vectors mod 11 cycle
    assert abs(top[0]["cosine"] - 1.0) < 1e-6


def test_lsh_topk_subset_of_bucket(spark):
    rows = [(i, [float((i * 13 + j) % 7 - 3) for j in range(8)]) for i in range(80)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qv = rows[2][1]
    exact = [r["vec_id"] for r in SIM.cosine_topk(emb, qv, k=1).collect()]
    approx = [r["vec_id"] for r in SIM.lsh_topk(emb, qv, dims=8, k=1).collect()]
    assert approx  # bucket contains at least the query-identical vectors
    assert exact[0] == approx[0]


def test_multimodal_plumbing(spark, docs):
    media = MM.synth_media(docs)
    got = [(f.name, f.dataType.simpleString()) for f in media.schema.fields]
    exp = [(f.name, f.dataType.simpleString()) for f in MM.MEDIA.fields]
    assert got == exp
    feats = MM.extract_features(media, n_features=8, fake=True)
    rows = feats.collect()
    assert len(rows) == 5
    for r in rows:
        assert len(r["features"]) == 8
        assert all(0.0 <= v <= 1.0 for v in r["features"])
    # determinism
    again = MM.extract_features(media, n_features=8, fake=True).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"xx", fake=False)


def test_frame_sample_only_videos(spark, docs):
    media = MM.synth_media(docs)
    frames = MM.frame_sample(media).collect()
    kinds = {r["media_id"] for r in frames}
    video_ids = {
        r["media_id"] for r in media.where(F.col("kind") == "video").collect()
    }
    assert kinds == video_ids
    assert all(r["frame_no"] >= 0 for r in frames)


def test_wordstream_render_byte_identical():
    """r7 optimization pin: the vectorized _WordStream paragraph path
    (numpy MT19937 raw words) must render byte-identical HTML to the
    stdlib Random.choice path it replaced, for every page kind and for
    MirrorWorld's twin/perturb branches."""
    import webcrawlerfull_spark.synthgen as sg

    if sg._np is None:
        pytest.skip("numpy unavailable")
    worlds = [
        sg.World(seed=7, n_hosts=600, base_pages=20000, cat_min=8,
                 cat_span=4, per_page_min=30, per_page_span=20, max_pag=6),
        sg.World(seed=42, n_hosts=12, base_pages=60),
        sg.MirrorWorld(seed=5, n_hosts=6, base_pages=60, perturb=True),
        sg.MirrorWorld(seed=5, n_hosts=6, base_pages=60, perturb=False),
    ]
    for w in worlds:
        urls = []
        for h in w.hosts()[:4] + w.hosts()[-1:]:
            host = h["host"]
            p = w._host_params(host)
            urls += [
                f"https://{host}",
                f"https://{host}/about",
                f"https://{host}/blog/post-0",
                f"https://{host}/category/c0",
                f"https://{host}/category/c0?page=2",
            ]
            urls += [
                f"https://{host}" + p["product_path"](i) for i in range(4)
            ]
        urls = [u for u in urls if w.page_exists(u)]
        assert urls
        new = {u: w.render(u) for u in urls}
        saved = sg._np
        sg._np = None
        try:
            old = {u: w.render(u) for u in urls}
        finally:
            sg._np = saved
        assert new == old


def test_factored_regex_match_equivalence(spark):
    """r7 optimization pin: factored_regex (the execution-side regex with
    the shared leading '/' hoisted out of the alternation) must accept
    exactly the same strings as combined_regex — the frozen form the
    DuckDB oracle SQL interpolates. Checked with Python re over world
    anchor URLs + deterministic fuzz, and through Spark's actual Java
    rlike path for the two hot pattern sets."""
    import random
    import re

    import webcrawlerfull_spark.config as C
    import webcrawlerfull_spark.synthgen as sg
    from webcrawlerfull_spark.operators.parse_spans import spans_columns

    pattern_sets = [
        C.PATTERNS,
        C.PAGINATION_PATTERNS,
        C.CATEGORY_PRIORITY_PATTERNS,
        *C.DOMAIN_PATTERNS.values(),
    ]

    w = sg.World(seed=7, n_hosts=40, base_pages=200, cat_min=8, cat_span=4,
                 per_page_min=30, per_page_span=20, max_pag=6)
    urls: list[str] = []
    frontier = w.seeds()[:20]
    for _ in range(3):
        nxt = []
        for u in frontier[:40]:
            html = w.fetch(u)
            if html is None:
                continue
            k, _, r = spans_columns(html, u, u.split("://")[1].split("/")[0])
            for kk, rr in zip(k, r):
                if kk in ("link", "pagination"):
                    urls.append(rr)
                    nxt.append(rr)
        frontier = nxt
    assert len(urls) > 500

    rng = random.Random(1)
    alphabet = "abcXYZ019-_/=.?&#%"
    fuzz = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 90)))
        for _ in range(20000)
    ]
    corpus = urls + fuzz
    for pats in pattern_sets:
        ro = re.compile(C.combined_regex(pats))
        rn = re.compile(C.factored_regex(pats))
        for s in corpus:
            assert bool(ro.search(s)) == bool(rn.search(s)), (pats, s)

    # Java-side check through real rlike for the two hottest sets
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(s,) for s in corpus], "s string")
    for pats in (C.PATTERNS, C.PAGINATION_PATTERNS):
        old_n = df.where(F.col("s").rlike(C.combined_regex(pats))).count()
        new_n = df.where(F.col("s").rlike(C.factored_regex(pats))).count()
        assert old_n == new_n


def test_first_touch_products_matches_generic(spark):
    """r7 optimization pin: the packed HashAggregate specialization of
    the products-chain attribution must pick exactly the rows the
    generic struct-min first_touch picks, including multi-domain urls,
    rank ties across pages, and depth recovery."""
    from webcrawlerfull_spark.operators.attribution import (
        first_touch,
        first_touch_products,
    )

    rows = []
    # url seen by several pages/parsers across two domains
    for dom in ("d1", "d2"):
        rows += [
            # (page_url, host, domain, depth, queue_pos, url, parser, parser_rank)
            (f"{dom}/pg9", "h", dom, 2, 9, "u/x", "sequential", 3),
            (f"{dom}/pg3", "h", dom, 1, 3, "u/x", "config", 1),
            (f"{dom}/pg3b", "h", dom, 1, 7, "u/x", "simple", 0),
            (f"{dom}/pg1", "h", dom, 0, 1, "u/y", "ai", 2),
        ]
    rows += [("d1/pg0", "h", "d1", 3, 0, "u/z", "simple", 0)]
    m = spark.createDataFrame(
        rows,
        "page_url string, host string, domain string, depth int, "
        "queue_pos long, url string, parser string, parser_rank int",
    )
    for max_depth in (3, 1000):
        fast = first_touch_products(m, max_depth)
        assert fast is not None
        got = {
            (r["domain"], r["url"]): (r["parser"], r["depth"])
            for r in fast.collect()
        }
        ref = first_touch(m, ["queue_pos", "parser_rank"], ["domain", "url"])
        want = {
            (r["domain"], r["url"]): (r["parser"], r["depth"])
            for r in ref.collect()
        }
        assert got == want
    assert fast.schema["depth"].dataType.simpleString() == "int"
    # absurd depth -> generic fallback signal
    assert first_touch_products(m, 1 << 60) is None
