"""Cross-round document dedup wired into the crawl driver (VERDICT r4
item 5): the interleaved-docs pipeline dedups CONTENT across rounds the
way the seen-state dedups URLs — exact and near dups are excluded from
the parser cascade, lineage counts them, link discovery is unaffected,
and the state is resume-safe.

World double: synthgen.MirrorWorld — every odd product page renders its
even sibling's HTML verbatim (exact dup) or with one appended sentence
(near dup)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawlerfull_spark.config import CrawlConfig
from webcrawlerfull_spark.operators.textdedup import fingerprint
from webcrawlerfull_spark.sources.catalog import Catalog
from webcrawlerfull_spark.streaming.driver import crawl
from webcrawlerfull_spark.synthgen import MirrorWorld

BASE = dict(
    max_depth=3, shuffle_partitions=8, doc_dedup=True,
    # production rows-per-band (4) at a quarter of the hash width —
    # the tests' worlds are tiny and 64 salted hashes/shingle dominate
    dedup_k=16, dedup_bands=4,
)


def _verdicts(cat):
    return (
        cat.read_all("doc_dedup_state")
        .where(F.col("kind") == "verdict")
        .select("doc_id", "status")
    )


def test_exact_mirror_dedup_counts_and_products(spark, tmp_path_factory):
    world = MirrorWorld(seed=42, n_hosts=2, base_pages=30, fail_rate=0.0)
    seeds = world.seeds()

    cat = Catalog(spark, str(tmp_path_factory.mktemp("dd")))
    res = crawl(spark, seeds, CrawlConfig(**BASE), world, cat)

    # ground truth: batch-exact dedup over ALL ok docs' text — total
    # kept must equal the number of distinct contents, independent of
    # which round each duplicate arrived in
    docs = cat.read_all("documents").where(F.col("status") == "ok")
    texts = docs.select(
        "doc_id", F.concat_ws(" ", "texts").alias("_text")
    )
    n_ok = texts.count()
    n_unique = texts.select(fingerprint(F.col("_text")).alias("fp")).distinct().count()
    assert n_unique < n_ok  # the mirror really produced duplicates

    v = _verdicts(cat)
    by_status = {r["status"]: r["n"] for r in v.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert by_status.get("kept", 0) == n_unique
    assert by_status.get("exact_dup", 0) == n_ok - n_unique
    assert "near_dup" not in by_status  # verbatim mirror: exact only

    # lineage counter matches, and SOME dups were caught across rounds
    # (depth-3 odd products whose even twin was fetched at depth 2)
    lin = {r["round"]: r["docs_deduped"] for r in res.lineage.collect()}
    assert sum(lin.values()) == n_ok - n_unique
    assert any(n > 0 for rnd, n in lin.items() if rnd > 0)

    # the crawl graph is unaffected: same URLs fetched as a no-dedup run,
    # and the product KEY SET matches (mirror content carries the twin's
    # mentions, so dedup drops only duplicate mention rows)
    cat_ref = Catalog(spark, str(tmp_path_factory.mktemp("nodd")))
    ref = crawl(
        spark, seeds,
        CrawlConfig(max_depth=3, shuffle_partitions=8, doc_dedup=False),
        world, cat_ref,
    )
    assert {r["url"] for r in res.seen.collect()} == {
        r["url"] for r in ref.seen.collect()
    }
    keys = lambda r: {(x["domain"], x["url"]) for x in r.products.collect()}  # noqa: E731
    assert keys(res) == keys(ref)


def test_near_dup_mirror_cross_round(spark, tmp_path_factory):
    """perturb=True: the mirror appends one sentence, so fingerprints
    differ but most MinHash bands survive — cross-round mirrors must be
    flagged near_dup (the incremental contract is new-vs-prior; within-
    round near dups are batch-mode minhash_candidate_pairs' job).

    Ground truth is built from the docs' own EXTRACTED TEXT (the thing
    the dedup hashes — URL heuristics are wrong here because distinct
    URLs can extract identical text, e.g. home-page aliases '/' vs ''):
    content class = the exact-dedup fingerprint (md5 of normalized
    text); the near-dup pairing is text ↔ text + the mirror note."""
    import hashlib
    import re
    from collections import defaultdict

    world = MirrorWorld(
        seed=42, n_hosts=2, base_pages=30, fail_rate=0.0, perturb=True
    )
    cat = Catalog(spark, str(tmp_path_factory.mktemp("ndd")))
    res = crawl(spark, world.seeds(), CrawlConfig(**BASE), world, cat)

    # verdict round = the round the doc was fetched (documents table)
    docs = (
        cat.read_all_with_round("documents")
        .where(F.col("status") == "ok")
        .select(
            "doc_id",
            F.col("r").alias("round"),
            F.concat_ws(" ", "texts").alias("text"),
        )
    )
    rows = _verdicts(cat).join(docs, "doc_id").collect()
    assert rows

    def fp(text):
        # = functions.textstats.fingerprint (md5, lowercased, ws-normalized)
        return hashlib.md5(
            re.sub(r"\s+", " ", text).lower().encode()
        ).hexdigest()

    info = {
        r["doc_id"]: (fp(r["text"]), r["round"], r["status"], r["text"])
        for r in rows
    }
    by_cls = defaultdict(list)
    for d, (c, rnd, st, _) in info.items():
        by_cls[c].append((rnd, st, d))

    # keep-first per content class: exactly one non-exact_dup member,
    # and it is fetched in the class's earliest round
    rep_by_cls = {}
    for c, members in by_cls.items():
        reps = [m for m in members if m[1] != "exact_dup"]
        assert len(reps) == 1, (c, members)
        assert reps[0][0] == min(m[0] for m in members), (c, members)
        rep_by_cls[c] = reps[0]

    # cross-round near-dup, both directions: a class rep whose note-pair
    # partner class has a rep KEPT in an EARLIER round (only kept docs'
    # bands enter the state) must be flagged near_dup. The mirror's text
    # is its twin's text + the appended note span, so the partner class
    # is computable exactly from the text itself.
    NOTE = " mirrored variant note."
    n_cross = 0
    for d, (c, rnd, st, text) in info.items():
        if st == "exact_dup":
            continue  # only class reps reach the near/kept decision
        base = text[: -len(NOTE)] if text.endswith(NOTE) else text + NOTE
        partner = rep_by_cls.get(fp(base))
        if partner is not None and partner[1] == "kept" and partner[0] < rnd:
            assert st == "near_dup", (d, st, partner)
            n_cross += 1

    assert n_cross > 0
    n_dropped = sum(1 for _, (_, _, st, _) in info.items() if st != "kept")
    assert sum(r["docs_deduped"] for r in res.lineage.collect()) == n_dropped


def test_doc_dedup_crash_window(spark, tmp_path_factory):
    """The crash window the dedup stage ADDS to the round write order
    (scheduled → seen_bloom → documents → doc_dedup_state → mentions →
    … → lineage): kill right after round 1's doc_dedup_state write and
    resume — the partial verdicts/state delta past the round-0 commit
    marker must be discarded (drop_rounds_after covers TABLES, which now
    includes doc_dedup_state) and redone identically."""
    import shutil

    world = MirrorWorld(seed=42, n_hosts=2, base_pages=30, fail_rate=0.0)
    seeds = world.seeds()
    cfg = CrawlConfig(**BASE)

    cat_ref = Catalog(spark, str(tmp_path_factory.mktemp("cwref")))
    ref = crawl(spark, seeds, cfg, world, cat_ref)

    root = str(tmp_path_factory.mktemp("cwkill"))
    cat = Catalog(spark, root)
    crawl(spark, seeds, cfg, world, cat, max_rounds=2)
    # rewind to "crashed after doc_dedup_state, before mentions" in round 1
    for t in ("mentions", "page_stats", "products", "lineage"):
        shutil.rmtree(cat._dir(t, 1), ignore_errors=True)
    shutil.rmtree(cat._dir("frontier", 2), ignore_errors=True)
    assert cat.max_committed_round() == 0
    assert cat.has_round("doc_dedup_state", 1)  # the partial state exists

    res = crawl(spark, seeds, cfg, world, cat)
    assert _v(cat) == _v(cat_ref)
    lin = lambda r: sorted(  # noqa: E731
        (x["round"], x["fetched"], x["products"], x["docs_deduped"])
        for x in r.lineage.collect()
    )
    assert lin(res) == lin(ref)


def _v(c):
    return {(r["doc_id"], r["status"]) for r in _verdicts(c).collect()}


def test_doc_dedup_resume_safe(spark, tmp_path_factory):
    """Kill after 2 rounds of a budgeted dedup crawl, resume: verdicts,
    lineage counters, and products converge to the uninterrupted run."""
    world = MirrorWorld(seed=42, n_hosts=2, base_pages=30, fail_rate=0.0)
    seeds = world.seeds()
    cfg = CrawlConfig(
        **BASE, politeness_budget=25, use_bloom=True, compact_every=2
    )

    cat_ref = Catalog(spark, str(tmp_path_factory.mktemp("ddref")))
    ref = crawl(spark, seeds, cfg, world, cat_ref)

    cat = Catalog(spark, str(tmp_path_factory.mktemp("ddkill")))
    crawl(spark, seeds, cfg, world, cat, max_rounds=2)
    res = crawl(spark, seeds, cfg, world, cat)

    def _v(c):
        return {
            (r["doc_id"], r["status"]) for r in _verdicts(c).collect()
        }

    assert _v(cat) == _v(cat_ref)
    lin = lambda r: sorted(  # noqa: E731
        (x["round"], x["fetched"], x["products"], x["docs_deduped"])
        for x in r.lineage.collect()
    )
    assert lin(res) == lin(ref)
    keys = lambda r: {(x["domain"], x["url"]) for x in r.products.collect()}  # noqa: E731
    assert keys(res) == keys(ref)


def test_fast_family_matches_md5_verdicts(spark):
    """The fast MinHash family (xxhash64 + universal hashing — the crawl
    default after the md5 family measured 375 s/101k docs, BENCH §8)
    must classify the same corpus the same way as the md5 family:
    exact dups, clear near-dups (one appended sentence) and clearly
    distinct docs all get identical verdicts."""
    from webcrawlerfull_spark.operators.textdedup import (
        dedup_signatures,
        incremental_dedup_delta,
    )

    # NON-repetitive base: repeated text collapses the distinct-shingle
    # set, dropping the near-dup Jaccard to ~0.94 where a 4-band LSH
    # legitimately misses for one hash family and hits for another
    # (observed: crc32 family missed, md5 family hit — neither wrong).
    # ~600 distinct tokens put J at ~0.99+ so both families detect with
    # P(miss) ~1e-9, making the cross-family verdict equality a real
    # invariant instead of a coin flip.
    base = " ".join(
        f"sentence {i} describes product alpha{i} with price {i * 7} "
        f"and category beta{i % 13}"
        for i in range(60)
    )
    rows = [
        ("d0", base),
        ("d1", base),                               # exact dup of d0
        ("d2", base + " one extra closing sentence."),   # near dup
        ("d3", "entirely different text about spark shuffle partitions "
               "and adaptive query execution plans " * 8),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    state_rows = [("dstate", base + " a different appended note.")]
    state_docs = spark.createDataFrame(state_rows, "doc_id string, text string")

    verdicts = {}
    for fam in ("md5", "fast"):
        state = incremental_dedup_delta(
            state_docs, None, k=16, bands=4, family=fam
        )
        out = incremental_dedup_delta(
            docs, state, k=16, bands=4, family=fam
        )
        verdicts[fam] = {
            r["doc_id"]: r["status"]
            for r in out.where(F.col("kind") == "verdict").collect()
        }
    assert verdicts["md5"] == verdicts["fast"]
    assert verdicts["fast"]["d1"] == "exact_dup"
    assert verdicts["fast"]["d0"] == "near_dup"   # vs the state doc
    assert verdicts["fast"]["d3"] == "kept"


def test_dedup_state_scheme_guard(spark, tmp_path_factory):
    """Resuming a doc-dedup crawl under a different MinHash family (or
    k/bands) must fail loudly: band hashes are family-specific, and the
    state cannot be rebuilt (prior text is gone), so a silent mismatch
    would miss every cross-round near-dup."""
    world = MirrorWorld(seed=42, n_hosts=2, base_pages=30, fail_rate=0.0)
    tmp = str(tmp_path_factory.mktemp("scheme"))
    cat = Catalog(spark, tmp)
    kw = dict(
        max_depth=3, shuffle_partitions=8, doc_dedup=True,
        dedup_k=16, dedup_bands=4,
    )
    crawl(
        spark, world.seeds(),
        CrawlConfig(**kw, dedup_family="fast"),
        world, cat, max_rounds=2,
    )
    with pytest.raises(ValueError, match="scheme"):
        crawl(
            spark, world.seeds(),
            CrawlConfig(**kw, dedup_family="md5"),
            world, Catalog(spark, tmp),
        )
    # same scheme resumes fine
    res = crawl(
        spark, world.seeds(),
        CrawlConfig(**kw, dedup_family="fast"),
        world, Catalog(spark, tmp),
    )
    assert res.rounds_run >= 1


def test_kernel_matches_expression_fast_family(spark):
    """The numpy signatures kernel (the crawl hot path) and the JVM
    expression form of the 'fast' family must produce BYTE-IDENTICAL
    fingerprints and band hashes — same crc32 base, same universal-hash
    streams, same Java-regex whitespace semantics (space-only trim,
    ASCII \\s, trailing empties kept). Corpus includes the edge shapes:
    short docs (<3 tokens), tab/newline whitespace, empty/space-only
    text, repeated templated pages."""
    from webcrawlerfull_spark.operators.textdedup import dedup_signatures

    rows = [
        ("a", "The quick Brown fox JUMPS over the lazy dog tonight"),
        ("b", "two tokens"),
        ("c", "one"),
        ("d", ""),
        ("e", "   "),
        ("f", "\ttab\tseparated\ttokens\tacross\tthe\tline\t"),
        ("g", "line\nbreaks\nand  double  spaces   here and there"),
        ("h", ("template page body " * 40) + "unique tail 1"),
        ("i", ("template page body " * 40) + "unique tail 2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    expr = {
        r["doc_id"]: (r["_fp"], list(r["_bands"]))
        for r in dedup_signatures(
            docs, "doc_id", "text", 16, 4, family="fast"
        ).collect()
    }
    kern = {
        r["doc_id"]: (r["_fp"], list(r["_bands"]))
        for r in dedup_signatures(
            docs, "doc_id", "text", 16, 4, family="fast", kernel=True
        ).collect()
    }
    assert kern == expr
    # near-dup templates share most bands; distinct docs share none
    shared_hi = set(expr["h"][1]) & set(expr["i"][1])
    assert len(shared_hi) >= 2
    assert not set(expr["a"][1]) & set(expr["g"][1])
