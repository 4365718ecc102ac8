"""Incremental cross-round dedup: round k+1 documents classify against
round k's COMPACT state (fingerprints + band set — no text) without
rescanning prior rounds' text."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawlerfull_spark.operators import textdedup as TD


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_classification(spark):
    prior = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog every day"),
            (2, "spark shuffles partition data across the cluster nodes"),
        ],
    )
    fps, band_set = TD.dedup_state(prior, k=16, bands=4)
    # state is text-free — the structural no-rescan property
    assert set(fps.columns) == {"fp"}
    assert set(band_set.columns) == {"band_id", "band_hash"}

    new = _docs(
        spark,
        [
            (10, "the quick brown fox jumps over the lazy dog every day"),  # exact
            (11, "the  QUICK brown fox jumps over the lazy dog every day"),  # ws/case
            (12, "the quick brown fox jumps over the lazy dog every"),       # near
            (13, "a totally unrelated document about gardening and tulips"),
            (14, "a totally unrelated document about gardening and tulips"),  # batch dup
        ],
    )
    got = {
        r["doc_id"]: r["status"]
        for r in TD.incremental_dedup(new, fps, band_set, k=16, bands=4).collect()
    }
    assert got[10] == "exact_dup"
    assert got[11] == "exact_dup"     # fingerprint is ws/case-normalized
    assert got[12] == "near_dup"
    assert got[13] == "kept"
    assert got[14] == "exact_dup"     # within-batch keep-first (lower id wins)


def test_incremental_chains_across_rounds(spark):
    """State accumulates kept docs only; a round-3 dup of a round-2 KEPT
    doc is caught, and a dup of a round-2 DROPPED doc is caught via its
    round-1 original."""
    r1 = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta eta theta")])
    fps, bands = TD.dedup_state(r1, k=16, bands=4)

    r2 = _docs(
        spark,
        [
            (20, "alpha beta gamma delta epsilon zeta eta theta"),  # dropped (dup of 1)
            (21, "completely new words in the second round corpus"),
        ],
    )
    st2 = TD.incremental_dedup(r2, fps, bands, k=16, bands=4)
    kept2 = r2.join(
        st2.where(F.col("status") == "kept").select("doc_id"), "doc_id"
    )
    f2, b2 = TD.dedup_state(kept2, k=16, bands=4)
    fps, bands = fps.unionByName(f2).distinct(), bands.unionByName(b2).distinct()

    r3 = _docs(
        spark,
        [
            (30, "completely new words in the second round corpus"),  # dup of KEPT 21
            (31, "alpha beta gamma delta epsilon zeta eta theta"),    # dup of DROPPED 20
            (32, "yet another brand new document for round three"),
        ],
    )
    got = {
        r["doc_id"]: r["status"]
        for r in TD.incremental_dedup(r3, fps, bands, k=16, bands=4).collect()
    }
    assert got[30] == "exact_dup"
    assert got[31] == "exact_dup"
    assert got[32] == "kept"


def test_incremental_no_state_round_zero(spark):
    """Round 0: no prior state — only within-batch exact collapse."""
    r0 = _docs(
        spark,
        [
            (1, "one two three four five six seven"),
            (2, "one two three four five six seven"),
            (3, "something else entirely different here"),
        ],
    )
    got = {
        r["doc_id"]: r["status"]
        for r in TD.incremental_dedup(r0, None, None, k=16, bands=4).collect()
    }
    assert got == {1: "kept", 2: "exact_dup", 3: "kept"}
