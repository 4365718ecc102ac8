"""Delta-frontier scheduling mode (streaming/delta_frontier.py —
BENCH §7.5's mitigation for the O(|frontier|)-per-round schedule and
next-frontier cost; VERDICT r5 item 1).

The crawl-level invariants delta mode must share with merged mode:
drain to the SAME seen set, per-(host, round) budget respected, global
no-refetch, determinism under partitioning, crash/resume convergence,
and compaction transparency. Plus the layout-level properties: dense
per-host positions, cursor arithmetic, band pruning correctness."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from webcrawlerfull_spark.config import CrawlConfig
from webcrawlerfull_spark.sources.catalog import Catalog
from webcrawlerfull_spark.streaming import delta_frontier as dfq
from webcrawlerfull_spark.streaming.driver import crawl
from webcrawlerfull_spark.synthgen import World


def _snap(res):
    return (
        {r["url"] for r in res.seen.collect()},
        {(r["domain"], r["url"]) for r in res.products.collect()},
    )


def _crawl(spark, tmp, world, **kw):
    cat = Catalog(spark, tmp)
    cfg = CrawlConfig(max_depth=kw.pop("max_depth", 2), shuffle_partitions=8, **kw)
    return crawl(spark, world.seeds(), cfg, world, cat), cat


def test_delta_drains_to_parity_seen_set(spark, tmp_path_factory):
    """Delta mode visits exactly the URL set parity mode visits (when the
    per-domain cap never binds), and attributes the same product URLs."""
    world = World(seed=42, n_hosts=3, base_pages=40)
    res_p, _ = _crawl(spark, str(tmp_path_factory.mktemp("p")), world)
    res_d, cat = _crawl(
        spark, str(tmp_path_factory.mktemp("d")), world,
        politeness_budget=3, frontier_mode="delta",
    )
    seen_p, prod_p = _snap(res_p)
    seen_d, prod_d = _snap(res_d)
    assert seen_d == seen_p
    assert prod_d == prod_p
    assert res_d.rounds_run > res_p.rounds_run
    # global no-refetch: no URL ever scheduled twice across the run
    all_seen = cat.read_all("seen")
    assert all_seen.count() == all_seen.select("url").distinct().count()
    # per-(host, round) budget respected on the scheduled slices
    for rnd in cat.committed_rounds("scheduled"):
        per_host = (
            cat.read_round("scheduled", rnd)
            .groupBy("host")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        assert all(r["n"] <= 3 for r in per_host)


def test_delta_matches_merged_mode_outcome(spark, tmp_path_factory):
    """Same budget, both modes: identical final seen/product sets and
    identical TOTAL fetched (the per-round split may differ — delta mode
    is per-host FIFO across insertion rounds, merged mode re-ranks)."""
    world = World(seed=7, n_hosts=4, base_pages=50)
    res_m, _ = _crawl(
        spark, str(tmp_path_factory.mktemp("m")), world,
        politeness_budget=5, use_bloom=True,
    )
    res_d, _ = _crawl(
        spark, str(tmp_path_factory.mktemp("d2")), world,
        politeness_budget=5, use_bloom=True, frontier_mode="delta",
    )
    assert _snap(res_d) == _snap(res_m)
    tot_m = res_m.lineage.agg(F.sum("fetched")).collect()[0][0]
    tot_d = res_d.lineage.agg(F.sum("fetched")).collect()[0][0]
    assert tot_d == tot_m


def test_delta_deterministic_under_parallelism(spark, tmp_path_factory):
    """North-rule determinism for the delta layout: identical seen rounds,
    lineage counters and products at shuffle_partitions 2 and 16."""
    world = World(seed=77, n_hosts=4, base_pages=50)
    results = []
    for parts in (2, 16):
        cat = Catalog(spark, str(tmp_path_factory.mktemp(f"par{parts}")))
        res = crawl(
            spark, world.seeds(),
            CrawlConfig(
                max_depth=2, politeness_budget=5, use_bloom=True,
                compact_every=2, frontier_mode="delta",
                shuffle_partitions=parts, salt_partitions=parts,
            ),
            world, cat,
        )
        results.append(res)
    a, b = results
    assert a.rounds_run == b.rounds_run > 2
    assert {(r["url"], r["round"]) for r in a.seen.collect()} == {
        (r["url"], r["round"]) for r in b.seen.collect()
    }
    cols = ["round", "frontier_size", "fetched", "parsed", "products"]
    assert sorted(tuple(r[c] for c in cols) for r in a.lineage.collect()) == (
        sorted(tuple(r[c] for c in cols) for r in b.lineage.collect())
    )
    pc = ["domain", "url", "parser", "depth", "round"]
    assert sorted(tuple(r[c] for c in pc) for r in a.products.collect()) == (
        sorted(tuple(r[c] for c in pc) for r in b.products.collect())
    )


def test_delta_resume_converges(spark, tmp_path_factory):
    """Kill after 2 rounds, resume: equal to the uninterrupted run, no
    URL fetched twice across the boundary; re-invoking a finished crawl
    is a no-op (the cursor-drained resume branch)."""
    world = World(seed=42, n_hosts=4, base_pages=40)
    kw = dict(politeness_budget=4, use_bloom=True, frontier_mode="delta")
    ref, _ = _crawl(spark, str(tmp_path_factory.mktemp("ref")), world, **kw)
    tmp = str(tmp_path_factory.mktemp("kill"))
    cat = Catalog(spark, tmp)
    cfg = CrawlConfig(max_depth=2, shuffle_partitions=8, **kw)
    crawl(spark, world.seeds(), cfg, world, cat, max_rounds=2)
    res = crawl(spark, world.seeds(), cfg, world, cat)
    assert _snap(res) == _snap(ref)
    dup = res.seen.groupBy("url").count().where(F.col("count") > 1)
    assert dup.count() == 0
    again = crawl(spark, world.seeds(), cfg, world, cat)
    assert again.rounds_run == 0
    assert _snap(again) == _snap(ref)


_DELTA_WINDOWS = {
    # round-1 write order in delta mode: scheduled -> seen_bloom ->
    # documents -> mentions -> page_stats -> products -> frontier_q(r=2)
    # -> frontier_cursor(r=2) -> lineage (commit marker)
    "after_scheduled": ("scheduled",),
    "after_documents": ("scheduled", "seen_bloom", "documents"),
    "after_frontier_q": (
        "scheduled", "seen_bloom", "documents", "mentions", "page_stats",
        "products", "frontier_q",
    ),
}


@pytest.mark.parametrize("window", sorted(_DELTA_WINDOWS))
def test_delta_mid_round_crash_window(spark, tmp_path_factory, window):
    """Every partial-write window inside a delta-mode round (including a
    landed frontier_q delta whose cursor update never committed) resumes
    to the uninterrupted run's state."""
    world = World(seed=42, n_hosts=4, base_pages=40)
    kw = dict(politeness_budget=4, use_bloom=True, frontier_mode="delta")
    ref, _ = _crawl(spark, str(tmp_path_factory.mktemp("wref")), world, **kw)
    root = str(tmp_path_factory.mktemp(f"w_{window}"))
    cat = Catalog(spark, root)
    cfg = CrawlConfig(max_depth=2, shuffle_partitions=8, **kw)
    crawl(spark, world.seeds(), cfg, world, cat, max_rounds=2)
    present = _DELTA_WINDOWS[window]
    shutil.rmtree(cat._dir("lineage", 1))
    shutil.rmtree(cat._dir("frontier_cursor", 2), ignore_errors=True)
    for t in (
        "seen_bloom", "documents", "mentions", "page_stats", "products",
        "frontier_q",
    ):
        if t not in present:
            shutil.rmtree(cat._dir(t, 2 if t == "frontier_q" else 1),
                          ignore_errors=True)
    assert cat.max_committed_round() == 0
    res = crawl(spark, world.seeds(), cfg, world, cat)
    assert _snap(res) == _snap(ref)
    dup = res.seen.groupBy("url").count().where(F.col("count") > 1)
    assert dup.count() == 0


def test_delta_compaction_transparent(spark, tmp_path_factory):
    """Queue compaction (dir-count-triggered) folds cursor deltas to
    latest-per-host and reclaims consumed queue rows without changing
    the crawl."""
    world = World(seed=7, n_hosts=4, base_pages=50)
    res_a, _ = _crawl(
        spark, str(tmp_path_factory.mktemp("nc")), world,
        politeness_budget=5, use_bloom=True, frontier_mode="delta",
    )
    res_b, cat = _crawl(
        spark, str(tmp_path_factory.mktemp("c")), world,
        politeness_budget=5, use_bloom=True, frontier_mode="delta",
        compact_every=2, frontier_compact_dirs=2,
    )
    assert _snap(res_b) == _snap(res_a)
    # compaction actually ran: cursor rounds folded + one row per host
    cur = cat.read_all_with_round("frontier_cursor")
    per_host = cur.groupBy("host", "r").count().groupBy("host").count()
    # after the final fold rounds may have appended again, but the
    # latest-per-host read must still be consistent: all drained
    live = dfq.read_cursor(cat, up_to_round=10_000)
    drained = live.where(F.col("consumed") < F.col("next_pos")).count()
    assert drained == 0
    assert per_host.count() > 0


def test_positions_dense_and_banded(spark):
    """assign_positions: dense per-host positions offset past next_pos,
    politeness-ordered within the batch, band = pos // band_size."""
    rows = [
        {
            "url": f"https://h{i % 2}.x/p/{i}", "host": f"h{i % 2}.x",
            "domain": f"https://h{i % 2}.x", "depth": 1 + (i % 3),
            "priority": i % 2, "discovery_seq": i, "salt_bucket": 0,
            "round": 1,
        }
        for i in range(20)
    ]
    df = spark.createDataFrame(rows)
    cursor = spark.createDataFrame(
        [{"host": "h0.x", "consumed": 2, "next_pos": 7}], schema=dfq.CURSOR
    )
    out = dfq.assign_positions(df, cursor, band_size=4).collect()
    for host, off in (("h0.x", 7), ("h1.x", 0)):
        sl = sorted(
            (r for r in out if r["host"] == host),
            key=lambda r: (r["depth"], r["priority"], r["discovery_seq"], r["url"]),
        )
        assert [r["pos"] for r in sl] == list(range(off, off + len(sl)))
        assert all(r["band"] == r["pos"] // 4 for r in sl)


def test_needed_bands_and_pruned_read(spark, tmp_path_factory):
    """needed_bands covers each pending host's read window; a pruned
    candidate read equals the unpruned one."""
    cursor = spark.createDataFrame(
        [
            {"host": "a", "consumed": 0, "next_pos": 30},
            {"host": "b", "consumed": 13, "next_pos": 14},
            {"host": "c", "consumed": 5, "next_pos": 5},  # drained
        ],
        schema=dfq.CURSOR,
    )
    bands = dfq.needed_bands(cursor, budget=5, band_size=5)
    # a: [0,5) -> band 0; b: [13,18) -> bands 2,3; c: drained
    assert bands == [0, 2, 3]

    cat = Catalog(spark, str(tmp_path_factory.mktemp("q")))
    rows = [
        {
            "url": f"https://{h}/p/{p}", "host": h, "domain": f"https://{h}",
            "depth": 1, "priority": 0, "discovery_seq": p, "salt_bucket": 0,
            "round": 0, "pos": p, "band": p // 5,
        }
        for h, n in (("a", 30), ("b", 14), ("c", 5))
        for p in range(n)
    ]
    cat.write_round(
        spark.createDataFrame(rows, schema=dfq.QUEUE), "frontier_q", 0,
        partition_by=["band"],
    )
    cand = dfq.read_candidates(cat, cursor, budget=5, band_size=5, round_id=0)
    got = {(r["host"], r["pos"]) for r in cand.collect()}
    assert got == {("a", p) for p in range(5)} | {("b", 13)}


def test_band_size_below_budget_rejected():
    """ADVICE r6: frontier_band_size < politeness_budget would make a
    round's per-host window span >2 band partitions — middle-band rows
    would be skipped then deleted by compaction. Must fail loudly."""
    cfg = CrawlConfig(politeness_budget=5, frontier_band_size=3)
    with pytest.raises(ValueError, match="frontier_band_size"):
        dfq.band_size_for(cfg)
    # band_size == budget and band_size > budget are both fine
    assert dfq.band_size_for(
        CrawlConfig(politeness_budget=5, frontier_band_size=5)
    ) == 5
    assert dfq.band_size_for(CrawlConfig(politeness_budget=5)) == 5


def test_resume_frontier_mode_mismatch_raises(spark, tmp_path_factory):
    """ADVICE r6: resuming a catalog under the other frontier_mode must
    raise (each direction) instead of silently reporting the crawl
    finished with pending work still queued."""
    world = World(seed=42, n_hosts=3, base_pages=40)
    # merged-mode catalog, interrupted mid-run
    merged_dir = str(tmp_path_factory.mktemp("mm"))
    cat_m = Catalog(spark, merged_dir)
    cfg_m = CrawlConfig(max_depth=3, politeness_budget=3, shuffle_partitions=8)
    crawl(spark, world.seeds(), cfg_m, world, cat_m, max_rounds=2)
    with pytest.raises(ValueError, match="resume mode mismatch"):
        crawl(
            spark, world.seeds(),
            CrawlConfig(
                max_depth=3, politeness_budget=3, shuffle_partitions=8,
                frontier_mode="delta",
            ),
            world, Catalog(spark, merged_dir),
        )
    # delta-mode catalog, interrupted mid-run
    delta_dir = str(tmp_path_factory.mktemp("dd"))
    cat_d = Catalog(spark, delta_dir)
    cfg_d = CrawlConfig(
        max_depth=3, politeness_budget=3, shuffle_partitions=8,
        frontier_mode="delta",
    )
    crawl(spark, world.seeds(), cfg_d, world, cat_d, max_rounds=2)
    with pytest.raises(ValueError, match="resume mode mismatch"):
        crawl(
            spark, world.seeds(),
            CrawlConfig(max_depth=3, politeness_budget=3, shuffle_partitions=8),
            world, Catalog(spark, delta_dir),
        )


def test_delta_all_disposed_round(spark, tmp_path_factory):
    """Inherited r6 bug (found in r7): a round whose WHOLE candidate
    slice is disposed (dup-insert already fetched -> empty scheduled
    write) made Observation.get raise — AQE's empty-relation propagation
    dropped the observed candidates subtree from the final write plan
    and the metrics row came back schema-less. The seed-42 / 4-host /
    budget-3 world hits exactly that at round 10. The crawl must run to
    drain and match parity mode's seen/product sets."""
    world = World(seed=42, n_hosts=4, base_pages=40)
    res_d, _ = _crawl(
        spark, str(tmp_path_factory.mktemp("ad")), world,
        max_depth=3, politeness_budget=3, frontier_mode="delta",
    )
    res_p, _ = _crawl(
        spark, str(tmp_path_factory.mktemp("ap")), world, max_depth=3
    )
    assert _snap(res_d) == _snap(res_p)
    assert res_d.rounds_run > res_p.rounds_run
