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


def test_allow_longest_match_precedence(spark):
    """RFC 9309 §2.2.2: longest matching rule decides; allow wins a
    length tie; no match = allowed."""
    from webcrawlerfull_spark.functions.robots import blocked_by_rules

    txt = (
        "User-agent: *\n"
        "Disallow: /\n"
        "Allow: /public/\n"
        "Disallow: /public/secret/\n"
        "Allow: /p\n"
        "Disallow: /p\n"  # same length: allow wins the tie
    )
    rules_df = parse_robots(
        spark.createDataFrame([("h", txt)], ["host", "robots_txt"])
    )
    paths = [
        ("/", True),                      # Disallow / (len 1) only match
        ("/anything", True),              # Disallow / wins
        ("/public/", False),              # Allow /public/ (8) > / (1)
        ("/public/page", False),
        ("/public/secret/x", True),       # Disallow /public/secret/ longest
        ("/p", False),                    # tie /p vs /p -> allow
        ("/pq", False),                   # tie again at len 2
    ]
    df = spark.createDataFrame(
        [("h", p) for p, _ in paths], ["host", "path"]
    ).join(rules_df, "host")
    got = {
        r["path"]: r["blocked"]
        for r in df.select(
            "path",
            blocked_by_rules(F.col("path"), F.col("rules")).alias("blocked"),
        ).collect()
    }
    assert got == dict(paths)


def test_crawl_allow_subtree_end_to_end(spark, tmp_path_factory):
    """A host that disallows /category/ but allows /category/c0 must
    fetch the c0 subtree and nothing else under /category/ — the case
    the prefix-only gate gated wrong (Disallow would have blocked c0
    too)."""
    world = World(seed=42, n_hosts=4, base_pages=40)
    seeds = world.seeds()
    host0 = seeds[0].split("/")[2]
    cfg = CrawlConfig(max_depth=3, shuffle_partitions=8)

    cat_free = Catalog(spark, str(tmp_path_factory.mktemp("allow_free")))
    free = crawl(spark, seeds, cfg, world, cat_free)
    free_seen = {r["url"] for r in free.seen.collect()}
    c0 = f"https://{host0}/category/c0"
    other_cats = {
        u for u in free_seen
        if u.startswith(f"https://{host0}/category/")
        and not u.split("?")[0].rstrip("/") == c0
    }
    assert c0 in free_seen and other_cats  # the world exercises both sides

    robots = parse_robots(
        spark.createDataFrame(
            [(host0, "User-agent: *\nDisallow: /category/\nAllow: /category/c0")],
            ["host", "robots_txt"],
        )
    )
    cat = Catalog(spark, str(tmp_path_factory.mktemp("robots_allow")))
    res = crawl(spark, seeds, cfg, world, cat, robots=robots)
    seen = {r["url"] for r in res.seen.collect()}
    assert c0 in seen                      # allowed subtree fetched
    assert not (seen & other_cats), sorted(seen & other_cats)[:5]
    # other hosts unaffected
    other_hosts = {s.split("/")[2] for s in seeds[1:]}
    assert {u.split("/")[2] for u in seen} >= other_hosts


def _py_robots_oracle(txt: str):
    """Independent pure-Python RFC 9309 model (written against the RFC,
    not the engine code): returns (rules, blocked(path)) for the '*'
    group. Consecutive UA lines form one header; blanks/comments don't
    split a header; empty Disallow/Allow values are no-ops; longest
    matching rule wins, allow wins length ties."""
    rules = []
    active = False
    in_ua = False
    for raw in txt.split("\n"):
        line = raw.strip()
        low = line.lower()
        if low.startswith("user-agent:"):
            is_star = line[11:].strip() == "*"
            active = (in_ua and active) or is_star
            in_ua = True
            continue
        if line == "" or line.startswith("#"):
            continue  # insignificant: header run survives
        if low.startswith("disallow:"):
            v = line[9:].strip()
            if active and v:
                rules.append((v, False))
        elif low.startswith("allow:"):
            v = line[6:].strip()
            if active and v:
                rules.append((v, True))
        in_ua = False

    def blocked(path: str) -> bool:
        best_allow = max(
            (len(p) for p, a in rules if a and path.startswith(p)), default=None
        )
        best_dis = max(
            (len(p) for p, a in rules if not a and path.startswith(p)),
            default=None,
        )
        if best_dis is None:
            return False
        return best_allow is None or best_allow < best_dis

    return rules, blocked


def test_robots_fuzz_vs_python_oracle(spark):
    """200 random robots files × 8 paths each: the columnar parser +
    longest-match gate must agree with the independent Python RFC model
    on every (file, path) pair."""
    import random

    from webcrawlerfull_spark.functions.robots import blocked_by_rules

    rng = random.Random(909)
    prefixes = ["/", "/a", "/a/", "/a/b", "/ab", "/b/", "/b/c/", "/Cart", "/x?y"]
    uas = ["User-agent: *", "User-agent: googlebot", "user-AGENT:   *"]
    fillers = ["", "# comment", "Sitemap: https://x/s.xml", "Crawl-delay: 2"]
    files = []
    for fid in range(200):
        lines = []
        for _ in range(rng.randint(1, 14)):
            kind = rng.random()
            if kind < 0.3:
                lines.append(rng.choice(uas))
            elif kind < 0.55:
                lines.append(f"Disallow: {rng.choice(prefixes + [''])}")
            elif kind < 0.75:
                lines.append(f"Allow: {rng.choice(prefixes + [''])}")
            else:
                lines.append(rng.choice(fillers))
        files.append((str(fid), "\n".join(lines)))

    paths = ["/", "/a", "/a/", "/a/b/c", "/ab", "/b/c/d", "/Cart", "/zz"]
    df = parse_robots(spark.createDataFrame(files, ["host", "robots_txt"]))
    path_df = spark.createDataFrame([(p,) for p in paths], ["path"])
    got = {
        (r["host"], r["path"]): (list(map(tuple, r["rules"])), r["blocked"])
        for r in df.crossJoin(path_df)
        .select(
            "host", "path", "rules",
            blocked_by_rules(F.col("path"), F.col("rules")).alias("blocked"),
        )
        .collect()
    }
    mismatches = []
    for host, txt in files:
        exp_rules, blocked = _py_robots_oracle(txt)
        for p in paths:
            g_rules, g_blocked = got[(host, p)]
            if g_rules != exp_rules or g_blocked != blocked(p):
                mismatches.append((host, p, txt, g_rules, exp_rules, g_blocked))
    assert not mismatches, mismatches[:3]


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
