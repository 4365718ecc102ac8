"""Single-process golden BFS crawler — faithful port of the reference's
crawl control flow (/root/reference/worker/src/tasks.py:376-584), run
against the same deterministic synthetic world as the Spark engine.

Produces the golden artifacts the engine must match (SURVEY.md §5.2):
  - fetch schedule: ordered list of (domain, depth, url) actually
    scheduled (marked visited before fetch, tasks.py:438-440)
  - final visited (URL-seen) set per domain
  - product set with first-found parser attribution per domain
  - parser_stats aggregates (tasks.py:328-358 shape)

Canonicalizations shared with the engine (FIXTURES.md §5): find_urls
ordering and sequential sampling — see oracle/refparser.py docstring.
The batch-of-10 structure (tasks.py:433-435) is kept because it affects
which URLs the discovery-time visited check sees (tasks.py:491-493) and
therefore the 500-cap contents.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlparse

from webcrawlerfull_spark import config as C
from webcrawlerfull_spark.oracle import refparser as rp
from webcrawlerfull_spark.synthgen import World

_CATEGORY_RES = [re.compile(p) for p in C.CATEGORY_PRIORITY_PATTERNS]

_PARSERS = {
    "simple": rp.simple_parse,
    "config": rp.config_parse,
    "ai": rp.ai_parse,
}


@dataclass
class DomainResult:
    domain: str
    fetch_schedule: list[tuple[int, str]] = field(default_factory=list)  # (depth, url)
    visited: set[str] = field(default_factory=set)
    products: set[str] = field(default_factory=set)
    first_found_by: dict[str, str] = field(default_factory=dict)
    parser_stats: dict[str, dict] = field(default_factory=dict)
    # instrumentation (records WHEN the existing attribution/loop state
    # happened — no behavioral change): frontier size entering each
    # depth, per-url depth of first product attribution, per-depth
    # parse-failure counts. Used to derive the expected per-round
    # lineage the engine's e2e entry is hash-checked against.
    frontier_sizes: list[int] = field(default_factory=list)
    first_found_depth: dict[str, int] = field(default_factory=dict)
    failed_by_depth: dict[int, int] = field(default_factory=dict)


def crawl_domain(world: World, domain: str, max_depth: int) -> DomainResult:
    res = DomainResult(domain=domain)
    parser_stats = {
        p: {"total": 0, "domains": set(), "unique": 0} for p in C.PARSER_NAMES
    }
    url_first_found_by: dict[str, str] = {}
    visited: set[str] = set()
    urls_to_visit: list[str] = [domain]
    domain_product_urls: set[str] = set()
    domain_netloc = urlparse(domain).netloc
    current_depth = 0

    while current_depth < max_depth and urls_to_visit:
        res.frontier_sizes.append(len(urls_to_visit))
        next_depth_urls: list[str] = []
        batch_size = 10
        for i in range(0, len(urls_to_visit), batch_size):
            batch = [u for u in urls_to_visit[i : i + batch_size] if u not in visited]
            for url in batch:
                visited.add(url)  # mark BEFORE fetch, tasks.py:438-440
                res.fetch_schedule.append((current_depth, url))
            for url in batch:
                html = world.fetch(url)
                if html is None:
                    # important-URL retry (tasks.py:594-601) is deterministic
                    # here: same result, give up
                    res.failed_by_depth[current_depth] = (
                        res.failed_by_depth.get(current_depth, 0) + 1
                    )
                    continue
                # --- parser cascade (tasks.py:607-633) ---
                product_urls: set[str] = set()
                for parser_name in C.PARSER_CASCADE:
                    urls = _PARSERS[parser_name](html, url)
                    if urls:
                        parser_stats[parser_name]["total"] += len(urls)
                        parser_stats[parser_name]["domains"].add(domain_netloc)
                        for found in urls:
                            url_first_found_by.setdefault(found, parser_name)
                            res.first_found_depth.setdefault(found, current_depth)
                        product_urls.update(urls)
                        if len(product_urls) >= C.CASCADE_EARLY_EXIT:
                            break
                if product_urls:
                    domain_product_urls.update(product_urls)
                    # --- sequential generation (tasks.py:474-488) ---
                    if len(product_urls) >= C.SEQGEN_MIN_PRODUCTS:
                        seq = rp.generate_sequential_urls(product_urls)
                        if seq:
                            parser_stats["sequential"]["total"] += len(seq)
                            parser_stats["sequential"]["domains"].add(domain_netloc)
                            for found in seq:
                                url_first_found_by.setdefault(found, "sequential")
                                res.first_found_depth.setdefault(found, current_depth)
                            domain_product_urls.update(seq)
                # --- next-depth discovery (tasks.py:639-643,491-493) ---
                if current_depth < max_depth - 1:
                    for next_url in rp.find_urls(html, url, domain_netloc):
                        if next_url not in visited and next_url not in next_depth_urls:
                            next_depth_urls.append(next_url)

        current_depth += 1
        # priority reorder + 500-cap, ONLY when over the cap (tasks.py:513-529)
        if len(next_depth_urls) > C.FRONTIER_CAP_PER_DOMAIN:
            priority = [
                u for u in next_depth_urls if any(r.search(u) for r in _CATEGORY_RES)
            ]
            others = [u for u in next_depth_urls if u not in set(priority)]
            urls_to_visit = (priority + others)[: C.FRONTIER_CAP_PER_DOMAIN]
        else:
            urls_to_visit = next_depth_urls

    for parser_name in C.PARSER_NAMES:
        parser_stats[parser_name]["unique"] = sum(
            1 for p in url_first_found_by.values() if p == parser_name
        )
    res.visited = visited
    res.products = domain_product_urls
    res.first_found_by = url_first_found_by
    res.parser_stats = parser_stats
    return res


def crawl(world: World, domains: list[str], max_depth: int) -> dict[str, DomainResult]:
    """Domains sequentially, like the reference task loop (tasks.py:197-228)."""
    return {d: crawl_domain(world, d, max_depth) for d in domains}


def aggregate_stats(results: dict[str, DomainResult]) -> dict:
    """Cross-domain roll-up, shape of aggregate_results_locally
    (tasks.py:289-361)."""
    agg = {p: {"total": 0, "unique": 0, "domains": set()} for p in C.PARSER_NAMES}
    urls_count = {}
    for d, r in results.items():
        urls_count[d] = len(r.products)
        for p in C.PARSER_NAMES:
            agg[p]["total"] += r.parser_stats[p]["total"]
            agg[p]["unique"] += r.parser_stats[p]["unique"]
            agg[p]["domains"].update(r.parser_stats[p]["domains"])
    return {
        "urls_count": urls_count,
        "total_urls": sum(urls_count.values()),
        "parser_stats": {
            p: {
                "total": agg[p]["total"],
                "unique": agg[p]["unique"],
                "domains": len(agg[p]["domains"]),
            }
            for p in C.PARSER_NAMES
        },
    }
