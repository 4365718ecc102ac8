"""Public API — the reference's FastAPI control plane re-expressed as
plain functions over the catalog (SURVEY.md §2.10: no web server; the
engine entry point is spark-submit).

- ``crawl_domains``      ≈ POST /crawl/        (server/src/main.py:49-74)
- ``task_status``        ≈ GET /task/{id}      (server/src/main.py:76-105)
- ``get_urls``           ≈ GET /urls/{id}/{domain} (server/src/main.py:150-208)
- ``save_json``/``save_csv`` ≈ the optional file sinks S9/S10
  (worker/src/db/storage.py:189-225)
- ``simplify_domain``    ≈ Storage._simplify_domain S12
  (worker/src/db/storage.py:52-65): registered-domain + suffix with '_',
  via a public-suffix-lite two-label heuristic (tldextract is not in
  this container; the common two-level suffixes are table-driven)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from webcrawlerfull_spark.config import CrawlConfig
from webcrawlerfull_spark.sources.catalog import Catalog
from webcrawlerfull_spark.streaming.driver import CrawlResult, crawl
from webcrawlerfull_spark.synthgen import World

# Multi-label public suffixes for the S12 registered-domain split — a
# curated subset of the Public Suffix List (publicsuffix.org, public
# data; tldextract ships the full list but is not in this container).
# Table-driven: extending coverage = adding rows here; the match is
# longest-suffix-first (two-label entries tried before the one-label
# fallback). Includes the PSL's geographic jp entries (e.g. nagoya.jp).
TWO_LEVEL_SUFFIXES = [
    # uk / au / nz / in / za
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "plc.uk",
    "ltd.uk", "sch.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz", "school.nz",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "gov.in", "res.in",
    "co.za", "org.za", "net.za", "ac.za", "gov.za", "web.za",
    # jp (incl. geographic public suffixes)
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    "nagoya.jp", "yokohama.jp", "osaka.jp", "kyoto.jp", "sapporo.jp",
    "sendai.jp", "kobe.jp", "kawasaki.jp", "kitakyushu.jp", "aichi.jp",
    "hokkaido.jp", "okinawa.jp", "fukuoka.jp", "saitama.jp", "chiba.jp",
    # kr / tw / hk / sg / th / id / my / ph / vn / cn
    "co.kr", "or.kr", "ne.kr", "go.kr", "re.kr", "pe.kr", "ac.kr",
    "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "org.hk", "net.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
    "co.th", "or.th", "ac.th", "go.th", "in.th",
    "co.id", "or.id", "net.id", "ac.id", "web.id", "go.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    # americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "org.mx", "gob.mx", "edu.mx", "net.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "nom.co",
    # europe / middle east
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr",
    "com.pl", "net.pl", "org.pl", "edu.pl", "waw.pl",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "kiev.ua",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.ae", "org.ae", "net.ae", "com.sa", "com.eg",
]


def crawl_domains(
    spark: SparkSession,
    domains: list[str],
    max_depth: int,
    catalog_path: str,
    world: World | None = None,
    task_id: str = "task-0",
    **cfg_kwargs,
) -> CrawlResult:
    """E1 — run a crawl over the given seed domains."""
    cfg = CrawlConfig(max_depth=max_depth, task_id=task_id, **cfg_kwargs)
    world = world or World()
    cat = Catalog(spark, catalog_path)
    return crawl(spark, domains, cfg, world, cat)


def task_status(spark: SparkSession, catalog_path: str, task_id: str) -> dict:
    """E2 — latest lineage row = progress; empty next frontier = done."""
    cat = Catalog(spark, catalog_path)
    lineage = cat.read_all("lineage")
    if lineage is None:
        return {"state": "PENDING", "task_id": task_id}
    rows = (
        lineage.where(F.col("task_id") == task_id)
        .orderBy(F.col("round").desc())
        .limit(1)
        .collect()
    )
    if not rows:
        return {"state": "PENDING", "task_id": task_id}
    last = rows[0].asDict()
    done = not cat.has_round("frontier", last["round"] + 1) or cat.read_round(
        "frontier", last["round"] + 1
    ).isEmpty()
    return {
        "state": "SUCCESS" if done else "PROGRESS",
        "task_id": task_id,
        **last,
    }


def get_urls(
    spark: SparkSession, catalog_path: str, task_id: str, domain: str
) -> DataFrame:
    """E3 — one table read replaces the Redis->Mongo two-tier fallback."""
    cat = Catalog(spark, catalog_path)
    products = cat.read_all("products")
    if products is None:
        return spark.createDataFrame([], "task_id string, domain string, url string")
    return (
        products.where(
            (F.col("task_id") == task_id) & (F.col("domain") == domain)
        )
        .select("task_id", "domain", "url")
        .dropDuplicates(["url"])
    )


def save_json(df: DataFrame, path: str) -> None:
    """S9 — append-mode JSON sink (flag-gated in the reference)."""
    df.write.mode("append").json(path)


def save_csv(df: DataFrame, path: str) -> None:
    """S10 — append-mode CSV sink with header row."""
    df.write.mode("append").option("header", True).csv(path)


def simplify_domain(url: Column) -> Column:
    """S12 — '<registered>_<suffix-with-_>' storage key, e.g.
    https://shop.example.co.uk/x -> 'example_co_uk'."""
    host = F.lower(F.parse_url(url, F.lit("HOST")))
    two_level = "|".join(s.replace(".", r"\.") for s in TWO_LEVEL_SUFFIXES)
    # registered domain = label before the suffix; suffix = 2-level if in
    # the table else the final label
    m2 = F.regexp_extract(host, rf"([^.]+)\.({two_level})$", 0)
    reg2 = F.regexp_extract(host, rf"([^.]+)\.({two_level})$", 1)
    suf2 = F.regexp_extract(host, rf"([^.]+)\.({two_level})$", 2)
    reg1 = F.regexp_extract(host, r"([^.]+)\.([^.]+)$", 1)
    suf1 = F.regexp_extract(host, r"([^.]+)\.([^.]+)$", 2)
    reg = F.when(m2 != "", reg2).otherwise(reg1)
    suf = F.when(m2 != "", suf2).otherwise(suf1)
    return F.when(
        (reg != "") & (suf != ""),
        F.concat(reg, F.lit("_"), F.replace(suf, F.lit("."), F.lit("_"))),
    ).otherwise(F.replace(host, F.lit("."), F.lit("_")))
