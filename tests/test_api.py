"""Control-plane API (E1/E2/E3 equivalents) + S9/S10/S12."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from webcrawlerfull_spark import api
from webcrawlerfull_spark.synthgen import World


@pytest.fixture(scope="module")
def crawled(spark, tmp_path_factory):
    world = World(seed=42, n_hosts=3, base_pages=40)
    path = str(tmp_path_factory.mktemp("api_cat"))
    res = api.crawl_domains(
        spark, world.seeds(), max_depth=2, catalog_path=path,
        world=world, task_id="t-api", shuffle_partitions=8,
    )
    return world, path, res


def test_task_status_success(spark, crawled):
    _world, path, _res = crawled
    st = api.task_status(spark, path, "t-api")
    assert st["state"] == "SUCCESS"
    assert st["fetched"] > 0


def test_get_urls(spark, crawled):
    world, path, res = crawled
    domain = world.seeds()[0]
    urls = api.get_urls(spark, path, "t-api", domain)
    got = {r["url"] for r in urls.collect()}
    expected = {
        r["url"] for r in res.products.where(F.col("domain") == domain).collect()
    }
    assert got == expected and got


def test_json_csv_sinks(spark, crawled, tmp_path):
    _world, path, res = crawled
    api.save_json(res.products, str(tmp_path / "j"))
    api.save_csv(res.products.select("task_id", "domain", "url"), str(tmp_path / "c"))
    assert spark.read.json(str(tmp_path / "j")).count() == res.products.count()
    assert (
        spark.read.option("header", True).csv(str(tmp_path / "c")).count()
        == res.products.count()
    )


def test_simplify_domain(spark):
    cases = {
        "https://shop.example.co.uk/x": "example_co_uk",
        "https://www.store.example.com/y?a=1": "example_com",
        "https://foo.bar.com.au": "bar_com_au",
        "https://single.io/": "single_io",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"]).withColumn(
        "key", api.simplify_domain(F.col("url"))
    )
    got = {r["url"]: r["key"] for r in df.collect()}
    assert got == cases
