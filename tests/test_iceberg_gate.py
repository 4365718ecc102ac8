"""IcebergCatalog feature gate: the real writeTo/MERGE code path exists
with the same interface as the parquet Catalog, and refuses cleanly when
the Iceberg runtime is not configured (this sandbox has no jar)."""

from __future__ import annotations

import inspect

import pytest

from webcrawlerfull_spark.sources.catalog import (
    Catalog,
    IcebergCatalog,
    iceberg_available,
)


def test_gate_refuses_without_runtime(spark):
    assert not iceberg_available(spark, "local")
    with pytest.raises(RuntimeError, match="iceberg"):
        IcebergCatalog(spark)


def test_interface_parity():
    """Every public Catalog method the driver uses exists on
    IcebergCatalog with the same signature — the constructor swap is
    real, not aspirational."""
    driver_surface = [
        "write_round", "has_round", "read_round", "committed_rounds",
        "read_all", "read_all_with_round", "read_bloom", "compact",
        "max_committed_round", "drop_rounds_after", "destroy",
    ]
    for name in driver_surface:
        a = inspect.signature(getattr(Catalog, name))
        b = inspect.signature(getattr(IcebergCatalog, name))
        assert a == b, (name, a, b)
    assert IcebergCatalog.TABLES == Catalog.TABLES
