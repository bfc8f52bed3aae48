"""Source registry, parquet cache, and the driver-contract registry."""

from __future__ import annotations

import pytest

from accident_prediction_montreal_spark.plans import REGISTRY
from accident_prediction_montreal_spark.sources.cache import parquet_cache
from accident_prediction_montreal_spark.sources.registry import TABLES, load_table

SF = "/root/testdata/sf0.001"


def test_load_table_schema_contract(spark):
    for name in ("lineitem", "events", "documents", "embeddings"):
        df = load_table(spark, name, SF)
        assert df.columns == TABLES[name].fieldNames()
    # events.ts arrives as TIMESTAMP(NANOS); loader must deliver timestamp
    assert dict(load_table(spark, "events", SF).dtypes)["ts"] == "timestamp"


def test_load_table_unknown_name(spark):
    with pytest.raises(KeyError):
        load_table(spark, "nope", SF)


def test_parquet_cache_roundtrip(spark, tmp_path):
    calls = []

    def compute():
        calls.append(1)
        return spark.range(5).withColumnRenamed("id", "x")

    p = str(tmp_path / "cached")
    first = parquet_cache(spark, p, compute)
    assert first.count() == 5 and len(calls) == 1
    second = parquet_cache(spark, p, compute)
    assert second.count() == 5 and len(calls) == 1  # reloaded, not recomputed
    third = parquet_cache(spark, p, compute, overwrite=True)
    assert third.count() == 5 and len(calls) == 2


def test_registry_contract():
    assert len(REGISTRY) >= 50
    for name, spec in REGISTRY.items():
        assert callable(spec.fn), name
        assert spec.description, name


def test_entry_module_contract(spark):
    import __spark_entry__ as mod

    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(osql) <= set(qs)
    df = mod.entry(spark)
    assert df.count() > 0
