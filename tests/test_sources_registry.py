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
    # Event time is TIMESTAMP_NTZ engine-wide: naive micros, exactly what
    # the parquet stores and what DuckDB oracles compute on, and — unlike
    # any conversion-expression wrapper — pushdown-transparent (the r3
    # testdata regeneration to timestamp[us] was caught by this pin's
    # predecessor; test_plan_shapes.py::test_scan_pushdown guards the
    # pushdown half of the contract).
    assert dict(load_table(spark, "events", SF).dtypes)["ts"] == "timestamp_ntz"


def test_load_table_exact_micros(spark):
    # Value half of the timestamp contract: the loaded column holds the
    # EXACT stored micros (no session-TZ shift, no unit confusion — the
    # r3 bug decoded micros as nanos and compressed time 1000x).
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from accident_prediction_montreal_spark.sources.registry import epoch_us

    tbl = pq.read_table(f"{SF}/events.parquet", columns=["event_id", "ts"])
    want = {
        eid.as_py(): us.as_py()
        for eid, us in zip(
            tbl.column("event_id")[:5], pc.cast(tbl.column("ts"), "int64")[:5]
        )
    }
    df = load_table(spark, "events", SF)
    got_rows = (
        df.select("event_id", epoch_us(df["ts"], dict(df.dtypes)["ts"]).alias("us"))
        .filter(df["event_id"].isin(list(want)))
        .collect()
    )
    got = {r["event_id"]: r["us"] for r in got_rows}
    assert got == want


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
