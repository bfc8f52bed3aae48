"""Month-shard backfill runner: shard-invariance, resume semantics, and
per-shard session factory (reference mains/main_gen_match.py:20-75
pattern)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from accident_prediction_montreal_spark.pipeline.backfill import (
    backfill_month_shards,
    month_keys,
)


def _events(spark):
    rows = [
        (1, datetime(2024, 1, 5, 10), "click", 1.5),
        (2, datetime(2024, 1, 20, 11), "view", 2.0),
        (3, datetime(2024, 2, 2, 9), "click", 4.0),
        (4, datetime(2024, 3, 30, 23), "view", 8.0),
        (5, datetime(2024, 3, 31, 1), "click", 16.0),
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])


def test_month_keys(spark):
    assert month_keys(_events(spark)) == ["2024-01", "2024-02", "2024-03"]


def test_backfill_matches_direct_agg_and_resumes(spark, tmp_path):
    ev = _events(spark)
    out = str(tmp_path / "rollup")
    calls = []

    def compute_shard(s, mk):
        calls.append(mk)
        y, m = int(mk[:4]), int(mk[5:7])
        ny, nm = (y + 1, 1) if m == 12 else (y, m + 1)
        lo = F.lit(f"{y:04d}-{m:02d}-01 00:00:00").cast("timestamp")
        hi = F.lit(f"{ny:04d}-{nm:02d}-01 00:00:00").cast("timestamp")
        return (
            ev.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("value_sum"))
        )

    months = month_keys(ev)
    combined = backfill_month_shards(spark, out, months, compute_shard)
    got = {
        (r["month_key"], r["event_type"]): (r["n"], r["value_sum"])
        for r in combined.collect()
    }
    # Shard-invariance: the union of shards equals the direct (month, type)
    # aggregation of the whole table.
    direct = (
        ev.groupBy(F.date_format("ts", "yyyy-MM").alias("mk"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("value_sum"))
        .collect()
    )
    want = {(r["mk"], r["event_type"]): (r["n"], r["value_sum"]) for r in direct}
    assert got == want
    assert calls == months

    # Resume: every shard has _SUCCESS, so a second run computes nothing.
    calls.clear()
    again = backfill_month_shards(spark, out, months, compute_shard)
    assert calls == []
    assert again.count() == len(want)

    # Partition pruning: a month_key filter must prune to one shard dir.
    pruned = combined.filter(F.col("month_key") == "2024-01")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "month_key" in plan
    assert pruned.count() == sum(1 for (mk, _t) in want if mk == "2024-01")


def test_backfill_session_factory_per_pending_shard(spark, tmp_path):
    ev = _events(spark)
    out = str(tmp_path / "rollup_factory")
    factory_calls = []

    def factory():
        factory_calls.append(1)
        return spark  # same session; the factory owns lifecycle semantics

    def compute_shard(s, mk):
        assert s is spark
        return ev.filter(F.date_format("ts", "yyyy-MM") == mk).groupBy(
            "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))

    months = month_keys(ev)
    backfill_month_shards(spark, out, months, compute_shard, session_factory=factory)
    assert len(factory_calls) == len(months)

    # Completed shards never trigger the factory again.
    factory_calls.clear()
    backfill_month_shards(spark, out, months, compute_shard, session_factory=factory)
    assert factory_calls == []


def test_backfill_subset_months_excludes_stale_shards(spark, tmp_path):
    """A later call with a SUBSET of months must not return shards written
    by earlier runs for other months."""
    ev = _events(spark)
    out = str(tmp_path / "subset")

    def compute_shard(s, mk):
        return ev.filter(F.date_format("ts", "yyyy-MM") == mk).groupBy(
            "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))

    all_months = month_keys(ev)
    backfill_month_shards(spark, out, all_months, compute_shard)
    only_jan = backfill_month_shards(spark, out, ["2024-01"], compute_shard)
    assert {r["month_key"] for r in only_jan.collect()} == {"2024-01"}


def test_backfill_custom_partition_col_and_schema_evolution(spark, tmp_path):
    # Phase 1 writes v1-schema shards for January; phase 2 "resumes" over
    # all months with a v2 schema that adds a column — the _SUCCESS skip
    # must keep phase-1 shards untouched, and the mergeSchema read must
    # surface their missing column as NULL.
    ev = _events(spark)
    out = str(tmp_path / "evo")

    def v1(s, mk):
        y, m = int(mk[:4]), int(mk[5:7])
        return ev.filter((F.year("ts") == y) & (F.month("ts") == m)).groupBy(
            "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))

    def v2(s, mk):
        assert mk != "2024-01", "resume violation: recomputed a finished shard"
        y, m = int(mk[:4]), int(mk[5:7])
        return (
            ev.filter((F.year("ts") == y) & (F.month("ts") == m))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("vsum"))
        )

    backfill_month_shards(spark, out, ["2024-01"], v1, partition_col="mk")
    combined = backfill_month_shards(
        spark, out, ["2024-01", "2024-02", "2024-03"], v2,
        partition_col="mk", merge_schema=True,
    )
    rows = {(r["mk"], r["event_type"]): r for r in combined.collect()}
    assert rows[("2024-01", "click")]["vsum"] is None  # v1 shard, evolved col NULL
    assert rows[("2024-03", "click")]["vsum"] == 16.0
    assert rows[("2024-03", "view")]["vsum"] == 8.0
    assert sum(r["n"] for r in rows.values()) == 5


def test_cachereg_generation_swap(spark):
    from accident_prediction_montreal_spark import cachereg

    a = spark.range(10).persist()
    a.count()
    cachereg.register("t.site", a)
    assert a.storageLevel.useMemory
    b = spark.range(20).persist()
    b.count()
    cachereg.register("t.site", b)  # swaps generations
    assert not a.storageLevel.useMemory  # previous generation released
    assert b.storageLevel.useMemory
    assert "t.site" in cachereg.sites()
    cachereg.release_all()
    assert not b.storageLevel.useMemory
    assert cachereg.sites() == []
