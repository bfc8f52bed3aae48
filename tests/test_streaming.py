"""Structured Streaming surface: run the builders against a file-source
stream (availableNow trigger → memory sink) and check the results match
the batch twins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.sessionize import sessionize
from accident_prediction_montreal_spark.sources.registry import TABLES
from accident_prediction_montreal_spark.streaming.windows import (
    dedup_within_watermark,
    read_events_stream,
    session_aggregates,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def event_fixture(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_stream"))
    rows = [
        # user 1: two sessions (gap > 30 min between event 2 and 3)
        (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 10:10:00", 1, "click", 2.0, "{}"),
        (3, "2024-01-01 11:00:01", 1, "view", 4.0, "{}"),
        # user 2: one event + an exact duplicate event_id
        (4, "2024-01-01 10:20:00", 2, "click", 8.0, "{}"),
        (4, "2024-01-01 10:20:00", 2, "click", 8.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts_s", "user_id", "event_type", "value", "props"]
    ).select(
        F.col("event_id").cast("long"),
        F.col("ts_s").cast("timestamp").alias("ts"),
        F.col("user_id").cast("long"),
        "event_type",
        F.col("value").cast("double"),
        "props",
    )
    df.select(*TABLES["events"].fieldNames()).write.mode("overwrite").parquet(path)
    return path


def _run_stream(spark, stream_df, name, mode):
    query = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_stream_counts(spark, event_fixture):
    # complete mode: with availableNow the watermark never passes the last
    # window, so append would emit nothing on a finite fixture.
    stream = read_events_stream(spark, event_fixture)
    assert stream.isStreaming
    out = _run_stream(spark, tumbling_counts(stream), "t_tumbling", "complete")
    rows = {(r["win_start"].hour, r["event_type"]): r["n"] for r in out.collect()}
    assert rows[(10, "click")] == 4  # duplicate included here (no dedup)
    assert rows[(11, "view")] == 1


def test_session_stream_matches_batch_twin(spark, event_fixture):
    stream = read_events_stream(spark, event_fixture)
    out = _run_stream(
        spark, session_aggregates(stream, gap="30 minutes"), "t_session", "complete"
    )
    got = {
        (r["user_id"], r["session_start"]): r["n_events"] for r in out.collect()
    }
    batch = spark.read.parquet(event_fixture)
    twin = sessionize(batch, gap_seconds=1800)
    expected = {
        (r["user_id"], r["session_start"]): r["n_events"] for r in twin.collect()
    }
    assert got == expected
    assert len(got) == 3


def test_dedup_within_watermark(spark, event_fixture):
    stream = read_events_stream(spark, event_fixture)
    out = _run_stream(spark, dedup_within_watermark(stream), "t_dedup", "append")
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [1, 2, 3, 4]  # duplicate event_id 4 dropped


def test_stream_static_enrichment(spark, event_fixture):
    from accident_prediction_montreal_spark.streaming.windows import enrich_with_dim

    dim = spark.createDataFrame([(1, "gold"), (2, "silver")], ["user_id", "tier"])
    stream = read_events_stream(spark, event_fixture)
    out = _run_stream(spark, enrich_with_dim(stream, dim), "t_enrich", "append")
    rows = out.collect()
    assert len(rows) == 5  # all events pass through
    tiers = {r["user_id"]: r["tier"] for r in rows}
    assert tiers[1] == "gold" and tiers[2] == "silver"


def test_stream_stream_join_pairs_every_event(spark, events_stream_fixture=None):
    import pyspark.sql.functions as F

    from accident_prediction_montreal_spark.streaming.windows import (
        stream_stream_join,
    )

    # batch semantics of the builder: same condition, bounded skew
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 10, 0), 1.0),
        (2, datetime(2024, 1, 1, 11, 0), 2.0),
    ]
    left = spark.createDataFrame(rows, ["event_id", "ts", "value"])
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 30), 10.0),   # within 1h -> match
            (2, datetime(2024, 1, 1, 12, 30), 20.0),   # 90min off -> dropped
        ],
        ["r_event_id", "r_ts", "r_value"],
    )
    out = stream_stream_join(left, right).select("event_id", "r_value").collect()
    assert [(r["event_id"], r["r_value"]) for r in out] == [(1, 10.0)]


def test_stream_stream_outer_null_emission(spark):
    """The registered left-outer query at sf0.001: odd-id rows emit with
    NULL r_value only after the clock batch pushes the watermark; the
    synthetic clock row itself stays withheld (never provably
    unmatched)."""
    from accident_prediction_montreal_spark.plans import REGISTRY

    out = REGISTRY["st_stream_stream_outer"].fn(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    ids = [r["event_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert all(i >= 0 for i in ids)  # synthetics excluded by construction
    for r in rows:
        if r["event_id"] % 2 == 0:
            assert r["r_value"] == r["value"] * 2
        else:
            assert r["r_value"] is None
    assert any(r["event_id"] % 2 == 1 for r in rows)  # outer rows DID flush


def test_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """The second availableNow run against the same checkpoint must
    process exactly the files that appeared after the first run: after
    run 1 the sink holds only batch-1 rows, after run 2 the union is
    exactly-once (no reprocessing of the committed file)."""
    import shutil

    from pyspark.sql import functions as F

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (tmp_path / "in").mkdir()

    a = spark.range(0, 100).select(F.col("id"), F.lit("a").alias("src"))
    b = spark.range(100, 250).select(F.col("id"), F.lit("b").alias("src"))
    a.coalesce(1).write.parquet(str(tmp_path / "stage_a"))
    b.coalesce(1).write.parquet(str(tmp_path / "stage_b"))

    def land(stage: str, name: str) -> None:
        src = next((tmp_path / stage).glob("*.parquet"))
        shutil.copyfile(src, tmp_path / "in" / name)

    def run_once() -> None:
        stream = spark.readStream.schema("id long, src string").parquet(in_dir)
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _id: df.write.mode("append").parquet(out_dir)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    land("stage_a", "f1.parquet")
    run_once()
    first = spark.read.parquet(out_dir)
    assert first.count() == 100 and first.filter("src = 'b'").count() == 0

    land("stage_b", "f2.parquet")
    run_once()
    final = spark.read.parquet(out_dir)
    # exactly-once: 250 distinct ids, no id seen twice
    assert final.count() == 250
    assert final.select("id").distinct().count() == 250
