"""As-of join: hand-computed matches, tolerance, equal-ts inclusivity."""

from __future__ import annotations

from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.asof import asof_join


def _df(spark, rows, cols):
    df = spark.createDataFrame(rows, cols)
    return df.withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")


def test_asof_basic_and_equal_ts(spark):
    left = _df(spark, [
        (1, "2024-01-01 10:00:00", 100),
        (1, "2024-01-01 10:05:00", 101),
        (2, "2024-01-01 10:00:00", 200),
    ], ["user_id", "ts_s", "lid"])
    right = _df(spark, [
        (1, "2024-01-01 09:59:00", 7.0),
        (1, "2024-01-01 10:05:00", 8.0),   # equal ts -> inclusive match
        (3, "2024-01-01 09:00:00", 9.0),
    ], ["user_id", "ts_s", "v"])
    out = {r["lid"]: r for r in asof_join(left, right, by=["user_id"]).collect()}
    assert out[100]["v_right"] == 7.0
    assert out[101]["v_right"] == 8.0   # ts == matches (right sorts first)
    assert out[200]["v_right"] is None  # no right rows for user 2


def test_asof_tolerance(spark):
    left = _df(spark, [(1, "2024-01-01 10:00:00", 1)], ["user_id", "ts_s", "lid"])
    right = _df(spark, [(1, "2024-01-01 09:00:00", 5.0)], ["user_id", "ts_s", "v"])
    loose = asof_join(left, right, by=["user_id"], tolerance_seconds=7200).first()
    tight = asof_join(left, right, by=["user_id"], tolerance_seconds=60).first()
    assert loose["v_right"] == 5.0
    assert tight["v_right"] is None  # match older than tolerance nulled
