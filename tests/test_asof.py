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


def test_asof_null_value_on_matched_row(spark):
    """A NULL value column on the matched right row must come back NULL
    (pandas merge_asof semantics) — not a value carried from a farther
    right row. Exercises the single-struct payload carry in every
    direction."""
    left = _df(spark, [(1, "2024-01-01 10:00:00", 1)], ["k", "ts_s", "lid"])
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 5.0, "old"),
         (1, "2024-01-01 09:30:00", None, "match_b"),   # backward match
         (1, "2024-01-01 10:30:00", None, "match_f"),   # forward match
         (1, "2024-01-01 11:00:00", 9.0, "new")],
        "k long, ts_s string, v double, tag string",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "v", "tag")
    b = asof_join(left, right, by=["k"], direction="backward").first()
    assert b["tag_right"] == "match_b" and b["v_right"] is None
    f = asof_join(left, right, by=["k"], direction="forward").first()
    assert f["tag_right"] == "match_f" and f["v_right"] is None
    n = asof_join(left, right, by=["k"], direction="nearest").first()
    assert n["tag_right"] == "match_b" and n["v_right"] is None


class TestRangeJoin:
    """Bucketed point-in-interval join vs the naive theta-join twin."""

    def test_matches_naive_and_covers_boundaries(self, spark):
        from pyspark.sql import functions as F

        from accident_prediction_montreal_spark.operators.rangejoin import (
            point_in_interval_join,
            point_in_interval_join_naive,
        )

        points = spark.createDataFrame(
            [(i, f"2024-01-01 {h:02d}:{m:02d}:00") for i, (h, m) in enumerate(
                [(0, 0), (1, 59), (2, 0), (3, 30), (5, 59), (6, 0), (23, 59)]
            )],
            "pid long, ts_s string",
        ).select("pid", F.col("ts_s").cast("timestamp_ntz").alias("ts"))
        # 2h windows at 0/6/12/18h, plus one ending exactly on a cell
        # boundary (04:00-06:00): a 06:00 point must NOT join it.
        ivs = spark.createDataFrame(
            [(k, f"2024-01-01 {s:02d}:00:00", f"2024-01-01 {e:02d}:00:00")
             for k, (s, e) in enumerate([(0, 2), (4, 6), (6, 8), (18, 20)])],
            "wid long, s string, e string",
        ).select(
            "wid",
            F.col("s").cast("timestamp_ntz").alias("start_ts"),
            F.col("e").cast("timestamp_ntz").alias("end_ts"),
        )
        got = point_in_interval_join(
            points, ivs, bucket_seconds=2 * 3600
        ).select("pid", "wid")
        want = point_in_interval_join_naive(points, ivs).select("pid", "wid")
        assert sorted(got.collect()) == sorted(want.collect())
        rows = set(tuple(r) for r in got.collect())
        assert (0, 0) in rows      # inclusive start
        assert (5, 1) not in rows  # exists? pid5=06:00 vs wid1 ends 06:00
        assert (5, 2) in rows      # 06:00 starts wid2 exactly

    def test_long_intervals_still_exact(self, spark):
        from pyspark.sql import functions as F

        from accident_prediction_montreal_spark.operators.rangejoin import (
            point_in_interval_join,
            point_in_interval_join_naive,
        )

        # duration (9h) > bucket (2h): fan-out grows but results stay
        # identical to the naive join.
        points = spark.createDataFrame(
            [(i, f"2024-01-01 {h:02d}:30:00") for i, h in enumerate(range(0, 24, 3))],
            "pid long, ts_s string",
        ).select("pid", F.col("ts_s").cast("timestamp_ntz").alias("ts"))
        ivs = spark.createDataFrame(
            [(0, "2024-01-01 01:00:00", "2024-01-01 10:00:00"),
             (1, "2024-01-01 08:00:00", "2024-01-01 17:00:00")],
            "wid long, s string, e string",
        ).select(
            "wid",
            F.col("s").cast("timestamp_ntz").alias("start_ts"),
            F.col("e").cast("timestamp_ntz").alias("end_ts"),
        )
        got = point_in_interval_join(points, ivs, bucket_seconds=2 * 3600)
        want = point_in_interval_join_naive(points, ivs)
        assert sorted(got.select("pid", "wid").collect()) == sorted(
            want.select("pid", "wid").collect()
        )

    def test_rejects_bad_bucket(self, spark):
        import pytest as _pytest

        from accident_prediction_montreal_spark.operators.rangejoin import (
            point_in_interval_join,
        )

        df = spark.range(1).selectExpr("timestamp_ntz'2024-01-01' AS ts")
        iv = spark.range(1).selectExpr(
            "timestamp_ntz'2024-01-01' AS start_ts",
            "timestamp_ntz'2024-01-02' AS end_ts",
        )
        with _pytest.raises(ValueError):
            point_in_interval_join(df, iv, bucket_seconds=0)


class TestAsofForward:
    def test_forward_matches_and_ties(self, spark):
        from pyspark.sql import functions as F

        from accident_prediction_montreal_spark.operators.asof import asof_join

        left = spark.createDataFrame(
            [(1, 100), (1, 250), (1, 400)], "k long, ts long"
        ).select("k", F.timestamp_seconds("ts").alias("ts"))
        right = spark.createDataFrame(
            [(1, 100, "a"), (1, 300, "b")], "k long, ts long, v string"
        ).select("k", F.timestamp_seconds("ts").alias("ts"), "v")
        out = {
            r["ts"].second + r["ts"].minute * 60: r["v_right"]
            for r in asof_join(left, right, by=["k"], direction="forward").collect()
        }
        assert out[100] == "a"   # equal ts matches forward
        assert out[250] == "b"   # next state
        assert out[400] is None  # nothing after

    def test_forward_tolerance_nulls_far_future(self, spark):
        from pyspark.sql import functions as F

        from accident_prediction_montreal_spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, 0)], "k long, ts long").select(
            "k", F.timestamp_seconds("ts").alias("ts")
        )
        right = spark.createDataFrame([(1, 500, "x")], "k long, ts long, v string").select(
            "k", F.timestamp_seconds("ts").alias("ts"), "v"
        )
        near = asof_join(left, right, by=["k"], direction="forward",
                         tolerance_seconds=600).collect()[0]
        far = asof_join(left, right, by=["k"], direction="forward",
                        tolerance_seconds=100).collect()[0]
        assert near["v_right"] == "x"
        assert far["v_right"] is None

    def test_rejects_unknown_direction(self, spark):
        import pytest as _pytest

        from accident_prediction_montreal_spark.operators.asof import asof_join

        df = spark.range(1).selectExpr("id AS k", "timestamp_seconds(id) AS ts")
        with _pytest.raises(ValueError, match="direction"):
            asof_join(df, df, by=["k"], direction="sideways")


def test_ddl_hostile_value_column_names(spark):
    """r9 regression pin: the left-side null payload literal is built from
    the schema OBJECT, not the dtypes() DDL string — value-column names
    containing DDL metacharacters (space, comma, colon, angle bracket)
    must flow through every direction unharmed."""
    hostile = "v col, with:meta<chars>"
    left = _df(spark, [
        (1, "2024-01-01 10:00:00", 100),
        (2, "2024-01-01 10:00:00", 200),   # no right rows -> null payload
    ], ["user_id", "ts_s", "lid"])
    right = _df(spark, [
        (1, "2024-01-01 09:59:00", 7.0),
    ], ["user_id", "ts_s", "v"]).withColumnRenamed("v", hostile)
    # The only right row sits 1 min BEFORE left 100: backward and nearest
    # match it, forward correctly finds nothing at-or-after.
    for direction, want in (("backward", 7.0), ("forward", None), ("nearest", 7.0)):
        out = {
            r["lid"]: r
            for r in asof_join(
                left, right, by=["user_id"], direction=direction,
                tolerance_seconds=3600,
            ).collect()
        }
        assert out[100][f"{hostile}_right"] == want, direction
        assert out[200][f"{hostile}_right"] is None, direction
