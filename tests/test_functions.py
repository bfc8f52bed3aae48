"""Unit tests for expression factories (hand-computed expectations,
FIXTURES.md Part A §A8 micro-fixtures)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from accident_prediction_montreal_spark.functions.cyclic import cyclic_encode
from accident_prediction_montreal_spark.functions.geo import haversine_meters
from accident_prediction_montreal_spark.functions.money import davg, dsum
from accident_prediction_montreal_spark.functions.solar import solar_elevation
from accident_prediction_montreal_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)


def test_haversine_known_distance(spark):
    # Montréal (45.5017, -73.5673) → Québec City (46.8139, -71.2080):
    # great-circle ≈ 233 km (R = 6371 km).
    df = spark.createDataFrame(
        [(45.5017, -73.5673, 46.8139, -71.2080)], ["lat1", "lon1", "lat2", "lon2"]
    )
    d = df.select(haversine_meters("lat1", "lon1", "lat2", "lon2").alias("d")).first()["d"]
    assert abs(d - 233_000) < 2_000


def test_haversine_zero_and_symmetry(spark):
    df = spark.createDataFrame([(45.5, -73.6)], ["lat", "lon"])
    d0 = df.select(haversine_meters("lat", "lon", "lat", "lon").alias("d")).first()["d"]
    assert d0 == 0.0
    df2 = spark.createDataFrame([(45.5, -73.6, 45.6, -73.7)], ["a", "b", "c", "d"])
    fwd = df2.select(haversine_meters("a", "b", "c", "d").alias("x")).first()["x"]
    rev = df2.select(haversine_meters("c", "d", "a", "b").alias("x")).first()["x"]
    assert abs(fwd - rev) < 1e-9


def test_cyclic_encode_exact_quarters(spark):
    df = spark.createDataFrame([(h,) for h in (0, 6, 12, 18)], ["hour"])
    cos_c, sin_c = cyclic_encode("hour", 24.0)
    rows = {r["hour"]: (r["c"], r["s"]) for r in df.select("hour", cos_c.alias("c"), sin_c.alias("s")).collect()}
    assert rows[0] == (1.0, 0.0)
    assert abs(rows[6][0]) < 1e-15 and abs(rows[6][1] - 1.0) < 1e-15
    assert abs(rows[12][0] + 1.0) < 1e-15 and abs(rows[12][1]) < 1e-12
    assert abs(rows[18][0]) < 1e-15 and abs(rows[18][1] + 1.0) < 1e-15


def test_solar_elevation_day_night(spark):
    # Montréal, June 21: solar noon (~12h EDT≈UTC-4) high, midnight deep below.
    df = spark.createDataFrame(
        [("2017-06-21", 12), ("2017-06-21", 0)], ["date_s", "hour"]
    ).withColumn("date", F.col("date_s").cast("date"))
    elev = solar_elevation("date", "hour", F.lit(45.5), F.lit(-73.6), utc_offset_hours=-4.0)
    rows = {r["hour"]: r["e"] for r in df.select("hour", elev.alias("e")).collect()}
    assert rows[12] > 60  # near-solstice noon elevation ~68°
    assert rows[0] < -15


def test_decimal_sum_avg_exact(spark):
    df = spark.createDataFrame([(0.1,), (0.2,), (0.3,)], ["x"])
    row = df.agg(dsum("x").alias("s"), davg("x").alias("a")).first()
    assert row["s"] == 0.6  # decimal path: no 0.6000000000000001
    assert row["a"] == 0.6 / 3  # exact sum, then one deterministic IEEE divide


def test_vector_math(spark):
    df = spark.createDataFrame([([1.0, 2.0, 2.0], [2.0, 0.0, 0.0])], ["a", "b"])
    row = df.select(
        dot_product("a", "b").alias("dot"),
        l2_norm("a").alias("na"),
        cosine_similarity("a", "b").alias("cos"),
    ).first()
    assert row["dot"] == 2.0
    assert row["na"] == 3.0
    assert abs(row["cos"] - 2.0 / (3.0 * 2.0)) < 1e-15


def test_cosine_orthogonal_and_identical(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 5.0], [3.0, 0.0])], ["a", "b", "c"])
    row = df.select(
        cosine_similarity("a", "b").alias("orth"),
        cosine_similarity("a", "c").alias("same"),
    ).first()
    assert abs(row["orth"]) < 1e-15
    assert abs(row["same"] - 1.0) < 1e-15


def test_eastern_utc_offset_matches_reference_boundaries(spark):
    """The computed DST rule reproduces the reference's hardcoded per-year
    boundary chain (reference src/solar_features.py:47-79) for 2012-2018."""
    from datetime import datetime, timedelta

    from accident_prediction_montreal_spark.functions.solar import (
        eastern_utc_offset_hours,
    )

    boundaries = {
        2012: ("2012-03-11", "2012-11-04"),
        2013: ("2013-03-10", "2013-11-03"),
        2014: ("2014-03-09", "2014-11-02"),
        2015: ("2015-03-08", "2015-11-01"),
        2016: ("2016-03-13", "2016-11-06"),
        2017: ("2017-03-12", "2017-11-05"),
        2018: ("2018-03-11", "2018-11-04"),
    }
    probes = []
    for year, (start, end) in boundaries.items():
        s = datetime.fromisoformat(f"{start} 02:00:00")
        e = datetime.fromisoformat(f"{end} 02:00:00")
        # Strictly-inside / strictly-outside probes around both boundaries,
        # mirroring the reference's strict > start AND < end comparisons.
        probes += [
            (s - timedelta(hours=1), -5.0),
            (s + timedelta(hours=1), -4.0),
            (e - timedelta(hours=1), -4.0),
            (e + timedelta(hours=1), -5.0),
            (datetime(year, 7, 1, 12), -4.0),
            (datetime(year, 1, 15, 12), -5.0),
        ]
    df = spark.createDataFrame([(ts,) for ts, _ in probes], ["ts"])
    got = [r["off"] for r in
           df.select(eastern_utc_offset_hours("ts").alias("off")).collect()]
    want = [off for _, off in probes]
    assert got == want
