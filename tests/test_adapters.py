"""Fixture-backed fetch adapters (the reference's scrape-UDF pattern)."""

from __future__ import annotations

from accident_prediction_montreal_spark.sources.adapters import (
    fetch_hourly_observations,
    fetch_station_coords,
)


def test_fetch_hourly_explodes(spark, tmp_path):
    (tmp_path / "7_2017_1.csv").write_text(
        "hour,temp,rel_hum,wind_spd\n0,-5.5,80,10\n1,-6.0,82,12\n"
    )
    reqs = spark.createDataFrame([(7, 2017, 1), (8, 2017, 1)], ["station_id", "year", "month"])
    out = fetch_hourly_observations(reqs, str(tmp_path), partitions=2)
    rows = out.collect()
    assert len(rows) == 2  # station 8 has no fixture → no rows, no error
    got = {r["hour"]: r["temp"] for r in rows}
    assert got == {0: -5.5, 1: -6.0}
    assert set(out.columns) == {"station_id", "year", "month", "hour", "temp", "rel_hum", "wind_spd"}


def test_fetch_station_coords(spark, tmp_path):
    (tmp_path / "coords_7.txt").write_text("45.5,-73.6")
    reqs = spark.createDataFrame([(7,), (9,)], ["station_id"])
    out = {r["station_id"]: (r["station_lat"], r["station_lon"]) for r in fetch_station_coords(reqs, str(tmp_path)).collect()}
    assert out[7] == (45.5, -73.6)
    assert out[9] == (None, None)
