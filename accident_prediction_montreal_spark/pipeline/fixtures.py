"""Deterministic Part-A fixtures (FIXTURES.md §A1-A6).

Stand-ins for the reference's external sources — collision CSV
(reference src/accidents_montreal.py), KMZ road network
(src/road_network.py:103-264), Environment-Canada scrapes
(src/weather.py:59-295) — generated with a fixed seed inside the
bounding box the reference operates in (Montréal: lat 45.4-45.7,
lon −74.0..−73.4). Schemas match the reference's post-ingest contracts
so every downstream operator sees reference-shaped input.
"""

from __future__ import annotations

import datetime as dt
import math
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_STREET_WORDS = ["rue", "avenue", "boulevard", "chemin", "impasse", "xyz"]
_LEVELS = ["artère", "locale", "collectrice"]


def generate_road_points(
    spark: SparkSession, n_streets: int = 40, seed: int = 7
) -> DataFrame:
    """Road network flattened to (street, point) rows — contract of
    extract_road_segments_df (reference road_network.py:277-308)."""
    rng = random.Random(seed)
    rows = []
    for s in range(n_streets):
        name = f"{_STREET_WORDS[s % len(_STREET_WORDS)]} {s}"
        level = _LEVELS[s % len(_LEVELS)]
        c_lat = 45.4 + rng.random() * 0.3
        c_lon = -74.0 + rng.random() * 0.6
        street_id = f"nid{s}_1"
        n_points = 3 + rng.randrange(8)
        heading = rng.random() * 2 * math.pi
        for p in range(n_points):
            step = (p - n_points / 2) * 0.0005
            rows.append(
                (
                    name,
                    level,
                    c_lon,
                    c_lat,
                    c_lon + step * math.cos(heading),
                    c_lat + step * math.sin(heading),
                    street_id,
                )
            )
    schema = T.StructType(
        [
            T.StructField("street_name", T.StringType()),
            T.StructField("street_type", T.StringType()),
            T.StructField("center_long", T.DoubleType()),
            T.StructField("center_lat", T.DoubleType()),
            T.StructField("coord_long", T.DoubleType()),
            T.StructField("coord_lat", T.DoubleType()),
            T.StructField("street_id", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


_RUSH_HOUR_WEIGHTS = [1, 1, 1, 1, 1, 2, 4, 8, 10, 6, 3, 3, 4, 4, 4, 6, 9, 10, 7, 4, 3, 2, 1, 1]


def generate_accidents(
    spark: SparkSession,
    road_points: DataFrame,
    n: int = 200,
    seed: int = 11,
    year: int = 2017,
    days: int = 30,
    risk_bias: bool = False,
) -> DataFrame:
    """Preprocessed accidents (contract of preprocess_accidents,
    reference preprocess.py:43-56): some on-road (near a road point) and
    some off-road (to exercise the refine pass). Dates fall in the same
    window ``generate_weather`` covers so the IDW join is total.

    ``risk_bias=True`` (used by the model-quality goldens) concentrates
    accidents in rush hours, on weekdays, and on a "hot" quarter of the
    road points — mirroring the structure real collision data has — so
    the learned pipelines have signal to find (hour_cos/sin, dayofweek,
    accident_count risk encoding) and their AUROC/AUPRC goldens sit well
    above the random baseline instead of pinning 0.5. Default False is
    byte-identical to the pre-flag fixture (same RNG consumption)."""
    pts = [(r["coord_lat"], r["coord_long"]) for r in road_points.collect()]
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        if rng.random() < 0.6:
            if risk_bias and rng.random() < 0.8:
                lat, lon = pts[rng.randrange(max(1, len(pts) // 4))]  # hot streets
            else:
                lat, lon = pts[rng.randrange(len(pts))]
            lat += (rng.random() - 0.5) * 1e-5  # ≲ 1 m offset → first-pass accept
            lon += (rng.random() - 0.5) * 1e-5
        else:
            lat = 45.4 + rng.random() * 0.3
            lon = -74.0 + rng.random() * 0.6
        if risk_bias:
            day = rng.choices(
                range(days),
                weights=[
                    3 if (dt.date(year, 1, 1) + dt.timedelta(days=d)).weekday() < 5 else 1
                    for d in range(days)
                ],
            )[0]
            hour = rng.choices(range(24), weights=_RUSH_HOUR_WEIGHTS)[0]
        else:
            day, hour = rng.randrange(days), rng.randrange(24)
        date = dt.date(year, 1, 1) + dt.timedelta(days=day)
        rows.append((i, date, hour, float(lat), float(lon)))
    schema = T.StructType(
        [
            T.StructField("accident_id", T.LongType()),
            T.StructField("date", T.DateType()),
            T.StructField("hour", T.IntegerType()),
            T.StructField("loc_lat", T.DoubleType()),
            T.StructField("loc_long", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


_WEATHER_COLS = [
    "dew_point_temp",
    "rel_hum",
    "wind_dir",
    "wind_spd",
    "visibility",
    "stn_press",
    "hmdx",
    "wind_chill",
    "temp",
]


def generate_weather(
    spark: SparkSession,
    n_stations: int = 5,
    days: int = 30,
    seed: int = 13,
    year: int = 2017,
) -> DataFrame:
    """Hourly station observations (contract of
    get_weather_station_weather_df, reference weather.py:205-226), with
    NaN runs in hmdx/wind_chill as in the real data."""
    rng = random.Random(seed)
    rows = []
    for sid in range(n_stations):
        for d in range(days):
            date = dt.date(year, 1, 1) + dt.timedelta(days=d)
            for h in range(24):
                vals = [float(round(rng.uniform(-20, 30), 1)) for _ in _WEATHER_COLS]
                if rng.random() < 0.7:
                    vals[6] = float("nan")  # hmdx
                    vals[7] = float("nan")  # wind_chill
                risky = 1.0 if rng.random() < 0.1 else 0.0
                rows.append((sid, date, h, *vals, risky))
    schema = T.StructType(
        [T.StructField("station_id", T.IntegerType()), T.StructField("date", T.DateType()), T.StructField("hour", T.IntegerType())]
        + [T.StructField(c, T.FloatType()) for c in _WEATHER_COLS]
        + [T.StructField("risky_weather", T.FloatType())]
    )
    return spark.createDataFrame(rows, schema)


def generate_station_coords(spark: SparkSession, n_stations: int = 5, seed: int = 17) -> DataFrame:
    """Station coordinates (contract of get_weather_station_coords_df,
    reference weather.py:285-291)."""
    rng = random.Random(seed)
    rows = [
        (sid, 45.4 + rng.random() * 0.3, -74.0 + rng.random() * 0.6)
        for sid in range(n_stations)
    ]
    schema = T.StructType(
        [
            T.StructField("station_id", T.IntegerType()),
            T.StructField("station_lat", T.DoubleType()),
            T.StructField("station_long", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
