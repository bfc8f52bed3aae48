"""External-fetch source adapters (SURVEY.md §2 S5-S7, F2-F4).

The reference wraps per-row HTTP fetches in scalar UDFs returning
arrays/structs, then explodes — its de-facto UDTF pattern
(reference weather.py:59-111 station ids, :152-226 hourly bulk CSV,
:251-295 station coords). This engine preserves the operator shape but
the fetch targets a LOCAL FIXTURE TREE instead of the network
(SURVEY.md §7.3: the pattern is kept, the network is not): swap
``_load_csv`` for an HTTP call and nothing else changes.

Design notes retained from the reference:
  * key-partition BEFORE the I/O UDF (weather.py:206,
    ``repartition(200, "year", "month")``) so fetches spread across
    executors and retry domains are small;
  * the UDF returns Array<Struct> and the engine explodes — one input
    row fans out to a month of hourly rows;
  * row-at-a-time UDF is acceptable HERE ONLY because the body is
    I/O-bound; compute-bound paths use pandas UDFs (see
    operators/multimodal.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HOURLY_FIELDS = [
    ("hour", T.IntegerType()),
    ("temp", T.DoubleType()),
    ("rel_hum", T.DoubleType()),
    ("wind_spd", T.DoubleType()),
]

HOURLY_STRUCT = T.StructType([T.StructField(n, t) for n, t in HOURLY_FIELDS])


def fetch_hourly_observations(
    requests: DataFrame, fixture_dir: str, partitions: int | None = None
) -> DataFrame:
    """(station_id, year, month) requests → exploded hourly observations.

    Fixture layout: ``{fixture_dir}/{station_id}_{year}_{month}.csv`` with
    columns hour,temp,rel_hum,wind_spd — the stand-in for the bulk-CSV
    endpoint the reference scrapes (weather.py:114-149).
    """

    @F.udf(T.ArrayType(HOURLY_STRUCT))
    def fetch(station_id, year, month):
        import csv

        path = os.path.join(fixture_dir, f"{station_id}_{year}_{month}.csv")
        if not os.path.exists(path):
            return []
        out = []
        with open(path, newline="") as fh:
            for row in csv.DictReader(fh):
                out.append(
                    (
                        int(row["hour"]),
                        float(row["temp"]),
                        float(row["rel_hum"]),
                        float(row["wind_spd"]),
                    )
                )
        return out

    reqs = requests.repartition(
        partitions or requests.sparkSession.sparkContext.defaultParallelism,
        "station_id",
    )
    return (
        reqs.withColumn("obs", fetch("station_id", "year", "month"))
        .select("station_id", "year", "month", F.explode("obs").alias("o"))
        .select("station_id", "year", "month", "o.*")
    )


def fetch_station_coords(requests: DataFrame, fixture_dir: str) -> DataFrame:
    """station_id → Struct{lat, lon} (shape of weather.py:281-291)."""

    @F.udf(T.StructType([T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType())]))
    def fetch(station_id):
        path = os.path.join(fixture_dir, f"coords_{station_id}.txt")
        if not os.path.exists(path):
            return None
        lat, lon = open(path).read().split(",")
        return (float(lat), float(lon))

    return (
        requests.withColumn("c", fetch("station_id"))
        .select(
            "station_id",
            F.col("c")["lat"].alias("station_lat"),
            F.col("c")["lon"].alias("station_lon"),
        )
    )
