"""Raw accident-CSV preprocessing (reference preprocess.py:43-56 +
accidents_montreal.py:62-81).

The reference reads the collision CSV with header-only inference (all
strings) and fixes types afterwards. This engine reads with an explicit
all-string schema for the used columns (the file genuinely is stringly —
HEURE_ACCDN is "H:MM:SS-H:MM:SS") and performs the same derivations:
date from yyyy/MM/dd, hour = int before the first ':', doubles for
coordinates, dropna.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from accident_prediction_montreal_spark.sources.files import read_csv

ACCIDENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("ACCIDENT_ID", T.LongType()),
        T.StructField("DT_ACCDN", T.StringType()),
        T.StructField("HEURE_ACCDN", T.StringType()),
        T.StructField("LOC_LAT", T.StringType()),
        T.StructField("LOC_LONG", T.StringType()),
    ]
)


def read_raw_accidents(spark: SparkSession, path: str) -> DataFrame:
    return read_csv(spark, path, ACCIDENTS_RAW_SCHEMA)


def preprocess_accidents(raw: DataFrame) -> DataFrame:
    """(accident_id, date, hour, loc_lat, loc_long), rows with any null
    dropped — the contract every downstream stage assumes (A2 in
    FIXTURES.md)."""
    return (
        raw.select(
            F.col("ACCIDENT_ID").alias("accident_id"),
            F.to_date("DT_ACCDN", "yyyy/MM/dd").alias("date"),
            F.split("HEURE_ACCDN", ":")[0].cast("int").alias("hour"),
            F.col("LOC_LAT").cast("double").alias("loc_lat"),
            F.col("LOC_LONG").cast("double").alias("loc_long"),
        )
        .na.drop()
    )
