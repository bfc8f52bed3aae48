"""Weather assembly: risky-weather EWMA smoothing + IDW interpolation of
station observations to samples (reference weather.py:228-244 +
preprocess.py:360-398).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.spatial import idw_interpolate
from accident_prediction_montreal_spark.operators.windows import (
    exp_weighted_moving_average,
)

WEATHER_COLS = [
    "dew_point_temp",
    "rel_hum",
    "wind_dir",
    "wind_spd",
    "visibility",
    "stn_press",
    "hmdx",
    "wind_chill",
    "temp",
    "risky_weather",
]


def smooth_risky_weather(weather: DataFrame, window_size: int = 24, rate: float = 0.5) -> DataFrame:
    """EWMA-smooth risky_weather per station (W4).

    Ordered by (date, hour): the reference orders by date alone, leaving
    intra-day order undefined (SURVEY.md §7.4) — this engine pins the
    total order and documents the divergence.
    """
    ewma = exp_weighted_moving_average(
        "risky_weather",
        partition_by=["station_id"],
        order_by=["date", "hour"],
        window_size=window_size,
        rate=rate,
    )
    return weather.withColumn("risky_weather", ewma)


def weather_for_samples(
    samples: DataFrame,
    weather: DataFrame,
    station_coords: DataFrame,
    sample_id: str = "sample_id",
) -> DataFrame:
    """IDW-interpolate all weather variables to each (sample, date, hour).

    The reference joins sample↔weather on (date, hour) then group-sums
    IDW products per sample (preprocess.py:377-398). Same shape here:
    station_coords is broadcast onto the hourly observations, the join
    key is (date, hour), and the aggregation is one map-side-combinable
    group-sum keyed on the sample id.
    """
    from accident_prediction_montreal_spark.functions.geo import (
        haversine_meters_coslat,
    )

    # Per-side cosines hoisted out of the (sample x hourly-obs) pair
    # loop — bit-exact (haversine_meters_coslat is the same expression;
    # r14, see operators/spatial.idw_interpolate). The station cosine
    # rides the broadcast dim, so it is paid once per STATION, not once
    # per (station, hour, sample) row.
    obs = weather.join(
        F.broadcast(
            station_coords.withColumn(
                "__wx_cos_t", F.cos(F.radians(F.col("station_lat")))
            )
        ),
        "station_id",
    )
    joined = (
        samples.select(sample_id, "date", "hour", "loc_lat", "loc_long")
        .withColumn("__wx_cos_s", F.cos(F.radians(F.col("loc_lat"))))
        .join(obs, ["date", "hour"])
    )
    d = haversine_meters_coslat(
        "loc_lat", "loc_long", "station_lat", "station_long",
        "__wx_cos_s", "__wx_cos_t",
    )
    joined = joined.withColumn("idw_w", F.lit(1.0) / F.pow(d, F.lit(2.0)))

    aggs = []
    # Interpolate the WEATHER_COLS present — but LOUDLY require that the
    # subset is a prefix of intent, not a typo: every remaining weather
    # column must be a known WEATHER_COLS name (a misspelled station
    # column would otherwise be silently dropped and only surface — or
    # not — far downstream at feature assembly).
    meta = {sample_id, "date", "hour", "loc_lat", "loc_long",
            "station_id", "station_lat", "station_long"}
    unknown = [c for c in weather.columns
               if c not in WEATHER_COLS and c not in meta]
    if unknown:
        raise ValueError(
            f"weather_for_samples: unrecognized weather columns {unknown}; "
            f"expected a subset of {WEATHER_COLS}"
        )
    present = [c for c in WEATHER_COLS if c in weather.columns]
    if not present:
        raise ValueError(
            "weather_for_samples: no WEATHER_COLS present in the weather "
            f"frame (columns: {weather.columns})"
        )
    for c in present:
        x = F.col(c)
        valid = (~F.isnan(x)) & x.isNotNull()
        num = F.sum(F.when(valid, F.col("idw_w") * x).otherwise(F.lit(0.0)))
        den = F.sum(F.when(valid, F.col("idw_w")).otherwise(F.lit(0.0)))
        aggs.append((num / den).alias(c))
    return joined.groupBy(sample_id).agg(*aggs)
