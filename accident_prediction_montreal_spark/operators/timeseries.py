"""Time-series resampling and interval algebra (W/A-family extensions).

The reference's only time-series machinery is the stacked-lag EWMA
(src/weather.py:228-244 → operators/windows.py); real feature pipelines
also need the two ops here:

* ``gap_fill_lvcf`` — regularize an irregular event stream onto a fixed
  grid with last-value-carried-forward: sensors/weather stations miss
  hours, and a model that joins on (key, hour) silently drops them.
  One groupBy to the grid grain, one sequence-explode to densify, one
  IGNORE-NULLS window to carry — a single shuffle+sort per key, no
  self-joins, no per-gap work (a 1000-hour gap costs 1000 grid rows,
  never 1000² comparisons).
* ``interval_coverage`` — merge overlapping per-key intervals and
  measure covered time (the sweep-line "islands" algorithm as windows):
  running max of interval ends flags island starts, a cumulative sum
  numbers the islands, one aggregate measures them. Again one
  shuffle+sort per key; never an interval self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_lvcf(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    grain: str = "hour",
) -> DataFrame:
    """(key, grid_ts, obs_value, filled_value, is_carried) — one row per
    ``grain`` bucket between each key's first and last event.

    ``obs_value`` is the latest observation INSIDE the bucket (ties on
    equal ts broken by the greatest value-struct — deterministic);
    ``filled_value`` carries the last non-null observation forward
    (NULL only before a key's first observation, which cannot happen
    here since the grid starts at it); ``is_carried`` marks buckets
    with no own observation.
    """
    bucket = F.date_trunc(grain, F.col(ts_col))
    per_bucket = (
        events.select(
            key_col,
            bucket.alias("grid_ts"),
            F.struct(F.col(ts_col), F.col(value_col).alias("v")).alias("__o"),
        )
        .groupBy(key_col, "grid_ts")
        .agg(F.max("__o")["v"].alias("obs_value"))
    )
    span = per_bucket.groupBy(key_col).agg(
        F.min("grid_ts").alias("__lo"), F.max("grid_ts").alias("__hi")
    )
    grid = span.select(
        key_col,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL 1 {grain}"))
        ).alias("grid_ts"),
    )
    dense = grid.join(per_bucket, [key_col, "grid_ts"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("grid_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return dense.select(
        key_col,
        "grid_ts",
        "obs_value",
        F.last("obs_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("obs_value").isNull().alias("is_carried"),
    )


def interval_coverage(
    intervals: DataFrame,
    key_col: str = "user_id",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """(key, n_islands, covered_us) — overlapping/adjacent [start, end)
    intervals merged per key (touching intervals merge: a new island
    starts only when start STRICTLY exceeds the running max end)."""
    from accident_prediction_montreal_spark.sources.registry import epoch_us

    s_dtype = dict(intervals.dtypes)[start_col]
    base = intervals.select(
        key_col,
        epoch_us(F.col(start_col), s_dtype).alias("__s"),
        epoch_us(F.col(end_col), dict(intervals.dtypes)[end_col]).alias("__e"),
    )
    order = Window.partitionBy(key_col).orderBy("__s", "__e")
    prev_max_end = F.max("__e").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = base.withColumn(
        "__new",
        F.when(prev_max_end.isNull() | (F.col("__s") > prev_max_end), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "__isl",
        F.sum("__new").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    islands = numbered.groupBy(key_col, "__isl").agg(
        F.min("__s").alias("__lo"), F.max("__e").alias("__hi")
    )
    return islands.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.col("__hi") - F.col("__lo")).cast("long").alias("covered_us"),
    )
