"""Batch sessionization (gaps-and-islands).

Groups an event stream into sessions per user: a new session starts when
the gap to the previous event exceeds ``gap``. Batch twin of Structured
Streaming's ``session_window`` (streaming/windows.py) — same session
boundaries, expressible in ANSI SQL for the oracle.

One shuffle on user_id; everything else is sorted window evaluation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.sources.registry import epoch_us


def sessionize(
    events: DataFrame,
    gap_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per (user, session): start/end timestamps, event count, value sum.

    ``order_cols`` must be a total order (default: ts then event_id if
    present) so boundaries are deterministic under equal timestamps.
    """
    order_cols = order_cols or [ts_col] + (["event_id"] if "event_id" in events.columns else [])
    w = Window.partitionBy(user_col).orderBy(*[F.col(c).asc() for c in order_cols])
    # Integer microseconds: the gap comparison is exact, never float.
    # (epoch_us handles TIMESTAMP and TIMESTAMP_NTZ event time alike.)
    ts_us = epoch_us(F.col(ts_col), dict(events.dtypes)[ts_col])
    prev = F.lag(ts_us).over(w)
    gap_us = gap_seconds * 1_000_000
    new_session = F.when(prev.isNull() | ((ts_us - prev) > gap_us), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_ids = events.withColumn("session_id", F.sum(new_session).over(run).cast("long"))
    value_sum = (
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
        if "value" in events.columns
        else F.lit(None).cast("double")
    )
    return with_ids.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        value_sum.alias("value_sum"),
    )
