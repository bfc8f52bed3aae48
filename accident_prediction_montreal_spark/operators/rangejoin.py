"""Bucketed point-in-interval range join.

OSS Spark has no native range-join optimization: `points JOIN intervals
ON ts BETWEEN start AND end` plans as BroadcastNestedLoopJoin (fine
only while the interval side broadcasts) or a cartesian product. This
operator provides the standard scale path: bucket time into cells no
smaller than the longest interval, explode each interval into the cells
it touches, equi-join points to cells, then post-filter the exact
containment predicate. Candidate pairs are bounded by (points ×
intervals-per-cell) instead of (points × intervals), the join is a
plain shuffled/broadcast HASH join Catalyst can size with AQE, and a
skewed cell (many intervals in one bucket) is handled by AQE skew
splitting.

Semantics are identical to the naive theta join (the DuckDB oracle for
j10_range_join IS the naive BETWEEN join); `point_in_interval_join_naive`
is kept as the broadcastable twin for small interval sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def point_in_interval_join_naive(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """Reference-semantics theta join: broadcast the interval side.

    Correct at any duration distribution, affordable only while the
    interval side fits in a broadcast (the BroadcastNestedLoopJoin
    evaluates every (point, interval) pair).
    """
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    return points.join(F.broadcast(intervals), cond)


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 6 * 3600,
) -> DataFrame:
    """Bucketed equi-join range join (the 100-TB path).

    ``bucket_seconds`` must be >= the longest interval duration for the
    per-interval cell fan-out to stay <= 2; longer intervals still join
    correctly (the sequence covers every touched cell) at higher
    fan-out. Enforced lazily: fan-out is data-dependent, so the
    guarantee is structural (sequence length), not an upfront action.

    One wide shuffle on the cell id; the exact BETWEEN predicate runs
    post-join on the bounded candidate set.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")

    def cell(col: Column) -> Column:
        return F.floor(F.unix_timestamp(col) / F.lit(bucket_seconds)).cast("long")

    # end is exclusive: an interval ending exactly on a cell boundary
    # does not touch the next cell.
    iv = intervals.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                cell(F.col(start_col)),
                cell(F.col(end_col) - F.expr("interval 1 microsecond")),
            )
        ),
    )
    pt = points.withColumn("__cell", cell(F.col(ts_col)))
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    return pt.join(iv, on=["__cell"]).filter(cond).drop("__cell")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    keys: list[str] | None = None,
    a_start: str = "a_start",
    a_end: str = "a_end",
    b_start: str = "b_start",
    b_end: str = "b_end",
    bucket_seconds: int = 6 * 3600,
) -> DataFrame:
    """Interval-INTERVAL overlap join (strict overlap: a_start < b_end
    AND b_start < a_end; touching intervals do not match) — the
    two-sided sibling of ``point_in_interval_join``.

    Both sides explode onto time cells; candidates come from a hash
    equi-join on (keys..., cell). An overlapping pair can share MANY
    cells, so instead of a dropDuplicates shuffle the pair is emitted
    only in its CANONICAL cell — the cell containing the overlap's
    start max(a_start, b_start), which both intervals provably touch —
    making the output exactly-once by construction. Fan-out per
    interval is ceil(duration/bucket)+1 cells; candidate pairs are
    bounded by co-located-cell density, never |A| x |B|.
    """
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")

    def cell(col: Column) -> Column:
        return F.floor(F.unix_timestamp(col) / F.lit(bucket_seconds)).cast("long")

    def explode_cells(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "__cell",
            F.explode(
                F.sequence(
                    cell(F.col(s)),
                    cell(F.col(e) - F.expr("interval 1 microsecond")),
                )
            ),
        )

    on = list(keys or []) + ["__cell"]
    joined = explode_cells(a, a_start, a_end).join(
        explode_cells(b, b_start, b_end), on=on
    )
    overlap = (F.col(a_start) < F.col(b_end)) & (F.col(b_start) < F.col(a_end))
    canonical = F.col("__cell") == cell(F.greatest(a_start, b_start))
    return joined.filter(overlap & canonical).drop("__cell")
