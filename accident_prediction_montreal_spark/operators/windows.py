"""Window-function composite operators.

Re-expresses the reference's window patterns (SURVEY.md §2.5):
  * W4 — exponentially-weighted moving average via a stacked-lag window
    (reference src/weather.py:228-244)
  * W1/W2 — top-k per group via rank/row_number (src/preprocess.py:74-123)
  * W5 — cumulative sums (src/random_forest.py:136-145)
  * W3 — rolling midpoint densification (src/preprocess.py:161-175)

All pure built-in window functions: one shuffle on the partition key,
then sorted, codegen'd evaluation within each partition.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def exp_weighted_moving_average(
    value: Column | str,
    partition_by: list[str],
    order_by: list[str],
    window_size: int = 24,
    rate: float = 0.5,
) -> Column:
    """Causal EWMA over the last ``window_size`` rows.

    weight(offset t) = exp(rate·t) for t = −(window_size−1)…0, normalized to
    sum 1; missing lags (head of partition, or null values) contribute 0 —
    exactly the reference's ``weighted_average`` (src/weather.py:230-244).

    The reference orders its window by date only, leaving intra-day order
    undefined (SURVEY.md §7.4); callers here must pass a total order in
    ``order_by`` (e.g. date AND hour) — determinism is on the caller.
    """
    value = F.col(value) if isinstance(value, str) else value
    offsets = range(-(window_size - 1), 1)
    raw = [math.exp(rate * t) for t in offsets]
    norm = sum(raw)
    weights = [w / norm for w in raw]

    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    terms = [
        F.coalesce(F.lag(value, -t).over(w) * F.lit(wt), F.lit(0.0))
        for t, wt in zip(offsets, weights)
    ]
    out = F.lit(0.0)
    for term in terms:
        out = out + term
    return out


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str = "rn",
    keep_ties: bool = False,
) -> DataFrame:
    """Top-k rows per group (reference J8/W1/W2 pattern).

    ``keep_ties=True`` uses rank() (reference src/preprocess.py:74-91 keeps
    ties at the 5th place); otherwise row_number() — callers should include
    a tie-break column in ``order_by`` for determinism.
    """
    fn = F.rank() if keep_ties else F.row_number()
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, fn.over(w)).filter(F.col(rank_col) <= k)


def cumulative_sum(
    value: Column | str,
    partition_by: list[str],
    order_by: list[str],
    reverse_exclusive: bool = False,
) -> Column:
    """Running sum; ``reverse_exclusive`` gives the (current, end] suffix sum.

    The two frames are exactly the reference's threshold-sweep windows
    (src/random_forest.py:137-145): unboundedPreceding→current for the
    "≤ bucket" count and (current+1)→unboundedFollowing for "> bucket".
    """
    value = F.col(value) if isinstance(value, str) else value
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    if reverse_exclusive:
        frame = w.rowsBetween(1, Window.unboundedFollowing)
    else:
        frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return F.sum(value).over(frame)


def rolling_midpoints(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    coord_cols: list[str],
) -> DataFrame:
    """Densify a polyline: append midpoints of consecutive points.

    avg over rowsBetween(0, +1) per ordered partition, unioned with the
    originals and de-duplicated — reference src/preprocess.py:161-175.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by).rowsBetween(0, 1)
    mids = df.select(
        *partition_by,
        *[F.avg(c).over(w).alias(c) for c in coord_cols],
    )
    base = df.select(*partition_by, *coord_cols)
    return base.unionByName(mids).dropDuplicates()
