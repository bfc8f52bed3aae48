"""2-D skyline (Pareto frontier) operator (A/J-surface extension —
the SKYLINE OF query: points no other point dominates).

Dominance here: q dominates p iff q.price <= p.price AND q.size >=
p.size with at least one strict inequality (minimize price, maximize
size); exact ties (equal price AND equal size) dominate nothing and
all survive.

Scale shape — the canonical two-phase distributed skyline:
  1. LOCAL prune (mapInPandas): each partition streams its batches
     through an incrementally maintained frontier — a vectorized
     sort + per-price max + running-max sweep. Output is the
     partition's own Pareto frontier, which for realistic data is
     orders of magnitude smaller than the partition (worst case —
     perfectly anti-correlated dimensions — nothing prunes, and the
     global phase degrades gracefully to the full set).
  2. GLOBAL exact sweep over the pruned union: one groupBy(price)
     (map-side combinable max), a running max over the DISTINCT-price
     table (small by construction, so its single-partition window is
     a non-issue), and a broadcast join back. A point survives iff its
     size equals its price's max AND strictly exceeds every smaller
     price's max.
Local pruning is sound: a globally non-dominated point is non-dominated
within its own partition, so phase 1 never discards a skyline member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _frontier_pd(pdf, price: str, size: str):
    """Pandas frontier of a point set (keeps exact-tie duplicates)."""
    d = pdf[[price, size]].drop_duplicates().sort_values(price)
    mx = d.groupby(price)[size].transform("max")
    d = d[d[size] == mx]
    run = d[size].cummax().shift(1)
    d = d[run.isna() | (d[size] > run)]
    return pdf.merge(d, on=[price, size], how="inner")


def local_skyline(df: DataFrame, price: str, size: str) -> DataFrame:
    """Per-partition Pareto frontier via an incremental mapInPandas
    sweep; output schema = input schema."""
    schema = df.schema

    def prune(batches):
        import pandas as pd

        frontier = None
        for pdf in batches:
            both = pdf if frontier is None else pd.concat([frontier, pdf])
            frontier = _frontier_pd(both, price, size)
        if frontier is not None:
            yield frontier

    return df.mapInPandas(prune, schema=schema)


def skyline_2d(df: DataFrame, price: str, size: str) -> DataFrame:
    """Exact global skyline: local prune, then the aggregate sweep."""
    pruned = local_skyline(df, price, size)
    pmax = pruned.groupBy(price).agg(F.max(size).alias("__mx"))
    w = Window.orderBy(price).rowsBetween(Window.unboundedPreceding, -1)
    sky_prices = (
        pmax.withColumn("__prev", F.max("__mx").over(w))
        .filter(F.col("__prev").isNull() | (F.col("__mx") > F.col("__prev")))
        .select(price, "__mx")
    )
    return (
        pruned.join(F.broadcast(sky_prices), on=price)
        .filter(F.col(size) == F.col("__mx"))
        .drop("__mx")
    )
