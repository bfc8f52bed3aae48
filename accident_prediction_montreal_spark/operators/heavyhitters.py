"""Exact heavy hitters without shuffling the long tail (A-surface).

``groupBy(key).count()`` over 100 TB shuffles EVERY distinct key — at
web scale that is billions of groups of which a handful matter. The
classic two-pass fix (Misra-Gries 1982 summaries + exact recount):

  pass 1: each partition streams its rows through a Misra-Gries
          summary of capacity c. Pigeonhole guarantee: any key with
          GLOBAL count > n/(c+1) must exceed its share n_p/(c+1) in at
          least one partition, so it survives at least one summary —
          the union of survivors is a SUPERSET of the true heavy set.
          Shuffle cost: at most c rows per partition, independent of
          the number of distinct keys.
  pass 2: broadcast the candidate set (≤ c × partitions keys) and
          exactly count ONLY candidate rows; filter by the true
          threshold. The long tail never reaches a shuffle.

The per-partition summary is the sanctioned Arrow path (mapInPandas:
batches of one partition stream through one iterator, so the summary
is genuinely per-partition), vectorized via value_counts per batch —
no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, key_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra-Gries survivor keys (distinct, one column).

    Decrement step removes the current minimum count from every
    counter (the batched generalization: each removed count unit
    coincides with >= capacity other units, preserving the n/(c+1)
    error bound)."""
    field = df.schema[key_col]

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for val, cnt in pdf[key_col].value_counts().items():
                counters[val] = counters.get(val, 0) + int(cnt)
            if len(counters) > capacity:
                # evict: subtract the smallest count from all, drop zeros
                floor = sorted(counters.values())[len(counters) - capacity - 1]
                counters = {v: c - floor for v, c in counters.items() if c > floor}
        yield pd.DataFrame({key_col: list(counters.keys())})

    return df.select(key_col).mapInPandas(
        summarize, schema=f"{key_col} {field.dataType.simpleString()}"
    ).distinct()


def heavy_hitters_exact(
    df: DataFrame, key_col: str, threshold_frac: float, capacity: int | None = None
) -> DataFrame:
    """(key, cnt) for every key with count > threshold_frac * n, exact.

    ``capacity`` defaults to ceil(2 / threshold_frac), comfortably
    above the 1/threshold pigeonhole floor."""
    if capacity is None:
        capacity = int(2.0 / threshold_frac) + 1
    n = df.count()
    cand = misra_gries_candidates(df, key_col, capacity)
    return (
        df.join(F.broadcast(cand), on=key_col, how="left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > threshold_frac * n)
    )
