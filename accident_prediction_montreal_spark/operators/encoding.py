"""Target / risk encoding of categorical columns.

Re-expresses the reference's category-risk indexer
(src/preprocess.py:531-556, SURVEY.md §2 A7): per category,
risk = P(category | positive) − P(category | all); categories are then
ordinally indexed by descending risk (the reference's StringIndexer
replacement). ONE group-count over the data; global totals and the
ordinal index come from windows over the |categories|-row aggregate —
single-partition, but tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    category_col: str,
    label_col: str = "label",
) -> DataFrame:
    """Return (category, risk, risk_index) — deterministic via category tie-break.

    Single scan, zero driver actions: one map-side-combined
    groupBy(category) computes (n_cat, n_cat_pos); the global totals are
    window-sums over that aggregate (|categories| rows), NOT a second
    pass over the data — the earlier form's separate totals action plus
    per-branch group-counts scanned the full dataset three times at
    100 TB. try_divide keeps an all-negative input NULL-safe under ANSI.
    """
    per_cat = df.groupBy(category_col).agg(
        F.count(F.lit(1)).alias("n_cat"),
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).alias("n_cat_pos"),
    )
    everything = Window.partitionBy()
    risk = per_cat.select(
        category_col,
        (
            F.try_divide(F.col("n_cat_pos"), F.sum("n_cat_pos").over(everything))
            - F.try_divide(F.col("n_cat"), F.sum("n_cat").over(everything))
        ).alias("risk"),
    )
    w = Window.orderBy(F.col("risk").desc(), F.col(category_col).asc())
    return risk.withColumn("risk_index", F.row_number().over(w))
