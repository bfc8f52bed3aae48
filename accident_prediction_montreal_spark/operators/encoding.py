"""Target / risk encoding of categorical columns.

Re-expresses the reference's category-risk indexer
(src/preprocess.py:531-556, SURVEY.md §2 A7): per category,
risk = P(category | positive) − P(category | all); categories are then
ordinally indexed by descending risk (the reference's StringIndexer
replacement). Two group-counts + a join + one global window — the window
is single-partition but runs over |categories| rows only.
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

    The global totals come from ONE agg action (count + conditional sum in
    the same job) — two separate count() actions would scan the full
    dataset twice at 100 TB.
    """
    totals = df.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(F.when(F.col(label_col) == 1, 1).otherwise(0)).alias("n_pos"),
    ).first()
    n_all, n_pos = totals["n_all"], totals["n_pos"] or 0

    all_counts = df.groupBy(category_col).agg(F.count(F.lit(1)).alias("n_cat"))
    pos_counts = (
        df.filter(F.col(label_col) == 1)
        .groupBy(category_col)
        .agg(F.count(F.lit(1)).alias("n_cat_pos"))
    )
    risk = (
        all_counts.join(pos_counts, category_col, "left")
        .na.fill(0, ["n_cat_pos"])
        .select(
            category_col,
            (
                F.col("n_cat_pos") / F.lit(float(n_pos))
                - F.col("n_cat") / F.lit(float(n_all))
            ).alias("risk"),
        )
    )
    w = Window.orderBy(F.col("risk").desc(), F.col(category_col).asc())
    return risk.withColumn("risk_index", F.row_number().over(w))
