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


def oof_target_encode(
    df: DataFrame,
    category_col: str,
    label_col: str,
    fold_key: str,
    folds: int = 5,
    salt: int = 11,
    smoothing: float = 0.0,
) -> DataFrame:
    """LEAKAGE-FREE (out-of-fold) target-mean encoding — the A7 risk
    encoder's production-grade sibling: a row's encoding averages the
    label over every fold EXCEPT its own, so the feature never contains
    the row's own target (plain target encoding leaks and inflates
    validation scores; k-fold exclusion is the standard fix).

    Deterministic and SQL-checkable: the fold is
    ``floor(lcg_uniform(fold_key, salt) * folds)`` (operators/mixing.py
    — bit-identical in DuckDB via lcg_uniform_sql), NOT a random split.
    One map-side-combined groupBy(category, fold) over the data; the
    leave-one-fold-out means come from window sums over that tiny
    aggregate (|categories| × folds rows) — no second pass, no
    per-fold jobs. ``smoothing`` adds m rows of the global out-of-fold
    mean (empirical-Bayes shrinkage) for rare categories.

    Returns (category, fold, encoding) — join back on both to attach.
    """
    from accident_prediction_montreal_spark.operators.mixing import lcg_uniform

    fold = F.floor(lcg_uniform(fold_key, salt=salt) * folds).cast("int")
    per = (
        df.select(
            F.col(category_col), fold.alias("fold"), F.col(label_col).cast("double").alias("__y")
        )
        .groupBy(category_col, "fold")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__y").alias("y"))
    )
    by_cat = Window.partitionBy(category_col)
    everything = Window.partitionBy()
    oof_n = F.sum("n").over(by_cat) - F.col("n")
    oof_y = F.sum("y").over(by_cat) - F.col("y")
    # global OOF mean for the shrinkage prior (same leave-own-fold-out rule)
    g_n = F.sum("n").over(everything) - F.sum("n").over(Window.partitionBy("fold"))
    g_y = F.sum("y").over(everything) - F.sum("y").over(Window.partitionBy("fold"))
    prior = F.try_divide(g_y, g_n)
    enc = F.try_divide(oof_y + F.lit(float(smoothing)) * prior, oof_n + F.lit(float(smoothing)))
    return per.select(category_col, "fold", enc.alias("encoding"))
