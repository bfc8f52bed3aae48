"""Model-evaluation composite operators.

  * ``threshold_sweep`` — single-pass threshold-dependent metrics
    (Precision/Recall/FPR/Accuracy/F1 at n thresholds), the reference's
    flagship relational composite (src/random_forest.py:136-221): bucketed
    histogram → full bucket×label grid outer join → two cumulative windows
    → pivot → metric arithmetic. One job, two shuffles, regardless of n.
  * ``count_rate_model`` — one-pass rewrite of the reference's baseline
    model (src/mains/main_train_base.py:25-51), which loops 377 count()
    actions; here: histogram + suffix-cumulative window (SURVEY.md §2 M9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def threshold_sweep(
    spark: SparkSession,
    scored: DataFrame,
    n_points: int = 20,
    prob_col: str = "prob_positive",
    label_col: str = "label",
) -> DataFrame:
    """Threshold-dependent confusion metrics in one pass.

    ``scored`` needs a double P(positive) column and a 0/1 label. Output:
    one row per threshold (i+1)/n for each grid bucket i in −1…n, with
    tn/fp/fn/tp counts and derived metrics — reference src/random_forest.py:
    174-216's contract, with the pivot's generated column names
    (``0_sum(count_negatives)`` …) pinned to explicit aliases, plus ONE
    deliberate divergence: the grid's top bucket n adds a sentinel row at
    threshold (n+1)/n > 1 with tp=fp=0 (everything classified negative).
    The reference's 0…1 grid silently drops prob==1.0 rows from its
    cumulative counts; keeping bucket n both feeds the windows correctly
    AND emits the all-negative endpoint, which callers may filter with
    ``threshold <= 1``.

    The grid spans −1…n inclusive: rows with prob exactly 1.0 land in
    bucket n and must still feed the cumulative windows. Crucially BOTH
    labels need a grid row at bucket n — if only the populated label had
    one (the reference's bare outer join), the other label's cumulative
    ``n_below`` would be missing there and pivot-coalesce to 0, silently
    zeroing tn or fn at the top threshold. The join stays OUTER as a guard
    for out-of-range probs. One pass over ``scored``, no driver actions: the
    accuracy denominator is tp+tn+fp+fn (constant = total examples at
    every threshold), so no separate count() is needed — the reference
    scans its predictions twice (random_forest.py:154-155 + histogram).
    """
    hist = (
        scored.select(
            F.col(label_col).cast("int").alias("label"),
            F.floor(F.col(prob_col) * n_points).cast("int").alias("id_bucket"),
        )
        .groupBy("label", "id_bucket")
        .count()
    )
    grid = (
        spark.range(-1, n_points + 1)
        .select(F.col("id").cast("int").alias("id_bucket"))
        .crossJoin(spark.createDataFrame([(0,), (1,)], ["label"]))
    )
    full = grid.join(hist, ["id_bucket", "label"], "outer").na.fill(0, ["count"])

    w = Window.partitionBy("label").orderBy("id_bucket")
    below = F.sum("count").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    above = F.sum("count").over(w.rowsBetween(1, Window.unboundedFollowing))
    counts = full.withColumn("n_below", below).withColumn("n_above", above)

    pivoted = (
        counts.groupBy("id_bucket")
        .pivot("label", [0, 1])
        .agg(F.sum("n_below").alias("below"), F.sum("n_above").alias("above"))
        .select(
            ((F.col("id_bucket") + 1) / F.lit(float(n_points))).alias("threshold"),
            F.coalesce("0_below", F.lit(0)).alias("true_negative"),
            F.coalesce("0_above", F.lit(0)).alias("false_positive"),
            F.coalesce("1_below", F.lit(0)).alias("false_negative"),
            F.coalesce("1_above", F.lit(0)).alias("true_positive"),
        )
    )

    tp, tn = F.col("true_positive"), F.col("true_negative")
    fp, fn = F.col("false_positive"), F.col("false_negative")
    safe = lambda num, den: F.when(den != 0, num / den)  # noqa: E731 — null when undefined
    return (
        pivoted.withColumn("precision", safe(tp, tp + fp))
        .withColumn("recall", F.when(tp != 0, tp / (tp + fn)).otherwise(F.lit(0.0)))
        .withColumn("false_positive_rate", safe(fp, fp + tn))
        # tn+fn+fp+tp sums to the total example count at every threshold,
        # so accuracy needs no separate count() action (reference
        # random_forest.py:205-213 computes the same ratio).
        .withColumn("accuracy", (tp + tn) / (tp + tn + fp + fn))
        .withColumn(
            "f1_score",
            safe(
                F.lit(2.0) * F.col("precision") * F.col("recall"),
                F.col("precision") + F.col("recall"),
            ),
        )
    )


def count_rate_model(
    df: DataFrame,
    count_col: str = "accident_count",
    label_col: str = "label",
) -> DataFrame:
    """Empirical P(label=1 | count ≥ threshold) for every observed count.

    Single pass: histogram over count values, then suffix-cumulative sums
    ordered by count — replacing the reference's driver loop of 2·N_count
    actions (src/mains/main_train_base.py:25-51, SURVEY.md §2 M9).
    """
    hist = df.groupBy(F.col(count_col).alias("threshold")).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col(label_col).cast("double")).alias("n_pos"),
    )
    w = (
        Window.orderBy(F.col("threshold").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return hist.select(
        "threshold",
        F.sum("n_total").over(w).alias("n_at_or_above"),
        (F.sum("n_pos").over(w) / F.sum("n_total").over(w)).alias("p_positive"),
    )
