"""Binary-classifier evaluation (SURVEY.md §2 M7).

Same metrics as reference src/evaluate.py:5-18 (areaUnderPR /
areaUnderROC via the JVM evaluators), returned as a dict instead of
printed.
"""

from __future__ import annotations

from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.sql import DataFrame


def evaluate_binary_classifier(
    predictions: DataFrame,
    label_col: str = "label",
    raw_prediction_col: str = "rawPrediction",
) -> dict[str, float]:
    metrics = {}
    for name in ("areaUnderPR", "areaUnderROC"):
        evaluator = BinaryClassificationEvaluator(
            labelCol=label_col, rawPredictionCol=raw_prediction_col, metricName=name
        )
        metrics[name] = evaluator.evaluate(predictions)
    return metrics


def recall_at_flag_rate(
    predictions: DataFrame,
    flag_rate: float = 0.13,
    label_col: str = "label",
    probability_col: str = "probability",
    tiebreak_col: str = "sample_id",
) -> float:
    """Fraction of positives captured when flagging the top ``flag_rate``
    of samples by predicted positive probability.

    The reference's headline operating point (reference README.md:9:
    "top 13% flagged => 85% of collisions") — a deployment contract the
    area metrics don't pin. Flagged set: rank by P(positive) DESC with a
    deterministic id tie-break (tree models emit tied probabilities;
    without a total order the flagged set — and the metric — would vary
    by partitioning), flag the first ceil(rate * n), recall over the
    positive count. Counts and the cutoff are integers — exact for a
    fixed prediction set.

    Distributed-exact at ANY score cardinality: a global row_number over
    billions of predictions would sort everything into ONE partition,
    and a per-distinct-score histogram is data-sized for GBT-style
    near-unique scores. Instead, scores quantize into at most ~1e6
    buckets (floor(p * 1e6) — monotone, so bucket order IS score order);
    the bucketed histogram resolves the rank for every full bucket, and
    only the single boundary bucket (~n / 1e6 rows, worst case all-tied
    = the unavoidable degenerate) is order-ranked by (score, id) for the
    remaining quota. Identical flagged set to the naive global
    (P DESC, id ASC) ranking; driver traffic is bucket-bounded.
    """
    import math

    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    scored = predictions.select(
        F.col(label_col).alias("__y"),
        vector_to_array(F.col(probability_col)).getItem(1).alias("__p"),
        F.col(tiebreak_col).alias("__id"),
    )
    _Q = 1_000_000
    bucketed = scored.withColumn(
        "__qb", F.floor(F.col("__p") * _Q).cast("long")
    )
    hist = (
        bucketed.groupBy("__qb")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("__y") == 1.0).cast("long")).alias("n_pos"),
        )
        .orderBy(F.col("__qb").desc())
        .collect()  # <= _Q + 1 rows, bounded by quantization, not by data
    )
    n = sum(r["n"] for r in hist)
    n_pos = sum(r["n_pos"] for r in hist)
    if not n_pos:
        return float("nan")
    n_flag = math.ceil(flag_rate * n)
    caught = 0
    remaining = n_flag
    boundary_qb = None
    for r in hist:
        if r["n"] <= remaining:
            caught += r["n_pos"]
            remaining -= r["n"]
            if remaining == 0:
                break
        else:
            boundary_qb = r["__qb"]
            break
    if boundary_qb is not None and remaining > 0:
        # Partial boundary bucket: scores within it still differ, so the
        # rank there follows the SAME (__p DESC, __id ASC) order as the
        # global ranking — applied to only this bucket's rows.
        caught += (
            bucketed.filter(F.col("__qb") == boundary_qb)
            .orderBy(F.col("__p").desc(), F.col("__id"))
            .limit(remaining)
            .filter(F.col("__y") == 1.0)
            .count()
        )
    return caught / n_pos
