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

    Distributed-exact: a global row_number over billions of predictions
    would sort everything into ONE partition, so the rank is instead
    resolved on the per-distinct-probability histogram (tree/ensemble
    models emit at most |leaves| distinct scores — tiny), and only the
    single boundary tie-group is order-ranked by id for the remaining
    quota. Identical flagged set, no full-data global sort.
    """
    import math

    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import functions as F

    scored = predictions.select(
        F.col(label_col).alias("__y"),
        vector_to_array(F.col(probability_col)).getItem(1).alias("__p"),
        F.col(tiebreak_col).alias("__id"),
    )
    hist = (
        scored.groupBy("__p")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("__y") == 1.0).cast("long")).alias("n_pos"),
        )
        .orderBy(F.col("__p").desc())
        .collect()  # |distinct scores| rows — model-bounded, not data-bounded
    )
    n = sum(r["n"] for r in hist)
    n_pos = sum(r["n_pos"] for r in hist)
    if not n_pos:
        return float("nan")
    n_flag = math.ceil(flag_rate * n)
    caught = 0
    remaining = n_flag
    boundary_p = None
    for r in hist:
        if r["n"] <= remaining:
            caught += r["n_pos"]
            remaining -= r["n"]
            if remaining == 0:
                break
        else:
            boundary_p = r["__p"]
            break
    if boundary_p is not None and remaining > 0:
        # Partial tie-group: the id tie-break only ever ranks THIS group.
        caught += (
            scored.filter(F.col("__p") == boundary_p)
            .orderBy("__id")
            .limit(remaining)
            .filter(F.col("__y") == 1.0)
            .count()
        )
    return caught / n_pos
