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
    area metrics don't pin. One pass: rank by P(positive) DESC with a
    deterministic id tie-break (tree models emit tied probabilities;
    without a total order the flagged set — and the metric — would vary
    by partitioning), flag the first ceil(rate * n), recall over the
    positive count. Both counts and the cutoff are integers, so the
    result is exact for a fixed prediction set.
    """
    import math

    from pyspark.ml.functions import vector_to_array
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    scored = predictions.select(
        F.col(label_col).alias("__y"),
        vector_to_array(F.col(probability_col)).getItem(1).alias("__p"),
        F.col(tiebreak_col).alias("__id"),
    )
    n, n_pos = scored.agg(
        F.count(F.lit(1)), F.sum((F.col("__y") == 1.0).cast("long"))
    ).first()
    if not n_pos:
        return float("nan")
    n_flag = math.ceil(flag_rate * n)
    w = Window.orderBy(F.col("__p").desc(), F.col("__id"))
    caught = (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter((F.col("__rk") <= n_flag) & (F.col("__y") == 1.0))
        .count()
    )
    return caught / n_pos
