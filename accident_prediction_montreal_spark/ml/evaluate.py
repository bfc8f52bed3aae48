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
