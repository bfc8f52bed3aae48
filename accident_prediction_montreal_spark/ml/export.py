"""Training-run result export (reference src/export_results.py:17-46 +
mains): params, train/test AUPRC/AUROC, threshold-sweep metrics CSV and
feature importances, written under a fresh numbered run directory.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.ml.evaluate import evaluate_binary_classifier
from accident_prediction_montreal_spark.ml.pipelines import feature_importances
from accident_prediction_montreal_spark.operators.metrics import threshold_sweep


def create_result_dir(base: str, algorithm: str) -> str:
    """``{base}/{algorithm}_{i}`` with the first free i (reference
    export_results.py:9-15)."""
    i = 1
    while Path(f"{base}/{algorithm}_{i}").is_dir():
        i += 1
    path = Path(f"{base}/{algorithm}_{i}")
    path.mkdir(parents=True)
    return str(path)


def write_params(model, extra: dict[str, object], result_dir: str) -> None:
    lines = [f"{k}: {v}" for k, v in extra.items()]
    stages = model.stages if hasattr(model, "stages") else [model]
    for stage in stages:
        for param, value in stage.extractParamMap().items():
            lines.append(f"{param.name}: {value}")
    Path(result_dir, "params").write_text("\n".join(lines) + "\n")


def write_results(
    spark: SparkSession,
    model,
    test_predictions: DataFrame,
    train_predictions: DataFrame,
    result_dir: str,
    feature_cols: list[str] | None = None,
    n_points: int = 20,
) -> dict[str, float]:
    """results + metrics.csv (+ feature_importances.csv); returns the
    test/train metric dict."""
    test_m = evaluate_binary_classifier(test_predictions)
    train_m = evaluate_binary_classifier(train_predictions)
    Path(result_dir, "results").write_text(
        "Test set:\n"
        f"\tArea Under PR = {test_m['areaUnderPR']}\n"
        f"\tArea Under ROC = {test_m['areaUnderROC']}\n"
        "Train set:\n"
        f"\tArea Under PR = {train_m['areaUnderPR']}\n"
        f"\tArea Under ROC = {train_m['areaUnderROC']}\n"
    )

    from accident_prediction_montreal_spark.ml.pipelines import prob_positive

    scored = test_predictions.select(
        prob_positive().alias("prob_positive"), "label"
    )
    # threshold_sweep deliberately appends a sentinel grid point at
    # (n+1)/n > 1 (everything-negative corner); the reference grid
    # (random_forest.py: range(-1, n_points)) ends at 1.0, so the
    # sentinel is dropped HERE to keep metrics.csv row-for-row equal to
    # a reference results/ directory.
    sweep = (
        threshold_sweep(spark, scored, n_points=n_points)
        .filter(F.col("threshold") <= 1.0)
        .orderBy("threshold")
    )
    # metrics.csv carries the reference's EXACT header shape
    # (random_forest.py:174-221 via export_results.py:45-46): Threshold
    # index, capitalized metric names, the four count-percentage columns
    # in place of the raw confusion counts. The engine-side operator
    # keeps its snake_case contract (oracles pin it); the rename is an
    # export-boundary concern only.
    pdf = sweep.toPandas()
    total = (
        pdf["true_positive"]
        + pdf["true_negative"]
        + pdf["false_positive"]
        + pdf["false_negative"]
    )
    ref = pdf.rename(
        columns={
            "threshold": "Threshold",
            "precision": "Precision",
            "recall": "Recall",
            "false_positive_rate": "False positive rate",
            "accuracy": "Accuracy",
            "f1_score": "F1 Score",
        }
    )
    ref["True negative percentage"] = pdf["true_negative"] / total
    ref["True positive percentage"] = pdf["true_positive"] / total
    ref["False negative percentage"] = pdf["false_negative"] / total
    ref["False positive percentage"] = pdf["false_positive"] / total
    ref = ref.drop(
        columns=["true_negative", "true_positive", "false_negative", "false_positive"]
    )
    ref.set_index("Threshold").to_csv(f"{result_dir}/metrics.csv")

    if feature_cols is not None:
        # Reference shape (random_forest.py:224-231): feature names as
        # the (unnamed) index, one "Feature importances" column, sorted
        # descending — so the CSV header is ',Feature importances'.
        imp = feature_importances(model, feature_cols).set_index("feature")
        imp.index.name = None
        imp.columns = ["Feature importances"]
        imp.to_csv(f"{result_dir}/feature_importances.csv")
    return {
        "test": test_m,
        "train": train_m,
    }
