"""Model tuning (SURVEY.md §2 M6) + the XGBoost stand-in (M11).

The reference tunes with ParamGridBuilder over RandomForest params via
TrainValidationSplit(trainRatio=0.8) and CrossValidator(numFolds=4)
(reference random_forest.py:22-81, mains/main_xgboost.py:49-64). Same
JVM machinery here, with ``parallelism`` exposed — Spark 3+ fits grid
points concurrently, which the 2.4-era reference could not.

XGBoost itself is an external JVM package (out of scope per SURVEY.md
§7.3); ``gbt_pipeline`` provides the built-in gradient-boosted-trees
stand-in with the same pipeline shape.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.classification import GBTClassifier, RandomForestClassifier
from pyspark.ml.evaluation import BinaryClassificationEvaluator
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder, TrainValidationSplit

from accident_prediction_montreal_spark.ml.class_weighter import ClassWeighter


def rf_param_grid(rf: RandomForestClassifier, max_depths: list[int], num_trees: list[int]):
    return (
        ParamGridBuilder()
        .addGrid(rf.maxDepth, max_depths)
        .addGrid(rf.numTrees, num_trees)
        .build()
    )


def tuned_rf(
    label_col: str = "label",
    features_col: str = "features",
    max_depths: list[int] | None = None,
    num_trees: list[int] | None = None,
    metric: str = "areaUnderPR",
    train_ratio: float = 0.8,
    folds: int | None = None,
    parallelism: int = 2,
    seed: int = 42,
):
    """TrainValidationSplit (default) or CrossValidator (folds=k) over an
    RF grid — reference random_forest.py:22-46 / :49-81 shapes."""
    rf = RandomForestClassifier(
        labelCol=label_col, featuresCol=features_col, impurity="entropy", seed=seed
    )
    grid = rf_param_grid(rf, max_depths or [5, 10], num_trees or [20, 50])
    evaluator = BinaryClassificationEvaluator(labelCol=label_col, metricName=metric)
    if folds:
        return CrossValidator(
            estimator=rf,
            estimatorParamMaps=grid,
            evaluator=evaluator,
            numFolds=folds,
            parallelism=parallelism,
            seed=seed,
        )
    return TrainValidationSplit(
        estimator=rf,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        trainRatio=train_ratio,
        parallelism=parallelism,
        seed=seed,
    )


def gbt_pipeline(
    class_weight: list[float] | None = None,
    label_col: str = "label",
    features_col: str = "features",
    max_iter: int = 20,
    max_depth: int = 5,
    seed: int = 42,
) -> Pipeline:
    """Gradient-boosted trees with optional class weighting — the
    built-in stand-in for the reference's XGBoost main (M11)."""
    stages = []
    gbt = GBTClassifier(
        labelCol=label_col,
        featuresCol=features_col,
        maxIter=max_iter,
        maxDepth=max_depth,
        seed=seed,
    )
    if class_weight is not None:
        stages.append(ClassWeighter(classWeight=class_weight, labelCol=label_col))
        gbt.setWeightCol("weight")
    stages.append(gbt)
    return Pipeline(stages=stages)
