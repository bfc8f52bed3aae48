"""ML pipeline assembly (SURVEY.md §2 M1, M4-M6, M10).

The reference's three training mains (mains/main_train_{rf,brf,urf}.py)
reduce to two pipeline shapes:
  * undersample → (weight) → RandomForest   (URF)
  * weight → RandomForest                   (BRF)
plus VectorAssembler feature assembly, probability extraction and
feature importances. ``vector_to_array`` replaces the reference's
row-level UDF for P(positive) (src/random_forest.py:84-91) — it stays
on the JVM.
"""

from __future__ import annotations

import pandas as pd
from pyspark.ml import Pipeline
from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.ml.class_weighter import ClassWeighter
from accident_prediction_montreal_spark.ml.random_undersampler import RandomUnderSampler


def assemble_features(
    df: DataFrame, feature_cols: list[str], output_col: str = "features"
) -> DataFrame:
    """VectorAssembler with handleInvalid='keep' (reference preprocess.py:501-507)."""
    assembler = VectorAssembler(
        inputCols=feature_cols, outputCol=output_col, handleInvalid="keep"
    )
    return assembler.transform(df)


def prob_positive(probability_col: str = "probability") -> Column:
    """P(label=1) from the MLlib probability vector — JVM-side, no UDF."""
    return vector_to_array(F.col(probability_col)).getItem(1)


def balanced_random_forest_pipeline(
    class_weight: list[float],
    label_col: str = "label",
    features_col: str = "features",
    num_trees: int = 100,
    max_depth: int = 10,
    seed: int = 42,
) -> Pipeline:
    """ClassWeighter → weighted RandomForest (reference main_train_brf.py:23-38)."""
    weighter = ClassWeighter(classWeight=class_weight, labelCol=label_col)
    rf = RandomForestClassifier(
        labelCol=label_col,
        featuresCol=features_col,
        weightCol="weight",
        numTrees=num_trees,
        maxDepth=max_depth,
        impurity="entropy",
        seed=seed,
    )
    return Pipeline(stages=[weighter, rf])


def undersampled_random_forest_pipeline(
    target_imbalance_ratio: float,
    index_col: str,
    label_col: str = "label",
    features_col: str = "features",
    num_trees: int = 100,
    max_depth: int = 10,
    seed: int = 42,
) -> Pipeline:
    """RandomUnderSampler → RandomForest (reference main_train_urf.py:23-35)."""
    sampler = RandomUnderSampler(
        targetImbalanceRatio=target_imbalance_ratio,
        indexCol=index_col,
        labelCol=label_col,
        seed=seed,
    )
    rf = RandomForestClassifier(
        labelCol=label_col,
        featuresCol=features_col,
        numTrees=num_trees,
        maxDepth=max_depth,
        impurity="entropy",
        seed=seed,
    )
    return Pipeline(stages=[sampler, rf])


def feature_importances(model, feature_cols: list[str]) -> pd.DataFrame:
    """Sorted importances table (reference random_forest.py:224-231)."""
    rf_model = model.stages[-1] if hasattr(model, "stages") else model
    table = pd.DataFrame(
        {"feature": feature_cols, "importance": rf_model.featureImportances.toArray()}
    )
    return table.sort_values("importance", ascending=False).reset_index(drop=True)
