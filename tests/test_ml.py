"""ML layer: undersampler, class weighter, pipelines, evaluation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.ml.class_weighter import (
    ClassWeighter,
    balanced_weights,
)
from accident_prediction_montreal_spark.ml.evaluate import evaluate_binary_classifier
from accident_prediction_montreal_spark.ml.pipelines import (
    assemble_features,
    balanced_random_forest_pipeline,
    feature_importances,
    prob_positive,
    undersampled_random_forest_pipeline,
)
from accident_prediction_montreal_spark.ml.random_undersampler import RandomUnderSampler


@pytest.fixture(scope="module")
def labeled(spark):
    # 200 negatives, 20 positives; x1 separates the classes noisily.
    rows = []
    for i in range(200):
        rows.append((i, 0.0, (i % 50) / 50.0, float(i % 7)))
    for i in range(200, 220):
        rows.append((i, 1.0, 0.8 + (i % 10) / 50.0, float(i % 7)))
    return spark.createDataFrame(rows, ["index", "label", "x1", "x2"])


def test_undersampler_hits_target_ratio(labeled):
    model = RandomUnderSampler(targetImbalanceRatio=2.0, indexCol="index", seed=7).fit(labeled)
    out = model.transform(labeled)
    n_neg = out.filter(F.col("label") == 0.0).count()
    n_pos = out.filter(F.col("label") == 1.0).count()
    assert n_pos == 20  # positives untouched
    assert abs(n_neg / n_pos - 2.0) < 0.8  # Bernoulli sampling tolerance


def test_undersampler_noop_when_already_balanced(labeled):
    model = RandomUnderSampler(targetImbalanceRatio=100.0, indexCol="index").fit(labeled)
    assert model.transform(labeled).count() == labeled.count()


def test_undersampler_deterministic_with_seed(labeled):
    a = RandomUnderSampler(targetImbalanceRatio=2.0, indexCol="index", seed=7).fit(labeled)
    b = RandomUnderSampler(targetImbalanceRatio=2.0, indexCol="index", seed=7).fit(labeled)
    ids_a = sorted(r["index"] for r in a.transform(labeled).collect())
    ids_b = sorted(r["index"] for r in b.transform(labeled).collect())
    assert ids_a == ids_b


def test_class_weighter(spark):
    df = spark.createDataFrame([(0.0,), (1.0,), (0.0,)], ["label"])
    out = ClassWeighter(classWeight=[0.25, 1.0]).transform(df)
    rows = [(r["label"], r["weight"]) for r in out.collect()]
    assert sorted(rows) == [(0.0, 0.25), (0.0, 0.25), (1.0, 1.0)]


def test_balanced_weights(spark):
    df = spark.createDataFrame([(0.0,)] * 3 + [(1.0,)], ["label"])
    w = balanced_weights(df)
    assert w == [4 / 6, 4 / 2]  # n/(2·n0), n/(2·n1)


def test_brf_pipeline_end_to_end(labeled):
    df = assemble_features(labeled, ["x1", "x2"])
    pipe = balanced_random_forest_pipeline(
        class_weight=balanced_weights(df), num_trees=10, max_depth=4
    )
    model = pipe.fit(df)
    preds = model.transform(df)
    metrics = evaluate_binary_classifier(preds)
    assert metrics["areaUnderROC"] > 0.9  # cleanly separable data
    # prob_positive is a real probability column
    probs = preds.select(prob_positive().alias("p")).agg(
        F.min("p").alias("lo"), F.max("p").alias("hi")
    ).first()
    assert 0.0 <= probs["lo"] <= probs["hi"] <= 1.0
    imp = feature_importances(model, ["x1", "x2"])
    assert list(imp["feature"]) [0] == "x1"  # the separating feature dominates
    assert abs(imp["importance"].sum() - 1.0) < 1e-6


def test_urf_pipeline_end_to_end(labeled):
    df = assemble_features(labeled, ["x1", "x2"])
    pipe = undersampled_random_forest_pipeline(
        target_imbalance_ratio=2.0, index_col="index", num_trees=10, max_depth=4
    )
    model = pipe.fit(df)
    preds = model.transform(df)  # transform does NOT resample (model stage)
    metrics = evaluate_binary_classifier(preds)
    assert metrics["areaUnderROC"] > 0.85
