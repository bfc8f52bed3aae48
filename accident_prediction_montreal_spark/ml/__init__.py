from accident_prediction_montreal_spark.ml.random_undersampler import (
    RandomUnderSampler,
    RandomUnderSamplerModel,
)
from accident_prediction_montreal_spark.ml.class_weighter import ClassWeighter
from accident_prediction_montreal_spark.ml.evaluate import evaluate_binary_classifier
from accident_prediction_montreal_spark.ml.pipelines import (
    assemble_features,
    prob_positive,
    balanced_random_forest_pipeline,
    undersampled_random_forest_pipeline,
    feature_importances,
)

__all__ = [
    "RandomUnderSampler",
    "RandomUnderSamplerModel",
    "ClassWeighter",
    "evaluate_binary_classifier",
    "assemble_features",
    "prob_positive",
    "balanced_random_forest_pipeline",
    "undersampled_random_forest_pipeline",
    "feature_importances",
]
