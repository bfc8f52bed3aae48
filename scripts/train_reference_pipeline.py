"""End-to-end training run — the engine's equivalent of the reference's
mains (mains/main_train_{brf,urf}.py + export_results.py): fixtures →
matching → weather → dataset → model → evaluation → exported results.

Usage: python scripts/train_reference_pipeline.py [brf|urf|gbt] [out_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.ml.functions import array_to_vector
from pyspark.sql import functions as F

from accident_prediction_montreal_spark import get_session
from accident_prediction_montreal_spark.ml.class_weighter import balanced_weights
from accident_prediction_montreal_spark.ml.export import (
    create_result_dir,
    write_params,
    write_results,
)
from accident_prediction_montreal_spark.ml.pipelines import (
    balanced_random_forest_pipeline,
    undersampled_random_forest_pipeline,
)
from accident_prediction_montreal_spark.ml.tuning import gbt_pipeline
from accident_prediction_montreal_spark.pipeline import (
    build_dataset,
    generate_accidents,
    generate_road_points,
    generate_station_coords,
    generate_weather,
    negative_samples,
    positive_samples,
)
from accident_prediction_montreal_spark.pipeline.dataset import FEATURES_COL


def main() -> None:
    algo = sys.argv[1] if len(sys.argv) > 1 else "brf"
    out_base = sys.argv[2] if len(sys.argv) > 2 else "/tmp/apm_results"
    spark = get_session(f"train-{algo}")

    roads = generate_road_points(spark, n_streets=40).cache()
    accidents = generate_accidents(spark, roads, n=150, days=25).cache()
    weather = generate_weather(spark, n_stations=5, days=25)
    stations = generate_station_coords(spark, n_stations=5)

    pos = positive_samples(spark, accidents, roads, weather, stations).persist()
    neg = negative_samples(
        spark, roads, weather, stations, "2017-01-01", "2017-01-25", sample_ratio=0.05
    ).persist()
    train, test = build_dataset(spark, pos, neg, split_date="2017-01-18")
    to_ml = lambda df: (  # noqa: E731
        df.withColumn("features", array_to_vector("features_arr")).na.drop().persist()
    )
    train, test = to_ml(train), to_ml(test)
    n_neg = train.filter(F.col("label") == 0.0).count()

    if algo == "brf":
        pipe = balanced_random_forest_pipeline(balanced_weights(train), num_trees=30, max_depth=8)
    elif algo == "urf":
        pipe = undersampled_random_forest_pipeline(
            target_imbalance_ratio=4.0, index_col="sample_id", num_trees=30, max_depth=8
        )
    elif algo == "gbt":
        pipe = gbt_pipeline(class_weight=balanced_weights(train), max_iter=10, max_depth=5)
    else:
        raise SystemExit(f"unknown algorithm {algo!r}")

    model = pipe.fit(train)
    result_dir = create_result_dir(out_base, algo)
    write_params(model, {"count_negative_samples": n_neg}, result_dir)
    metrics = write_results(
        spark,
        model,
        model.transform(test),
        model.transform(train),
        result_dir,
        feature_cols=FEATURES_COL if algo != "gbt" else None,
    )
    print(f"results written to {result_dir}")
    print(
        f"test AUPRC={metrics['test']['areaUnderPR']:.4f} "
        f"AUROC={metrics['test']['areaUnderROC']:.4f}"
    )


if __name__ == "__main__":
    main()
