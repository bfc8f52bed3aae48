"""Raw-CSV accident preprocessing, result export, bucketed joins."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.ml.class_weighter import balanced_weights
from accident_prediction_montreal_spark.ml.export import (
    create_result_dir,
    write_params,
    write_results,
)
from accident_prediction_montreal_spark.ml.pipelines import (
    assemble_features,
    balanced_random_forest_pipeline,
)
from accident_prediction_montreal_spark.pipeline.accidents import (
    preprocess_accidents,
    read_raw_accidents,
)
from accident_prediction_montreal_spark.sources.bucketing import read_table, write_bucketed


def test_preprocess_accidents_from_raw_csv(spark, tmp_path):
    p = tmp_path / "acc.csv"
    p.write_text(
        "ACCIDENT_ID,DT_ACCDN,HEURE_ACCDN,LOC_LAT,LOC_LONG\n"
        '10,2017/03/01,"15:00:00-15:59:00",45.51,-73.61\n'
        '11,2017/03/02,"9:00:00-9:59:00",45.52,-73.62\n'
        "12,2017/03/03,,45.53,-73.63\n"  # missing hour → dropped
    )
    out = preprocess_accidents(read_raw_accidents(spark, str(p)))
    rows = {r["accident_id"]: r for r in out.collect()}
    assert set(rows) == {10, 11}
    assert rows[10]["hour"] == 15 and rows[11]["hour"] == 9
    assert str(rows[10]["date"]) == "2017-03-01"
    assert rows[10]["loc_lat"] == 45.51
    assert out.dtypes == [
        ("accident_id", "bigint"), ("date", "date"), ("hour", "int"),
        ("loc_lat", "double"), ("loc_long", "double"),
    ]


def test_export_results_layout(spark, tmp_path):
    rows = [(i, float(i % 4 == 0), (i % 10) / 10.0) for i in range(120)]
    df = assemble_features(
        spark.createDataFrame(rows, ["index", "label", "x1"]), ["x1"]
    )
    model = balanced_random_forest_pipeline(
        balanced_weights(df), num_trees=5, max_depth=3
    ).fit(df)
    preds = model.transform(df)

    d1 = create_result_dir(str(tmp_path), "brf")
    d2 = create_result_dir(str(tmp_path), "brf")
    assert d1.endswith("brf_1") and d2.endswith("brf_2")

    write_params(model, {"count_negative_samples": 90}, d1)
    params = open(d1 + "/params").read()
    assert "count_negative_samples: 90" in params and "numTrees: 5" in params

    metrics = write_results(spark, model, preds, preds, d1, feature_cols=["x1"])

    # The FOUR-FILE contract, byte-shaped to the reference
    # (export_results.py:17-46 + random_forest.py:174-231): params,
    # results, metrics.csv, feature_importances.csv — same names, same
    # headers, same line layout, so a consumer of the reference's
    # results/ directories can read the engine's unchanged.
    import os

    assert sorted(os.listdir(d1)) == [
        "feature_importances.csv", "metrics.csv", "params", "results",
    ]
    results = open(d1 + "/results").read()
    assert re.fullmatch(
        r"Test set:\n"
        r"\tArea Under PR = [0-9.eE+-]+\n"
        r"\tArea Under ROC = [0-9.eE+-]+\n"
        r"Train set:\n"
        r"\tArea Under PR = [0-9.eE+-]+\n"
        r"\tArea Under ROC = [0-9.eE+-]+\n",
        results,
    ), results
    assert 0 <= metrics["test"]["areaUnderROC"] <= 1
    header = open(d1 + "/metrics.csv").readline().rstrip("\n")
    assert header == (
        "Threshold,Precision,Recall,False positive rate,Accuracy,"
        "F1 Score,True negative percentage,True positive percentage,"
        "False negative percentage,False positive percentage"
    )
    # The sweep's sentinel grid point at (n+1)/n > 1 must NOT reach the
    # export: the reference grid (range(-1, n_points)) ends at 1.0.
    thresholds = [
        float(line.split(",")[0])
        for line in open(d1 + "/metrics.csv").read().splitlines()[1:]
    ]
    assert max(thresholds) <= 1.0
    fi_lines = open(d1 + "/feature_importances.csv").read().splitlines()
    assert fi_lines[0] == ",Feature importances"  # unnamed feature index
    assert fi_lines[1].startswith("x1,")
    imps = [float(line.split(",")[1]) for line in fi_lines[1:]]
    assert imps == sorted(imps, reverse=True)


def test_bucketed_join_no_shuffle(spark, tmp_path):
    a = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "t_a", ["k"], num_buckets=8, path=str(tmp_path / "t_a"))
    write_bucketed(b, "t_b", ["k"], num_buckets=8, path=str(tmp_path / "t_b"))
    # Disable broadcast so the plan exercises the big⋈big case bucketing
    # exists for (tiny test tables would otherwise broadcast, and the
    # planner then disables the bucketed scan as pointless).
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "t_a").join(read_table(spark, "t_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert "SortMergeJoin" in plan
        assert joined.count() == 1000
        # same join WITHOUT bucketing shuffles both sides
        pa = str(tmp_path / "pa")
        a.write.parquet(pa)
        plain = spark.read.parquet(pa).join(b, "k")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
