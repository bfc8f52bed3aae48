"""EWMA, top-k, cumulative windows, threshold sweep, count-rate model,
target encoding — hand-computed expectations."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.encoding import target_encode
from accident_prediction_montreal_spark.operators.metrics import (
    count_rate_model,
    threshold_sweep,
)
from accident_prediction_montreal_spark.operators.windows import (
    cumulative_sum,
    exp_weighted_moving_average,
    rolling_midpoints,
    top_k_per_group,
)


def test_ewma_single_spike_decay(spark):
    # One risky hour at t=0; weights w_t = exp(0.5·t)/Σ — output at row k
    # is the (k)-lagged weight.
    rows = [(1, t, 1.0 if t == 0 else 0.0) for t in range(6)]
    df = spark.createDataFrame(rows, ["sid", "t", "risky"])
    ew = exp_weighted_moving_average("risky", ["sid"], ["t"], window_size=4, rate=0.5)
    got = {r["t"]: r["e"] for r in df.select("t", ew.alias("e")).collect()}
    raw = [math.exp(0.5 * t) for t in range(-3, 1)]
    norm = sum(raw)
    # at t=k the spike sits k rows back ⇒ weight index (3-k)
    for k in range(4):
        assert abs(got[k] - raw[3 - k] / norm) < 1e-12
    assert got[4] == 0.0 and got[5] == 0.0


def test_ewma_weights_sum_to_one(spark):
    # All-ones input ⇒ steady state exactly 1.0 once the window is full.
    df = spark.createDataFrame([(1, t, 1.0) for t in range(10)], ["sid", "t", "x"])
    ew = exp_weighted_moving_average("x", ["sid"], ["t"], window_size=4, rate=0.5)
    got = df.select("t", ew.alias("e")).filter(F.col("t") >= 3).collect()
    for r in got:
        assert abs(r["e"] - 1.0) < 1e-12


def test_top_k_rank_vs_row_number(spark):
    df = spark.createDataFrame(
        [("g", 1, 10.0), ("g", 2, 10.0), ("g", 3, 5.0), ("g", 4, 1.0)],
        ["grp", "id", "score"],
    )
    ties = top_k_per_group(df, ["grp"], [F.col("score").desc()], k=1, keep_ties=True)
    assert {r["id"] for r in ties.collect()} == {1, 2}  # rank keeps both 10.0s
    strict = top_k_per_group(
        df, ["grp"], [F.col("score").desc(), F.col("id").asc()], k=1
    )
    assert [r["id"] for r in strict.collect()] == [1]


def test_cumulative_and_suffix(spark):
    df = spark.createDataFrame([("g", i, 1.0) for i in range(1, 5)], ["grp", "i", "x"])
    pre = cumulative_sum("x", ["grp"], ["i"])
    suf = cumulative_sum("x", ["grp"], ["i"], reverse_exclusive=True)
    rows = {r["i"]: (r["p"], r["s"]) for r in df.select("i", pre.alias("p"), suf.alias("s")).collect()}
    assert rows[1] == (1.0, 3.0) and rows[4] == (4.0, None)


def test_rolling_midpoints_densifies(spark):
    df = spark.createDataFrame(
        [("s", 0.0, 0.0), ("s", 0.0, 2.0)], ["street", "lat", "lon"]
    )
    out = rolling_midpoints(df, ["street"], ["lon"], ["lat", "lon"])
    lons = sorted(r["lon"] for r in out.collect())
    assert lons == [0.0, 1.0, 2.0]  # original two + midpoint


def test_threshold_sweep_hand_computed(spark):
    # 4 examples, n=2 buckets. probs/labels:
    #   (0.1, 0) (0.3, 0) (0.6, 1) (0.9, 1)
    # id_bucket = floor(p*2): 0,0,1,1. At threshold 0.5 (id_bucket 0):
    # predicted positive = prob bucket > 0 ⇒ tp=2 fp=0 tn=2 fn=0.
    df = spark.createDataFrame(
        [(0.1, 0), (0.3, 0), (0.6, 1), (0.9, 1)], ["prob_positive", "label"]
    )
    out = {r["threshold"]: r for r in threshold_sweep(spark, df, n_points=2).collect()}
    assert set(out) == {0.0, 0.5, 1.0, 1.5}
    top = out[1.5]  # above-the-grid threshold: nothing predicted positive
    assert (top["true_positive"], top["false_positive"], top["true_negative"], top["false_negative"]) == (0, 0, 2, 2)
    mid = out[0.5]
    assert (mid["true_positive"], mid["false_positive"], mid["true_negative"], mid["false_negative"]) == (2, 0, 2, 0)
    assert mid["precision"] == 1.0 and mid["recall"] == 1.0 and mid["accuracy"] == 1.0
    lo = out[0.0]  # everything predicted positive
    assert (lo["true_positive"], lo["false_positive"]) == (2, 2)
    assert lo["precision"] == 0.5 and lo["recall"] == 1.0
    hi = out[1.0]  # nothing predicted positive; recall defined as 0
    assert (hi["true_positive"], hi["false_negative"]) == (0, 2)
    assert hi["recall"] == 0.0 and hi["precision"] is None


def test_count_rate_model_hand_computed(spark):
    # counts: 1→(2 rows, 1 pos), 3→(1 row, 1 pos), 5→(1 row, 0 pos)
    df = spark.createDataFrame(
        [(1, 1), (1, 0), (3, 1), (5, 0)], ["accident_count", "label"]
    )
    out = {r["threshold"]: r for r in count_rate_model(df).collect()}
    assert out[1]["n_at_or_above"] == 4 and abs(out[1]["p_positive"] - 0.5) < 1e-12
    assert out[3]["n_at_or_above"] == 2 and abs(out[3]["p_positive"] - 0.5) < 1e-12
    assert out[5]["n_at_or_above"] == 1 and out[5]["p_positive"] == 0.0


def test_target_encode_hand_computed(spark):
    # cat A: 2 rows 1 pos; cat B: 2 rows 0 pos. n_all=4, n_pos=1.
    # risk(A) = 1/1 − 2/4 = 0.5 ; risk(B) = 0 − 0.5 = −0.5.
    df = spark.createDataFrame(
        [("A", 1), ("A", 0), ("B", 0), ("B", 0)], ["cat", "label"]
    )
    out = {r["cat"]: r for r in target_encode(df, "cat").collect()}
    assert abs(out["A"]["risk"] - 0.5) < 1e-12 and out["A"]["risk_index"] == 1
    assert abs(out["B"]["risk"] + 0.5) < 1e-12 and out["B"]["risk_index"] == 2
