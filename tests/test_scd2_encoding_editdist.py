"""r7 additions: SCD2 temporal join, out-of-fold target encoding,
edit-distance-1 similarity join, small-files compaction."""

from __future__ import annotations

import itertools
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.dedup import editdist1_pairs
from accident_prediction_montreal_spark.operators.encoding import oof_target_encode
from accident_prediction_montreal_spark.operators.scd2 import scd2_join
from accident_prediction_montreal_spark.sources.files import compact_partitions


@pytest.fixture(scope="module")
def scd2_frames(spark):
    facts = spark.createDataFrame(
        [
            (1, 10, datetime(2024, 1, 2)),    # version 0
            (2, 10, datetime(2024, 1, 15)),   # version 1
            (3, 10, datetime(2024, 1, 25)),   # open version 2
            (4, 10, datetime(2023, 12, 25)),  # before first version -> NULL
            (5, 10, datetime(2024, 1, 11)),   # gap day (v0 ends 01-10, v1 starts 01-12)
            (6, 99, datetime(2024, 1, 5)),    # key absent from dim -> NULL
            (7, 10, datetime(2024, 1, 12)),   # exactly at v1.valid_from -> v1
        ],
        "fact_id LONG, k LONG, ts TIMESTAMP",
    )
    dim = spark.createDataFrame(
        [
            (10, datetime(2024, 1, 1), datetime(2024, 1, 10), 100),
            (10, datetime(2024, 1, 12), datetime(2024, 1, 20), 101),
            (10, datetime(2024, 1, 20), None, 102),
        ],
        "k LONG, valid_from TIMESTAMP, valid_to TIMESTAMP, rate LONG",
    )
    return facts, dim


def test_scd2_semantics_and_strategy_parity(scd2_frames):
    facts, dim = scd2_frames
    want = {1: 100, 2: 101, 3: 102, 4: None, 5: None, 6: None, 7: 101}
    for strategy in ("broadcast", "asof"):
        out = scd2_join(facts, dim, key="k", ts_col="ts", strategy=strategy)
        got = {r["fact_id"]: r["rate_dim"] for r in out.collect()}
        assert got == want, (strategy, got)
        assert out.count() == facts.count()  # left semantics: no row loss


def test_oof_encoding_is_leakage_free(spark):
    # 2 categories x 3 folds with known per-fold label sums; each
    # (cat, fold) encoding must equal the mean over the OTHER folds only.
    rows = []
    fid = 0
    for cat, fold, n, n_pos in [
        ("a", 0, 4, 1), ("a", 1, 4, 3), ("a", 2, 2, 0),
        ("b", 0, 3, 3), ("b", 1, 3, 0), ("b", 2, 4, 2),
    ]:
        for i in range(n):
            rows.append((fid, cat, fold, 1.0 if i < n_pos else 0.0))
            fid += 1
    df = spark.createDataFrame(rows, "rid LONG, cat STRING, fold INT, y DOUBLE")

    # Force the operator's LCG fold to the planted fold: monkeypatch via
    # a key engineered per row is brittle — instead call the internals
    # the way the operator does but with the planted fold column.
    from pyspark.sql import Window

    per = df.groupBy("cat", "fold").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("y")
    )
    by_cat = Window.partitionBy("cat")
    got = {
        (r["cat"], r["fold"]): (r["oof_y"], r["oof_n"])
        for r in per.select(
            "cat",
            "fold",
            (F.sum("y").over(by_cat) - F.col("y")).alias("oof_y"),
            (F.sum("n").over(by_cat) - F.col("n")).alias("oof_n"),
        ).collect()
    }
    assert got[("a", 0)] == (3.0, 6)   # folds 1+2: 3 pos / 6 rows
    assert got[("b", 1)] == (5.0, 7)   # folds 0+2: 5 pos / 7 rows

    # End-to-end operator: deterministic fold from the row id, encoding
    # equals the brute-forced leave-own-fold-out mean (smoothing=0).
    from accident_prediction_montreal_spark.operators.mixing import lcg_uniform

    with_fold = df.withColumn(
        "lcg_fold", F.floor(lcg_uniform("rid", salt=7) * 3).cast("int")
    )
    enc = oof_target_encode(df, "cat", "y", fold_key="rid", folds=3, salt=7)
    brute = {}
    data = [(r["cat"], r["lcg_fold"], r["y"]) for r in with_fold.collect()]
    for cat, fold in {(c, f) for c, f, _ in data}:
        others = [y for c, f, y in data if c == cat and f != fold]
        brute[(cat, fold)] = sum(others) / len(others) if others else None
    for r in enc.collect():
        want = brute[(r["cat"], r["fold"])]
        if want is None:
            assert r["encoding"] is None
        else:
            assert r["encoding"] == pytest.approx(want, abs=1e-12)


def test_editdist1_matches_brute_force(spark):
    rows = [
        (1, "data-15"), (2, "data-16"), (3, "gate-15"), (4, "date-15"),
        (5, "pipe-99"), (6, "data-15"), (7, "ab"), (8, "ba"),
        (9, "data-150"), (10, "x"), (11, ""),
    ]

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    df = spark.createDataFrame(rows, "doc_id LONG, title STRING")
    got = sorted(tuple(r) for r in editdist1_pairs(df, "doc_id", "title").collect())
    want = sorted(
        (i, j, lev(a, b))
        for (i, a), (j, b) in itertools.combinations(rows, 2)
        if lev(a, b) <= 1
    )
    assert got == want


def test_editdist1_bucket_cap_drops_degenerate_keys(spark):
    # 50 identical titles would form C(50,2) pairs; the cap must kill the
    # bucket entirely rather than emit a quadratic blowup.
    rows = [(i, "same") for i in range(50)] + [(100, "dog"), (101, "dot")]
    df = spark.createDataFrame(rows, "doc_id LONG, title STRING")
    capped = editdist1_pairs(df, "doc_id", "title", max_bucket_size=10).collect()
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(100, 101)}


def test_compaction_layout_is_deterministic(spark, tmp_path):
    df = spark.range(950).select(
        (F.col("id") % 3).cast("string").alias("p"), F.col("id").alias("v")
    )
    frag = str(tmp_path / "frag")
    df.repartition(7).write.partitionBy("p").parquet(frag)
    out = str(tmp_path / "out")
    compact_partitions(spark.read.parquet(frag), out, "p", max_records_per_file=100)
    back = spark.read.parquet(out).withColumn("__f", F.input_file_name())
    per = {
        r["p"]: (r["n"], r["files"])
        for r in back.groupBy("p")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("__f").alias("files"))
        .collect()
    }
    import math

    for p, (n, files) in per.items():
        assert files == math.ceil(n / 100), per
    assert back.agg(F.sum("v")).collect()[0][0] == sum(range(950))


def test_gap_fill_lvcf_hand_case(spark):
    from accident_prediction_montreal_spark.operators.timeseries import gap_fill_lvcf

    rows = [
        (1, datetime(2024, 1, 1, 0, 15), 10.0),
        (1, datetime(2024, 1, 1, 0, 45), 11.0),   # same hour, later -> obs=11
        (1, datetime(2024, 1, 1, 3, 5), 30.0),    # hours 1,2 carried
        (2, datetime(2024, 1, 1, 5, 0), 50.0),    # single point, 1 bucket
    ]
    ev = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP, value DOUBLE")
    out = {
        (r["user_id"], r["grid_ts"].hour): (r["obs_value"], r["filled_value"], r["is_carried"])
        for r in gap_fill_lvcf(ev).collect()
    }
    assert out[(1, 0)] == (11.0, 11.0, False)
    assert out[(1, 1)] == (None, 11.0, True)
    assert out[(1, 2)] == (None, 11.0, True)
    assert out[(1, 3)] == (30.0, 30.0, False)
    assert out[(2, 5)] == (50.0, 50.0, False)
    assert len(out) == 5


def test_interval_coverage_hand_case(spark):
    from accident_prediction_montreal_spark.operators.timeseries import (
        interval_coverage,
    )

    rows = [
        # overlapping pair -> one island [0, 90min)
        (1, datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 1, 0)),
        (1, datetime(2024, 1, 1, 0, 30), datetime(2024, 1, 1, 1, 30)),
        # touching -> merges (strict > test)
        (1, datetime(2024, 1, 1, 1, 30), datetime(2024, 1, 1, 2, 0)),
        # disjoint second island
        (1, datetime(2024, 1, 1, 5, 0), datetime(2024, 1, 1, 5, 30)),
        # contained interval must not extend its island
        (2, datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 4, 0)),
        (2, datetime(2024, 1, 1, 1, 0), datetime(2024, 1, 1, 2, 0)),
    ]
    iv = spark.createDataFrame(rows, "user_id LONG, start_ts TIMESTAMP, end_ts TIMESTAMP")
    got = {r["user_id"]: (r["n_islands"], r["covered_us"]) for r in
           interval_coverage(iv).collect()}
    assert got[1] == (2, (120 + 30) * 60 * 1_000_000)
    assert got[2] == (1, 4 * 3600 * 1_000_000)
