"""Wave-9 operators: Lloyd k-means vs a NumPy reference, semantic-dedup
planted-copy recovery, epoch-schedule accounting invariants, and the
hashing-trick quality classifier vs a Python reimplementation."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.kmeans import (
    assign_cells,
    lloyd_kmeans,
    update_centroids,
)
from accident_prediction_montreal_spark.operators.mixing import epoch_schedule
from accident_prediction_montreal_spark.operators.text import quality_classifier


def _toy_vectors(n=40, dim=5, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randn(n, dim).round(3)


def _np_lloyd(x, k, n_iter):
    """Reference Lloyd: seeds = first k rows, argmin ties -> lowest cell,
    9-decimal-rounded means between rounds (mirrors the operator)."""
    cents = {i: x[i].copy() for i in range(k)}
    assign = None
    for it in range(n_iter):
        cells = sorted(cents)
        d2 = np.stack([((x - cents[c]) ** 2).sum(axis=1) for c in cells], axis=1)
        assign = np.array([cells[j] for j in d2.argmin(axis=1)])
        if it < n_iter - 1:
            cents = {
                c: np.round(x[assign == c].mean(axis=0), 9)
                for c in set(assign.tolist())
            }
    return assign


def test_lloyd_kmeans_matches_numpy(spark):
    x = _toy_vectors()
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id LONG, vec ARRAY<DOUBLE>",
    )
    got = {
        r["vec_id"]: r["cell"]
        for r in lloyd_kmeans(df, k=4, n_iter=2).collect()
    }
    want = _np_lloyd(x, k=4, n_iter=2)
    assert got == {i: int(c) for i, c in enumerate(want)}


def test_assign_cells_tie_breaks_to_lowest_cell(spark):
    # Two identical centroids: every point is equidistant -> cell 0 wins.
    vecs = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [0.0, -1.0])], "vec_id LONG, vec ARRAY<DOUBLE>"
    )
    cents = spark.createDataFrame(
        [(0, [5.0, 5.0]), (1, [5.0, 5.0])], "cell LONG, cvec ARRAY<DOUBLE>"
    )
    rows = assign_cells(vecs, cents).collect()
    assert {r["cell"] for r in rows} == {0}


def test_update_centroids_exact_mean(spark):
    assigned = spark.createDataFrame(
        [(0, [1.0, 2.0]), (0, [3.0, 6.0]), (1, [10.0, 0.0])],
        "cell LONG, vec ARRAY<DOUBLE>",
    )
    got = {r["cell"]: r["cvec"] for r in update_centroids(assigned).collect()}
    assert got[0] == [2.0, 4.0]
    assert got[1] == [10.0, 0.0]


def test_epoch_schedule_accounting(spark):
    # One huge and two small domains: small ones hit the 2-epoch cap and
    # carry a deficit; the big one trains under 1 epoch with none.
    rows = [("big", 1000)] * 10 + [("s1", 50)] * 2 + [("s2", 30)] * 2
    docs = spark.createDataFrame(rows, ["source", "n_chars"])
    out = {r["domain"]: r for r in epoch_schedule(docs).collect()}
    assert set(out) == {"big", "s1", "s2"}
    for r in out.values():
        assert 0.0 < r["epochs"] <= 2.0
        assert math.isclose(r["realized_units"], r["epochs"] * r["units"])
    assert out["s1"]["epochs"] == 2.0 and out["s1"]["deficit_units"] > 0
    assert out["s2"]["epochs"] == 2.0 and out["s2"]["deficit_units"] > 0
    assert out["big"]["epochs"] < 2.0  # uncapped
    assert abs(out["big"]["deficit_units"]) < 1e-6


def _py_score(text):
    toks = text.strip().lower().split()
    score = 0
    for t in toks:
        h = 0
        for ch in t:
            h = (h * 31 + ord(ch)) % 1_000_003
        score += (h % 64) * 2_654_435_761 % 2001 - 1000
    return len(toks), score


def test_quality_classifier_matches_python(spark):
    texts = ["the quick brown fox", "spark spark spark", "", "a b c d e f"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in quality_classifier(docs).collect()}
    for i, t in enumerate(texts):
        n, s = _py_score(t)
        assert got[i]["n_tokens"] == n
        assert got[i]["score_milli"] == s
        assert got[i]["keep"] == (1 if s >= 0 else 0)
        margin = s / (1000.0 * max(n, 1))
        assert math.isclose(
            got[i]["prob"], round(1.0 / (1.0 + math.exp(-margin)), 6), abs_tol=1e-9
        )


def test_curation_pipeline_stage_counts(spark):
    from accident_prediction_montreal_spark.plans import REGISTRY

    rows = REGISTRY["llm_curation_pipeline"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows, "curation pipeline produced no domains"
    for r in rows:
        # Monotone funnel per domain: raw >= quality-kept >= survivors.
        assert r["n_raw"] >= r["n_kept"] >= r["n_docs"] > 0
        assert 0.0 < r["epochs"] <= 2.0
    # The planted +100000 copies must die in the semantic-dedup stage:
    # every copy whose original passed quality shares its cell and cos~1.
    assert sum(r["n_kept"] - r["n_docs"] for r in rows) > 0


def test_lm_perplexity_rare_tokens_score_higher(spark):
    from accident_prediction_montreal_spark.operators.text import lm_perplexity

    docs = spark.createDataFrame(
        [
            (0, "the the the the"),  # all high-frequency
            (1, "the the the zyx"),  # one rare token
            (2, ""),  # no tokens -> absent
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in lm_perplexity(docs).collect()}
    assert set(rows) == {0, 1}
    assert rows[1]["avg_nll"] > rows[0]["avg_nll"]
    assert rows[1]["ppl"] > rows[0]["ppl"]
    # Hand-check doc 0: p(the) = (7+1)/(8+2) = 0.8 -> nll = -ln(0.8).
    import math

    assert abs(rows[0]["avg_nll"] - round(-math.log(0.8), 6)) < 2e-6


def test_asof_nearest_picks_closer_side_and_tie_backward(spark):
    from accident_prediction_montreal_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 205), (1, 400)], "k LONG, ts LONG"
    ).select("k", F.timestamp_micros((F.col("ts") * 1_000_000)).alias("ts"))
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 210, "b"), (1, 500, "c")], "k LONG, ts LONG, v STRING"
    ).select(
        "k", F.timestamp_micros((F.col("ts") * 1_000_000)).alias("ts"), "v"
    )
    out = {
        int(r["ts"].timestamp()): r["v_right"]
        for r in asof_join(
            left, right, by=["k"], value_cols=["v"], direction="nearest"
        ).collect()
    }
    assert out[100] == "a"  # 10 back vs 110 forward
    assert out[205] == "b"  # 5 forward vs 115 back
    assert out[400] == "c"  # 100 forward vs 190 back

    # Tie: gaps equal -> backward wins.
    left2 = spark.createDataFrame([(1, 200)], "k LONG, ts LONG").select(
        "k", F.timestamp_micros((F.col("ts") * 1_000_000)).alias("ts")
    )
    right2 = spark.createDataFrame(
        [(1, 150, "back"), (1, 250, "fwd")], "k LONG, ts LONG, v STRING"
    ).select("k", F.timestamp_micros((F.col("ts") * 1_000_000)).alias("ts"), "v")
    got = asof_join(
        left2, right2, by=["k"], value_cols=["v"], direction="nearest"
    ).collect()[0]["v_right"]
    assert got == "back"

    # Tolerance prunes a too-far nearest match.
    pruned = asof_join(
        left2, right2, by=["k"], value_cols=["v"], direction="nearest",
        tolerance_seconds=10,
    ).collect()[0]["v_right"]
    assert pruned is None


def test_lloyd_kmeans_rank_seeding_with_offset_ids(spark):
    """Seeds are the k smallest-id vectors BY RANK: offset/sparse id
    spaces must still yield exactly k seeds (filter(id < k) silently
    produced zero)."""
    x = _toy_vectors()
    df = spark.createDataFrame(
        [(1000 + 7 * i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id LONG, vec ARRAY<DOUBLE>",
    )
    rows = lloyd_kmeans(df, k=4, n_iter=2).collect()
    assert len(rows) == len(x)
    assert all(r["cell"] is not None for r in rows)
    # cell labels are the seed ids = the 4 smallest vec_ids
    assert {r["cell"] for r in rows} <= {1000, 1007, 1014, 1021}
    want = _np_lloyd(x, k=4, n_iter=2)
    got = {r["vec_id"]: r["cell"] for r in rows}
    assert got == {1000 + 7 * i: 1000 + 7 * int(c) for i, c in enumerate(want)}


def test_cell_cosine_pairs_matches_exact_join(spark):
    """The vectorized per-cell matmul pair stage returns exactly the
    above-threshold pairs the fold-exact join form produces (toy set:
    thresholds far from any fp summation-order hazard)."""
    from accident_prediction_montreal_spark.functions.vectors import (
        dot_product,
        l2_norm,
    )
    from accident_prediction_montreal_spark.operators.similarity import (
        cell_cosine_pairs,
    )
    from pyspark.sql import functions as F

    rows = [
        (0, 0, [1.0, 0.0, 0.0]),
        (1, 0, [1.0, 0.0, 0.0]),      # exact dup of 0
        (2, 0, [0.999, 0.01, 0.0]),   # near 0/1 (cos ~0.99995)
        (3, 0, [0.0, 1.0, 0.0]),      # orthogonal
        (4, 1, [1.0, 0.0, 0.0]),      # same dir as 0 but OTHER cell
        (5, 1, [0.5, 0.5, 0.0]),
        (6, 1, [0.5, 0.5, 1e-9]),     # near dup of 5
        (7, 2, [0.0, 0.0, 0.0]),      # zero vector: matches nothing
        (8, 2, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, cell LONG, vec ARRAY<DOUBLE>")
    t = 0.999
    got = {
        (r["cell"], r["id_a"], r["id_b"])
        for r in cell_cosine_pairs(df, t).collect()
    }
    a = df.select("cell", F.col("vec_id").alias("id_a"), F.col("vec").alias("va"))
    b = df.select("cell", F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"))
    cos = dot_product("va", "vb") / (l2_norm("va") * l2_norm("vb"))
    want = {
        (r["cell"], r["id_a"], r["id_b"])
        for r in a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= t)
        .collect()
    }
    assert got == want
    assert (0, 0, 1) in got and (1, 5, 6) in got
    assert not any(7 in (x[1], x[2]) for x in got)  # zero vector inert


def test_cell_cosine_pairs_nonlong_id_and_cell_types(spark):
    """r9 regression pin: the applyInPandas output schema is derived from
    the INPUT schema — int ids and string cells round-trip instead of
    hitting a hardcoded-long Arrow mismatch."""
    from accident_prediction_montreal_spark.operators.similarity import (
        cell_cosine_pairs,
    )

    rows = [
        (10, "a", [1.0, 0.0]),
        (20, "a", [1.0, 0.0]),   # dup of 10 within cell 'a'
        (30, "a", [0.0, 1.0]),
        (40, "b", [1.0, 0.0]),   # alone in cell 'b'
    ]
    df = spark.createDataFrame(rows, "vec_id INT, cell STRING, vec ARRAY<DOUBLE>")
    out = cell_cosine_pairs(df, 0.999)
    assert dict(out.dtypes) == {"cell": "string", "id_a": "int", "id_b": "int"}
    assert [(r["cell"], r["id_a"], r["id_b"]) for r in out.collect()] == [
        ("a", 10, 20)
    ]
