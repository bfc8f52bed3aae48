"""Decontamination + temperature mixing (r5 LLM-pipeline extensions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.decontam import (
    contamination_pairs,
    decontaminate,
)
from accident_prediction_montreal_spark.operators.mixing import (
    lcg_uniform,
    temperature_mix_rates,
    temperature_sample,
)


@pytest.fixture(scope="module")
def corpora(spark):
    # train doc 1 contains eval doc 100's text verbatim (planted
    # contamination); train doc 2 shares nothing; train doc 3 shares a
    # single trigram with eval 101 (below min_shared=2).
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six"),
            (3, "red green blue cyan magenta yellow"),
        ],
        ["doc_id", "text"],
    )
    eval_df = spark.createDataFrame(
        [
            (100, "beta gamma delta epsilon"),
            (101, "red green blue violet indigo"),
        ],
        ["doc_id", "text"],
    )
    return train, eval_df


def test_contamination_pairs_planted(corpora):
    train, eval_df = corpora
    # broadcast path (no cap)
    got = {
        (r["train_id"], r["eval_id"]): r["n_shared"]
        for r in contamination_pairs(train, eval_df, min_shared=1).collect()
    }
    # eval 100 has trigrams {bgd, gde, dee'}: all 2... "beta gamma delta",
    # "gamma delta epsilon" — both inside train doc 1.
    assert got[(1, 100)] == 2
    # train 3 and eval 101 share exactly "red green blue".
    assert got[(3, 101)] == 1
    assert (2, 100) not in got and (2, 101) not in got

    # min_shared threshold drops the single-trigram pair
    strict = contamination_pairs(train, eval_df, min_shared=2).collect()
    assert {(r["train_id"], r["eval_id"]) for r in strict} == {(1, 100)}

    # capped path agrees with the broadcast path on this tiny corpus
    capped = {
        (r["train_id"], r["eval_id"]): r["n_shared"]
        for r in contamination_pairs(
            train, eval_df, min_shared=1, max_doc_freq=10
        ).collect()
    }
    assert capped == got


def test_contamination_cap_drops_frequent_shingles(spark):
    # the same trigram in 3 docs; cap of 2 must drop it entirely
    train = spark.createDataFrame(
        [(1, "x y z a"), (2, "x y z b")], ["doc_id", "text"]
    )
    eval_df = spark.createDataFrame([(100, "x y z c")], ["doc_id", "text"])
    assert (
        contamination_pairs(train, eval_df, min_shared=1, max_doc_freq=2).count() == 0
    )
    assert (
        contamination_pairs(train, eval_df, min_shared=1, max_doc_freq=3).count() == 2
    )


def test_decontaminate_anti_join(corpora):
    train, eval_df = corpora
    kept = decontaminate(train, eval_df, min_shared=2)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 3]


def test_broadcast_plan_shape(corpora):
    train, eval_df = corpora
    plan = contamination_pairs(train, eval_df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # eval postings broadcast, train never shuffled


def test_temperature_rates_math(spark):
    # 70/30 split, tau=0.5: weights prop sqrt(0.7), sqrt(0.3)
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 70, "big").otherwise("small").alias("source"),
    )
    rates = {r["domain"]: r for r in temperature_mix_rates(docs, "source").collect()}
    import math

    wb, ws = math.sqrt(0.7), math.sqrt(0.3)
    assert rates["big"]["p_share"] == pytest.approx(0.7)
    assert rates["big"]["p_tau"] == pytest.approx(wb / (wb + ws), rel=1e-9)
    assert rates["small"]["p_tau"] == pytest.approx(ws / (wb + ws), rel=1e-9)
    # target half the corpus: 50 * p_tau docs expected from each domain
    assert rates["small"]["sample_rate"] == pytest.approx(
        50 * ws / (wb + ws) / 30, rel=1e-9
    )
    # low-resource domain is up-sampled relative to its share
    assert rates["small"]["sample_rate"] > rates["big"]["sample_rate"]


def test_temperature_rate_caps_at_one(spark):
    # an extreme split where the small domain's computed rate exceeds 1
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 998, "big").otherwise("tiny").alias("source"),
    )
    rates = {r["domain"]: r for r in temperature_mix_rates(docs, "source").collect()}
    assert rates["tiny"]["sample_rate"] == 1.0


def test_temperature_sample_deterministic(spark):
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("source"),
        F.lit("t").alias("text"),
    )
    a = sorted(r["doc_id"] for r in temperature_sample(docs).collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_sample(docs.repartition(7)).collect()
    )
    assert a == b  # partition-layout independent
    assert 0 < len(a) < 500
    # realized total near the target fraction
    assert len(a) == pytest.approx(250, abs=40)


def test_lcg_uniform_range(spark):
    vals = (
        spark.range(1000)
        .select(lcg_uniform(F.col("id")).alias("u"))
        .agg(F.min("u"), F.max("u"), F.avg("u"))
        .first()
    )
    assert 0.0 <= vals[0] and vals[1] < 1.0
    assert vals[2] == pytest.approx(0.5, abs=0.05)


def test_hash_split_deterministic_and_exhaustive(spark):
    from accident_prediction_montreal_spark.operators.mixing import hash_split

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(13)).collect()
    }
    assert a == b  # pure function of the id, layout-independent
    assert set(a.values()) <= {"train", "val", "test"}
    from collections import Counter

    c = Counter(a.values())
    assert c["train"] == pytest.approx(1600, abs=120)  # 80/10/10 default
    assert c["val"] == pytest.approx(200, abs=70)
    assert sum(c.values()) == 2000  # exhaustive, disjoint by construction


def test_hash_split_validates_weights(spark):
    from accident_prediction_montreal_spark.operators.mixing import hash_split

    docs = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        hash_split(docs, weights=(1.0,), names=("a", "b"))
    with pytest.raises(ValueError):
        hash_split(docs, weights=(0.0, 0.0), names=("a", "b"))


def test_lcg_uniform_negative_ids_stay_in_range(spark):
    vals = (
        spark.range(-500, 0)
        .select(lcg_uniform(F.col("id")).alias("u"))
        .agg(F.min("u").alias("lo"), F.max("u").alias("hi"))
        .first()
    )
    assert 0.0 <= vals["lo"] and vals["hi"] < 1.0


def test_hash_split_rejects_negative_weights(spark):
    from accident_prediction_montreal_spark.operators.mixing import hash_split

    docs = spark.range(5).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="non-negative"):
        hash_split(docs, weights=(1.5, -0.5), names=("a", "b"))


def test_lcg_uniform_full_width_no_stratum_collisions(spark):
    """Ids differing by exactly 1000003 (the old single-modulus period)
    must NOT share u — the round-6 CRT mix keeps full id width."""
    base = spark.range(200).select(
        (F.col("id") * 1000003).alias("doc_id")
    )
    n_distinct = (
        base.select(lcg_uniform(F.col("doc_id")).alias("u"))
        .agg(F.countDistinct("u").alias("n"))
        .first()["n"]
    )
    assert n_distinct == 200


def test_lcg_uniform_salts_decorrelate(spark):
    """Distinct salts produce (near-)independent uniforms on the SAME ids."""
    from accident_prediction_montreal_spark.operators.mixing import (
        SALT_SAMPLE,
        SALT_SPLIT,
    )

    row = (
        spark.range(4000)
        .select(
            lcg_uniform(F.col("id"), salt=SALT_SAMPLE).alias("ua"),
            lcg_uniform(F.col("id"), salt=SALT_SPLIT).alias("ub"),
        )
        .agg(F.corr("ua", "ub").alias("c"))
        .first()
    )
    assert abs(row["c"]) < 0.05


def test_sample_then_split_populates_all_buckets(spark):
    """The ADVICE-high regression: temperature_sample -> hash_split used
    one shared hash, so every sampled doc (u < rate <= 0.5) also fell
    under the u < 0.5 'train' cut and val/test came out EMPTY. With
    per-use salts the split of the sampled corpus must be proportional."""
    from collections import Counter

    from accident_prediction_montreal_spark.operators.mixing import hash_split

    docs = spark.range(4000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("source"),
    )
    sampled = temperature_sample(docs, "source", "doc_id", target_frac=0.5)
    out = hash_split(sampled, "doc_id", weights=(0.5, 0.25, 0.25))
    c = Counter(r["split"] for r in out.collect())
    n = sum(c.values())
    assert n == pytest.approx(2000, abs=150)
    # every bucket populated, near its weight
    assert c["train"] / n == pytest.approx(0.5, abs=0.06)
    assert c["val"] / n == pytest.approx(0.25, abs=0.05)
    assert c["test"] / n == pytest.approx(0.25, abs=0.05)


# --- semantic screen: strategy routing + input hygiene (r10) ---


@pytest.fixture(scope="module")
def emb_sides(spark):
    # 12 eval vectors; train 0-3 are exact copies of eval 100-103
    # (cosine 1.0), train 4-5 point elsewhere (cosine well under 0.95).
    import math

    def vec(i):
        a = 0.5 * i
        return [math.cos(a), math.sin(a), 0.25 * ((i % 3) - 1), 1.0]

    eval_rows = [(100 + i, vec(i)) for i in range(12)]
    train_rows = [(i, vec(i)) for i in range(4)]
    train_rows += [(4, [0.0, 0.0, 1.0, -1.0]), (5, [-1.0, 0.5, 0.0, 0.0])]
    eval_df = spark.createDataFrame(eval_rows, ["eval_id", "embedding"])
    train = spark.createDataFrame(train_rows, ["train_id", "embedding"])
    return train, eval_df


def _flags(df):
    return {(r.train_id, r.eval_id, round(r.cosine, 6)) for r in df.collect()}


def test_semantic_auto_routes_to_bucketed_over_cap(emb_sides):
    from accident_prediction_montreal_spark.operators.decontam import (
        semantic_contamination,
    )

    train, eval_df = emb_sides
    want = {(i, 100 + i, 1.0) for i in range(4)}
    # Broadcast form (cap comfortably holds) — the reference answer.
    assert _flags(semantic_contamination(train, eval_df, strategy="broadcast")) == want
    # Eval side EXCEEDS the cap: auto must degrade to the bucketed IVF
    # path (same output contract) instead of raising.
    got = semantic_contamination(
        train, eval_df, max_eval_rows=5, strategy="auto", n_cells=4, n_probe=4
    )
    assert _flags(got) == want
    # ... while explicit 'broadcast' stays loud on the same input.
    with pytest.raises(ValueError, match="max_eval_rows"):
        semantic_contamination(
            train, eval_df, max_eval_rows=5, strategy="broadcast"
        ).collect()


def test_semantic_bucketed_direct_matches_broadcast(emb_sides):
    from accident_prediction_montreal_spark.operators.decontam import (
        semantic_contamination,
    )

    train, eval_df = emb_sides
    ref = _flags(semantic_contamination(train, eval_df, strategy="broadcast"))
    got = _flags(
        semantic_contamination(
            train, eval_df, strategy="bucketed", n_cells=3, n_probe=3
        )
    )
    assert got == ref


def test_semantic_zero_norm_train_never_flags_any_strategy(spark, emb_sides):
    # Contract: a zero-norm train vector NEVER flags, at ANY threshold —
    # both physical strategies must agree. Pre-fix, the broadcast path
    # left zero-norm rows at cosine 0.0 vs every eval row (flagging at
    # threshold <= 0) while the bucketed path's -2.0 sentinel did not.
    from accident_prediction_montreal_spark.operators.decontam import (
        semantic_contamination,
    )

    _, eval_df = emb_sides
    train = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0, 0.0])],
        ["train_id", "embedding"],
    )
    for thr in (-1.0, 0.0):
        bc = _flags(
            semantic_contamination(
                train, eval_df, threshold=thr, strategy="broadcast"
            )
        )
        bk = _flags(
            semantic_contamination(
                train, eval_df, threshold=thr, strategy="bucketed",
                n_cells=3, n_probe=3,
            )
        )
        assert not any(tid == 0 for tid, _, _ in bc)
        assert {t for t, _, _ in bc} == {t for t, _, _ in bk} == {1}


def test_semantic_rejects_null_and_ragged_embeddings(spark, emb_sides):
    from accident_prediction_montreal_spark.operators.decontam import (
        semantic_contamination,
    )

    train, eval_df = emb_sides
    null_eval = spark.createDataFrame(
        [(200, [1.0, 0.0, 0.0, 0.0]), (201, None)], ["eval_id", "embedding"]
    )
    with pytest.raises(ValueError, match="null embedding in eval"):
        semantic_contamination(train, null_eval)
    null_train = spark.createDataFrame(
        [(10, [1.0, 0.0, 0.0, 0.0]), (11, None)], ["train_id", "embedding"]
    )
    with pytest.raises(Exception, match="null embedding in train"):
        semantic_contamination(null_train, eval_df).collect()
    ragged_eval = spark.createDataFrame(
        [(300, [1.0, 0.0]), (301, [1.0, 0.0, 0.0])], ["eval_id", "embedding"]
    )
    with pytest.raises(ValueError, match="ragged"):
        semantic_contamination(train, ragged_eval)


def test_semantic_rejects_unknown_strategy(emb_sides):
    from accident_prediction_montreal_spark.operators.decontam import (
        semantic_contamination,
    )

    train, eval_df = emb_sides
    with pytest.raises(ValueError, match="unknown strategy"):
        semantic_contamination(train, eval_df, strategy="magic")


def test_source_quota_invariant_under_layout(spark):
    # The quota keep-set must be IDENTICAL whatever the partition layout
    # — the reason the keep decision is a seeded lcg order, never
    # rand()/limit (which are layout-dependent).
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from accident_prediction_montreal_spark.operators.mixing import lcg_uniform

    rows = [(i, f"s{i % 5}", 10 + i % 7) for i in range(300)]
    base = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])

    def quota_ids(df, k=20):
        w = Window.partitionBy("source").orderBy(
            lcg_uniform(F.col("doc_id"), salt=7), F.col("doc_id")
        )
        kept = df.withColumn("rnk", F.row_number().over(w)).filter(
            F.col("rnk") <= k
        )
        return {(r.source, r.doc_id) for r in kept.collect()}

    a = quota_ids(base.repartition(1))
    b = quota_ids(base.repartition(16, "doc_id"))
    c = quota_ids(base.orderBy(F.col("doc_id").desc()).repartition(7))
    assert a == b == c
    assert all(
        sum(1 for s, _ in a if s == f"s{i}") == 20 for i in range(5)
    )
