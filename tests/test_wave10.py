"""Wave-10: JSONL roundtrip corrupt capture, BPE merge step, image dedup."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_jsonl_corrupt_lines_captured(spark):
    from accident_prediction_montreal_spark.plans import REGISTRY

    rows = {
        r["source"]: r
        for r in REGISTRY["s13_jsonl_roundtrip"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert rows["__corrupt__"]["n_corrupt"] == 2
    assert rows["__corrupt__"]["n_docs"] == 0
    real = [r for s, r in rows.items() if s != "__corrupt__"]
    assert sum(r["n_docs"] for r in real) > 0
    assert all(r["n_corrupt"] == 0 for r in real)


def test_bpe_merges_counts_by_word_frequency(spark):
    from accident_prediction_montreal_spark.operators.text import tokenize

    # "abab" x3 + "ab" x2: pair "ab" appears 2*3 + 1*2 = 8, "ba" 3.
    docs = spark.createDataFrame(
        [(1, "abab abab ab"), (2, "abab ab")], "doc_id LONG, text STRING"
    )
    vocab = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.length("t") >= 2)
    )
    pairs = (
        vocab.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("t") - 1),
                    lambda i: F.col("t").substr(i, F.lit(2)),
                )
            ).alias("pair"),
            "freq",
        )
        .groupBy("pair")
        .agg(F.sum("freq").alias("n"))
    )
    got = {r["pair"]: r["n"] for r in pairs.collect()}
    assert got == {"ab": 8, "ba": 3}


def test_image_dedup_groups_families(spark):
    from accident_prediction_montreal_spark.plans import REGISTRY

    out = REGISTRY["mm_image_dedup"].fn(spark, "/root/testdata/sf0.001").collect()
    by_id = {r["media_id"]: r for r in out}
    # doc_id and doc_id+251 share a family -> same hash+checksum group
    fam_mates = [(i, i + 251) for i in range(3) if i + 251 in by_id]
    assert fam_mates, "fixture too small for family check"
    for a, b in fam_mates:
        assert by_id[a]["ahash"] == by_id[b]["ahash"]
        assert by_id[a]["canonical_id"] == by_id[b]["canonical_id"] == a
        assert by_id[a]["n_members"] >= 2
    # different families must not share a (hash, checksum) group
    assert by_id[0]["canonical_id"] != by_id[1]["canonical_id"]


def test_dataset_card_total_row(spark):
    from accident_prediction_montreal_spark.plans import REGISTRY

    rows = REGISTRY["llm_dataset_card"].fn(spark, "/root/testdata/sf0.001").collect()
    total = [r for r in rows if r["is_total"] == 1]
    per = [r for r in rows if r["is_total"] == 0]
    assert len(total) == 1 and total[0]["source"] == "__all__"
    assert total[0]["n_docs"] == sum(r["n_docs"] for r in per)
    assert total[0]["tokens_sum"] == sum(r["tokens_sum"] for r in per)


def test_incremental_minhash_shapes(spark):
    """minhash_incremental_pairs joins new-batch bands against the corpus
    index only: planted copy found at est 1.0, novel doc clean, no
    corpus-vs-corpus pair ever emitted."""
    from accident_prediction_montreal_spark.operators.dedup import (
        minhash_incremental_pairs,
    )

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven"),
         (3, "alpha beta gamma delta epsilon zeta")],  # corpus-internal dup
        "doc_id LONG, text STRING",
    )
    batch = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta"),   # copy of 1 and 3
         (101, "totally novel words qqq www eee rrr")],
        "doc_id LONG, text STRING",
    )
    got = {
        (r["new_id"], r["corpus_id"]): r["est_jaccard"]
        for r in minhash_incremental_pairs(batch, corpus).collect()
    }
    assert got.get((100, 1)) == 1.0 and got.get((100, 3)) == 1.0
    assert all(k[0] in (100, 101) for k in got)   # never corpus-vs-corpus
    assert not any(k[0] == 101 for k in got)      # novel doc clean


def test_isotonic_fit_is_monotone_and_mass_preserving(spark):
    from accident_prediction_montreal_spark.plans import REGISTRY

    rows = sorted(
        REGISTRY["m18_isotonic_calibration"].fn(
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r["bin"],
    )
    iso = [r["iso_prob"] for r in rows]
    assert iso == sorted(iso)  # monotone non-decreasing
    # weighted mean preserved (PAV property), up to rounding
    n_tot = sum(r["n"] for r in rows)
    raw = sum(r["n"] * r["frac_pos"] for r in rows) / n_tot
    fit = sum(r["n"] * r["iso_prob"] for r in rows) / n_tot
    assert abs(raw - fit) < 1e-4
