"""Text analysis, dedup (exact / shingles / MinHash / SimHash / Jaccard),
similarity search, sessionization."""

from __future__ import annotations

from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    minhash_signatures_df,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from accident_prediction_montreal_spark.operators.sessionize import sessionize
from accident_prediction_montreal_spark.operators.similarity import cosine_topk
from accident_prediction_montreal_spark.operators.text import (
    fingerprint,
    language_id,
    text_quality,
    token_count,
    tokenize,
)


def test_tokenize_edges(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World "), (2, ""), (3, "   "), (4, "one")], ["i", "t"]
    )
    rows = {r["i"]: r["toks"] for r in df.select("i", tokenize("t").alias("toks")).collect()}
    assert rows[1] == ["hello", "world"]
    assert rows[2] == [] and rows[3] == []
    assert rows[4] == ["one"]


def test_text_quality_hand_computed(spark):
    df = spark.createDataFrame([(1, "The cat, the hat! 42")], ["doc_id", "text"])
    r = text_quality(df).first()
    assert r["n_chars"] == 20
    assert r["n_tokens"] == 5
    # punct ',' and '!' → 2/20; digits '4','2' → 2/20
    assert abs(r["punct_ratio"] - 0.1) < 1e-12
    assert abs(r["digit_ratio"] - 0.1) < 1e-12
    # 'the' twice of 5 tokens
    assert abs(r["stopword_ratio"] - 0.4) < 1e-12


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and that was it"),
            (2, "le chat est dans la maison et les oiseaux"),
            (3, "der Hund ist nicht mit der Katze und das"),
            (4, "xyzzy plugh"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["lang"] for r in df.select("doc_id", language_id("text").alias("lang")).collect()}
    assert got[1] == "en" and got[2] == "fr" and got[3] == "de" and got[4] == "und"


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "other text")], ["i", "t"]
    )
    fps = {r["i"]: r["fp"] for r in df.select("i", fingerprint("t").alias("fp")).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_exact_dedup_keeps_min(spark):
    df = spark.createDataFrame(
        [(3, "a"), (1, "a"), (2, "b")], ["doc_id", "text"]
    )
    kept = sorted(r["doc_id"] for r in exact_dedup(df, ["text"], "doc_id").collect())
    assert kept == [1, 2]


def test_word_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b"), (3, "x x x x")], ["i", "t"])
    rows = {r["i"]: r["s"] for r in df.select("i", word_shingles("t", 3).alias("s")).collect()}
    assert sorted(rows[1]) == ["a b c", "b c d"]
    assert rows[2] == []
    assert rows[3] == ["x x x"]  # distinct


def test_minhash_identical_docs_pair(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "completely different words entirely unrelated content here now")],
        ["doc_id", "text"],
    )
    sigs = {r["doc"]: r["sig"] for r in minhash_signatures_df(df).collect()}
    assert sigs[1] == sigs[2] != sigs[3]
    pairs = minhash_dedup_pairs(df, min_est_jaccard=0.9).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(1, 2)]
    assert pairs[0]["est_jaccard"] == 1.0


def test_simhash_locality(spark):
    a = "the quick brown fox jumps over the lazy dog " * 4
    b = a + "extra"
    df = spark.createDataFrame([(1, a), (2, a), (3, b)], ["i", "t"])
    hs = {r["i"]: r["h"] for r in df.select("i", simhash("t").alias("h")).collect()}
    assert hs[1] == hs[2]
    assert hs[1] >= 0
    # one extra token flips few bits
    ham = bin(hs[1] ^ hs[3]).count("1")
    assert ham <= 12


def test_ngram_jaccard_hand_computed(spark):
    # doc1: shingles {a b c, b c d} ; doc2: {a b c, b c e}
    # intersection 1, union 3 ⇒ jaccard 1/3.
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b c e")], ["doc_id", "text"])
    out = ngram_jaccard_pairs(df, min_jaccard=0.0).collect()
    assert len(out) == 1
    assert abs(out[0]["jaccard"] - 1 / 3) < 1e-12


def test_ngram_jaccard_max_doc_freq_drops_common(spark):
    # 'a b c' appears in all 3 docs → dropped at max_doc_freq=2; docs 1,2
    # still share 'b c d'.
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "a b c x")], ["doc_id", "text"]
    )
    out = ngram_jaccard_pairs(df, min_jaccard=0.0, max_doc_freq=2).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}
    assert out[0]["jaccard"] == 1.0  # rare-shingle sets are both exactly {'b c d'}


def test_cosine_topk_hand_computed(spark):
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    queries = spark.createDataFrame([(100, [1.0, 0.0])], ["query_id", "query_vec"])
    out = cosine_topk(queries, corpus, k=2).orderBy("rank").collect()
    assert [r["vec_id"] for r in out] == [1, 2]
    assert abs(out[0]["cosine"] - 1.0) < 1e-12


def test_sessionize_boundaries(spark):
    # gap 60 s: delta == 60 stays in-session, 61 starts a new one.
    rows = [
        (1, "2024-01-01 00:00:00", 1, 1.0),
        (1, "2024-01-01 00:01:00", 2, 2.0),
        (1, "2024-01-01 00:02:01", 3, 4.0),
        (2, "2024-01-01 00:00:00", 4, 8.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_s", "event_id", "value"]).withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    )
    out = sessionize(df, gap_seconds=60)
    sess = {(r["user_id"], r["session_id"]): r for r in out.collect()}
    assert len(sess) == 3
    assert sess[(1, 1)]["n_events"] == 2 and sess[(1, 1)]["value_sum"] == 3.0
    assert sess[(1, 2)]["n_events"] == 1 and sess[(1, 2)]["value_sum"] == 4.0
    assert sess[(2, 1)]["n_events"] == 1


def test_bpe_token_count_and_rolling_hash(spark):
    from accident_prediction_montreal_spark.operators.text import (
        bpe_token_count,
        rolling_hash,
    )

    df = spark.createDataFrame(
        [
            (0, "hello world"),        # 2 letter runs
            (1, "a1b!"),               # letters/digits/punct split: a, 1, b, !
            (2, ""),                   # empty -> 0 tokens, hash 0
            (3, "it's 42%"),           # it, ', s, " 42", %
        ],
        ["i", "t"],
    )
    rows = {r["i"]: r for r in df.select(
        "i",
        bpe_token_count("t").alias("n"),
        rolling_hash("t").alias("h"),
    ).collect()}
    assert rows[0]["n"] == 2
    assert rows[1]["n"] == 4
    assert rows[2]["n"] == 0 and rows[2]["h"] == 0
    assert rows[3]["n"] == 5

    # rolling hash reference model
    def rh(s, m=1_000_003):
        h = 0
        for ch in s:
            h = (h * 31 + ord(ch)) % m
        return h

    for i, text in [(0, "hello world"), (1, "a1b!"), (3, "it's 42%")]:
        assert rows[i]["h"] == rh(text)


def test_connected_components_chain_clique_pair(spark):
    from accident_prediction_montreal_spark.operators.components import (
        connected_components,
    )

    # transitivity chain (a~b~c~d), a triangle, an isolated pair, a self-loop
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (21, 20), (30, 30)],
        ["src", "dst"],
    )
    got = sorted(
        (r["node"], r["component"]) for r in connected_components(edges).collect()
    )
    assert got == sorted(
        [(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10), (12, 10), (20, 20), (21, 20)]
    )


def test_connected_components_long_path_converges_logarithmically(spark):
    from accident_prediction_montreal_spark.operators.components import (
        connected_components,
    )

    # A 64-node path is the worst case for label propagation (63 rounds);
    # the star algorithm must still finish inside max_iter=10.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], ["src", "dst"]
    )
    out = connected_components(edges, max_iter=10).collect()
    assert {r["component"] for r in out} == {0}
    assert sorted(r["node"] for r in out) == list(range(65))


def test_chunk_documents_boundaries(spark):
    from accident_prediction_montreal_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(13))),  # 13 toks: [1-8], [5-12], [9-13]
            (2, "a b"),  # single short chunk
            (3, ""),  # no chunks
            (4, " ".join(f"x{i}" for i in range(8))),  # exactly one window
        ],
        ["doc_id", "text"],
    )
    out = chunk_documents(df, chunk_size=8, stride=4)
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_tokens"], r["chunk_text"].split()[0])
        for r in out.collect()
    }
    assert got == {
        (1, 0): (8, "t0"),
        (1, 1): (8, "t4"),
        (1, 2): (5, "t8"),
        (2, 0): (2, "a"),
        (4, 0): (8, "x0"),
    }


def test_tfidf_topk_hand_computed(spark):
    import math

    from accident_prediction_montreal_spark.operators.text import tfidf_topk

    # 3 docs; "common" in all, "rare" only in doc 1 (twice).
    df = spark.createDataFrame(
        [(1, "rare rare common"), (2, "common other"), (3, "common other")],
        ["doc_id", "text"],
    )
    out = {(r["doc_id"], r["term"]): r for r in tfidf_topk(df, k=2).collect()}
    rare = out[(1, "rare")]
    assert rare["tf"] == 2 and rare["df"] == 1 and rare["rank"] == 1
    assert abs(rare["tfidf"] - round(2 * (math.log(4 / 2) + 1), 6)) < 1e-9
    common = out[(1, "common")]
    assert common["tf"] == 1 and common["df"] == 3 and common["rank"] == 2
    assert abs(common["tfidf"] - round(math.log(4 / 4) + 1, 6)) < 1e-9
    # doc 2: tie between common and other on tf; df differs -> other wins
    assert out[(2, "other")]["rank"] == 1 and out[(2, "common")]["rank"] == 2


def test_repetition_signals_hand_computed(spark):
    from accident_prediction_montreal_spark.operators.text import repetition_signals

    # doc 1: "a b a b a" -> bigrams [ab, ba, ab, ba] : n=4, distinct=2,
    # dup=0.5, top=0.5 ; doc 2: all-unique bigrams ; doc 3: single token -> none
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z"), (3, "solo")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["n_grams"], out[1]["n_distinct"]) == (4, 2)
    assert out[1]["dup_frac"] == 0.5 and out[1]["top_frac"] == 0.5
    assert (out[2]["n_grams"], out[2]["n_distinct"]) == (2, 2)
    assert out[2]["dup_frac"] == 0.0


def test_mask_pii(spark):
    import pyspark.sql.functions as F

    from accident_prediction_montreal_spark.operators.text import mask_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@mail.example.org today"),
            (2, "call +1 (514) 555-0199 now"),
            (3, "no pii here"),
        ],
        ["i", "t"],
    )
    got = {r["i"]: r["m"] for r in df.select("i", mask_pii("t").alias("m")).collect()}
    assert got[1] == "mail me at <EMAIL> today"
    assert got[2] == "call <PHONE> now"
    assert got[3] == "no pii here"


def test_pack_sequences_hand_computed(spark):
    from accident_prediction_montreal_spark.operators.packing import pack_sequences

    # shard A: 3+4+5 tokens, capacity 8: doc1 starts at 0 (bin 0),
    # doc2 at 3 (bin 0), doc3 at 7 (bin 0)... capacity 6: starts 0,3,7 -> bins 0,0,1
    df = spark.createDataFrame(
        [(1, "a", "a b c"), (2, "a", "d e f g"), (3, "a", "h i j k l"), (4, "b", "x y")],
        ["doc_id", "source", "text"],
    )
    out = {r["doc_id"]: r["seq_bin"] for r in pack_sequences(df, capacity=6).collect()}
    assert out == {1: 0, 2: 0, 3: 1, 4: 0}


def test_band_explode_matches_banded_signatures_nondefault_params(spark):
    """r9 regression pin: band_explode is THE banding layout — a probe
    built from the map-only signature column must collide with the
    banded_signatures index on every band, including under non-default
    (num_hashes, bands), or incremental dedup silently finds nothing."""
    from accident_prediction_montreal_spark.operators.dedup import (
        band_explode,
        banded_signatures,
        minhash_signature_hashed,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc{i}") for i in range(8)],
        ["doc_id", "text"],
    )
    for num_hashes, bands in ((32, 8), (16, 4), (24, 6)):
        idx = banded_signatures(docs, num_hashes=num_hashes, bands=bands).select(
            "doc", "band_id", "band_hash"
        )
        probe = (
            docs.select(
                F.col("doc_id").alias("doc"),
                minhash_signature_hashed(F.col("text"), num_hashes=num_hashes).alias("sig"),
            )
            .select("doc", band_explode("sig", num_hashes, bands).alias("b"))
            .select("doc", "b.band_id", "b.band_hash")
        )
        # Identical layouts -> symmetric difference is empty.
        assert idx.exceptAll(probe).count() == 0, (num_hashes, bands)
        assert probe.exceptAll(idx).count() == 0, (num_hashes, bands)
        assert probe.count() == 8 * bands, (num_hashes, bands)
