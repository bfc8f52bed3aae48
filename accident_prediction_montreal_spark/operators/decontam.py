"""Train/eval decontamination: flag training documents that share word
n-grams with an evaluation set (north-star LLM-pipeline extension; the
standard pretraining hygiene step — remove benchmark text from the
training corpus before fitting).

Spark-first shape — the same postings-bucket pattern as
``dedup.ngram_jaccard_pairs`` (one map pass over each side, shuffles
carry 8-byte shingle hashes, never text):

  * both sides explode to (shingle_hash, doc) postings via
    ``word_shingle_hashes`` (distinct word-n-grams, 64-bit xxhash — the
    injective-in-practice mapping preserves overlap COUNTS, so a SQL
    oracle computing over string n-grams agrees);
  * postings are bucketed per shingle with train/eval docs collected
    separately, dropping shingles whose COMBINED document frequency
    exceeds ``max_doc_freq`` — frequent n-grams aren't evidence of
    contamination but create quadratic skew (a shingle in 10⁶ train docs
    × 10³ eval docs would emit 10⁹ pairs);
  * train×eval pairs are generated intra-bucket and aggregated to
    (train_id, eval_id, n_shared).

At 100 TB the eval side is tiny (benchmarks are ~10⁴-10⁶ docs), so with
``max_doc_freq=None`` the operator instead broadcasts the eval postings
and never shuffles the train side at all — one map stage + one partial
agg. The capped path is the one under the DuckDB oracle (the cap needs
a global shingle-frequency window either way).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.dedup import word_shingle_hashes


def contamination_pairs(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 1,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(train_id, eval_id, n_shared): distinct word-``n``-grams shared by
    each contaminated (train doc, eval doc) pair, pairs with
    ``n_shared >= min_shared`` only.

    ``max_doc_freq`` drops shingles appearing in more than that many
    documents ACROSS BOTH SIDES before any pair is formed. When None,
    the eval postings are broadcast (the 100-TB plan: eval sets are
    small); when set, both sides shuffle once on the shingle hash.
    """
    t_post = train.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingle_hashes(text_col, n)).alias("sh"),
    )
    e_post = eval_df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingle_hashes(text_col, n)).alias("sh"),
    )

    if max_doc_freq is None:
        pairs = (
            t_post.withColumnRenamed("doc", "train_id")
            .join(
                F.broadcast(e_post.withColumnRenamed("doc", "eval_id")),
                "sh",
            )
            .groupBy("train_id", "eval_id")
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )
        return pairs.filter(F.col("n_shared") >= min_shared)

    # Capped path: one bucket shuffle keyed by shingle, train/eval docs
    # collected per bucket (linear lineage — the map runs once per side;
    # see ngram_jaccard_pairs on why branching re-evaluates map stages).
    posts = t_post.withColumn("is_train", F.lit(True)).unionAll(
        e_post.withColumn("is_train", F.lit(False))
    )
    buckets = (
        posts.groupBy("sh")
        .agg(
            F.collect_list(F.when(F.col("is_train"), F.col("doc"))).alias("ts"),
            F.collect_list(F.when(~F.col("is_train"), F.col("doc"))).alias("es"),
        )
        .filter(
            (F.size("ts") + F.size("es") <= max_doc_freq)
            & (F.size("ts") >= 1)
            & (F.size("es") >= 1)
        )
    )

    def cross(ts: Column, es: Column) -> Column:
        return F.flatten(
            F.transform(
                ts,
                lambda t: F.transform(es, lambda e: F.struct(t.alias("t"), e.alias("e"))),
            )
        )

    pairs = (
        buckets.select(F.explode(cross(F.col("ts"), F.col("es"))).alias("p"))
        .groupBy(
            F.col("p.t").alias("train_id"),
            F.col("p.e").alias("eval_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return pairs.filter(F.col("n_shared") >= min_shared)


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_shared: int = 1,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Training frame minus contaminated docs (left_anti on the flagged
    train ids — composes the J4 first-class anti-join)."""
    flagged = (
        contamination_pairs(
            train, eval_df, id_col, text_col, n, min_shared, max_doc_freq
        )
        .select(F.col("train_id").alias(id_col))
        .distinct()
    )
    return train.join(flagged, id_col, "left_anti")


def semantic_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.95,
    train_id: str = "train_id",
    eval_id: str = "eval_id",
    vec_col: str = "embedding",
    max_eval_rows: int | None = 100_000,
) -> DataFrame:
    """EMBEDDING-level train/eval contamination — the semantic screen run
    beside the n-gram one (``contamination_pairs``): paraphrased or
    re-worded eval leakage shares almost no shingles but keeps a high
    embedding cosine, so production decontamination reports both
    screens. Returns one row per contaminated train doc:
    (train_id, eval_id, cosine) for its BEST eval match at or above
    ``threshold`` (ties broken by eval_id for determinism).

    Scale shape: eval sets are small by nature (thousands of benchmark
    rows vs a 100-TB corpus), so the unit-normalized eval MATRIX rides a
    broadcast into an Arrow-batched ``mapInPandas`` pass: each train
    batch is one numpy matmul against every eval vector (the SemDeDup
    pair-stage lesson — a crossJoin evaluating the fold-based cosine per
    pair is interpreted per element and measured 50× slower at 50k×1.4k
    pairs), the argmax and threshold resolve INSIDE the batch, and the
    train side never shuffles at all — the output is only the flagged
    fraction. BLAS summation order differs from a sequential fold by
    ~1e-15 relative, immaterial at any realistic threshold margin.
    ``max_eval_rows`` bounds the driver collect/broadcast and makes a
    misused giant eval side loud; the giant-eval path is the IVF/LSH
    bucketed join, not this operator.
    """
    import numpy as np
    from pyspark.sql import types as T

    ev_rows = (
        eval_df.select(
            F.col(eval_id), F.col(vec_col).cast("array<double>").alias("v")
        )
        .orderBy(eval_id)
        .limit((max_eval_rows + 1) if max_eval_rows is not None else 2**31 - 1)
        .collect()
    )
    if max_eval_rows is not None and len(ev_rows) > max_eval_rows:
        raise ValueError(
            f"semantic_contamination eval side exceeds max_eval_rows="
            f"{max_eval_rows}: the broadcast-matmul form is for benchmark-"
            "sized eval sets; bucket with IVF/LSH instead, or raise the cap"
        )
    # Sorted ascending by eval_id: numpy argmax returns the FIRST max,
    # which is then exactly the (cosine DESC, eval_id ASC) tie-break.
    # dtype inferred: numeric ids become int64, string ids stay objects —
    # either indexes fine and Arrow casts to the declared output type.
    ev_ids = np.array([r[0] for r in ev_rows])
    ev = np.stack([np.asarray(r[1], dtype=np.float64) for r in ev_rows])
    ev_norm = np.sqrt((ev * ev).sum(axis=1, keepdims=True))
    ev_norm[ev_norm == 0.0] = 1.0
    ev_unit_t = (ev / ev_norm).T  # (dim, n_eval)
    sc = train.sparkSession.sparkContext
    bc = sc.broadcast((ev_ids, ev_unit_t))

    id_type = train.schema[train_id].dataType
    eval_id_type = eval_df.schema[eval_id].dataType
    out_schema = T.StructType(
        [
            T.StructField(train_id, id_type),
            T.StructField(eval_id, eval_id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def probe(batches):
        import pandas as pd

        ids_e, eut = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            xn = np.sqrt((x * x).sum(axis=1, keepdims=True))
            xn[xn == 0.0] = 1.0
            g = (x / xn) @ eut  # (batch, n_eval)
            j = g.argmax(axis=1)
            best = g[np.arange(len(j)), j]
            keep = best >= threshold
            yield pd.DataFrame(
                {
                    train_id: pdf[train_id].to_numpy()[keep],
                    eval_id: ids_e[j[keep]],
                    "cosine": best[keep],
                }
            )

    return train.select(train_id, vec_col).mapInPandas(probe, out_schema)
