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
