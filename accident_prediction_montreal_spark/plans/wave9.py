"""Wave-9 queries (r7): the clustering/curation block of the
training-data-pipeline family (SURVEY §2.14) — oracle-checkable
distributed k-means, SemDeDup-style semantic dedup over k-means cells,
epoch/repeat scheduling for multi-domain mixing, and a hashing-trick
linear quality classifier. All value-oracle-backed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.plans.registry import register
from accident_prediction_montreal_spark.sources.registry import load_table

_K = 8  # k-means cells: seeds = vec_id < 8

# Shared oracle CTE: vectors as DOUBLE[], deterministic seeds, one
# assignment pass. Distance = ‖v‖² − 2·v·c + ‖c‖² from sequential-fold
# dot products — bit-identical to the Spark side's zip_with/aggregate
# folds (see operators/kmeans.py module docstring).
_SQL_V = "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings"
_SQL_D2 = (
    "list_dot_product(v.vec, v.vec)"
    " - 2.0 * list_dot_product(v.vec, c.cvec)"
    " + list_dot_product(c.cvec, c.cvec)"
)


@register(
    "sim_kmeans_lloyd",
    oracle=f"""
    WITH v AS ({_SQL_V}),
    c0 AS (SELECT vec_id AS cell, vec AS cvec FROM v WHERE vec_id < {_K}),
    d1 AS (
      SELECT v.vec_id, v.vec, c.cell, {_SQL_D2} AS d2
      FROM v CROSS JOIN c0 c
    ),
    a1 AS (
      SELECT vec_id, vec, cell FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
        FROM d1) WHERE rn = 1
    ),
    ex AS (
      SELECT cell, i AS dim, vec[i] AS val
      FROM a1, range(1, 65) t(i)
    ),
    mu AS (
      SELECT cell, dim,
        ROUND(CAST(SUM(CAST(ROUND(val, 9) AS DECIMAL(24,9))) AS DOUBLE)
              / COUNT(*), 9) AS cval
      FROM ex GROUP BY cell, dim
    ),
    c1 AS (SELECT cell, list(cval ORDER BY dim) AS cvec FROM mu GROUP BY cell),
    d2s AS (
      SELECT v.vec_id, c.cell, {_SQL_D2} AS d2
      FROM v CROSS JOIN c1 c
    ),
    a2 AS (
      SELECT vec_id, cell, d2 FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
        FROM d2s) WHERE rn = 1
    )
    SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_members,
      ROUND(CAST(SUM(CAST(ROUND(d2, 9) AS DECIMAL(28,9))) AS DOUBLE)
            / COUNT(*), 6) + 0.0 AS inertia
    FROM a2 GROUP BY cell ORDER BY cell
    """,
    description="Distributed Lloyd k-means, 2 rounds, FULL literal value "
    "oracle (the engine-checkable complement to MLlib's black-box KMeans "
    "inside the IVF quantizer): deterministic seeds (vec_id < 8), "
    "bit-stable sequential-fold distances, DECIMAL-exact order-"
    "independent centroid means, (d2 ASC, cell ASC) argmin tie-break — "
    "every step reproduced term-for-term by the oracle, so per-cell "
    "membership counts AND inertia match to 6 decimals. Scale shape "
    "(operators/kmeans.py): assignment is a zero-shuffle map pass "
    "(centroids packed into one broadcast array-of-structs row, argmin "
    "= array_min over transform — no explode, no window); the update is "
    "the only shuffle per round and its reduce-side output is K*dim "
    "rows regardless of corpus size.",
)
def sim_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accident_prediction_montreal_spark.operators.kmeans import lloyd_kmeans

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    assigned = lloyd_kmeans(emb, k=_K, n_iter=2)
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            (
                F.round(
                    F.sum(F.round("d2", 9).cast("decimal(28,9)")).cast("double")
                    / F.count(F.lit(1)),
                    6,
                )
                + 0.0
            ).alias("inertia"),
        )
        .orderBy("cell")
    )


_SEM_THRESH = 0.999  # within-cell cosine at/above which the larger id is a dup
_SEM_PLANT = 20  # vec_id < 20 get an identical planted copy at id+100000


@register(
    "dedup_semantic",
    oracle=f"""
    WITH base AS ({_SQL_V}),
    corpus AS (
      SELECT vec_id, vec FROM base
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, vec FROM base WHERE vec_id < {_SEM_PLANT}
    ),
    c0 AS (SELECT vec_id AS cell, vec AS cvec FROM base WHERE vec_id < {_K}),
    d1 AS (
      SELECT v.vec_id, v.vec, c.cell, {_SQL_D2} AS d2
      FROM corpus v CROSS JOIN c0 c
    ),
    a1 AS (
      SELECT vec_id, vec, cell FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
        FROM d1) WHERE rn = 1
    ),
    pairs AS (
      SELECT a.cell, a.vec_id AS keep_cand, b.vec_id AS dup_id,
        list_dot_product(a.vec, b.vec)
          / (sqrt(list_dot_product(a.vec, a.vec))
             * sqrt(list_dot_product(b.vec, b.vec))) AS cos
      FROM a1 a JOIN a1 b ON a.cell = b.cell AND a.vec_id < b.vec_id
    )
    SELECT dup_id, MIN(keep_cand) AS keep_id, cell
    FROM pairs WHERE cos >= {_SEM_THRESH}
    GROUP BY dup_id, cell ORDER BY dup_id
    """,
    description="SemDeDup-style semantic dedup (Abbas et al. 2023 pattern, "
    "§2.14): embeddings are bucketed into k-means cells (one "
    "deterministic assignment pass, operators/kmeans.py — zero-shuffle "
    "broadcast argmin), then pairwise cosine runs ONLY within a cell "
    "and any vector matching an earlier-id vector at cos >= 0.999 is "
    "removed, keeping the smallest qualifying id. A planted fixture "
    "(identical copies of vec_id < 20 re-ids'd at +100000) guarantees "
    "known dups that cross no cell boundary — copies always share "
    "their original's cell because their distances are bit-equal. The "
    "cell bound is the scale story: pairwise work is quadratic only "
    "within a cell, and cells shrink as K grows with the corpus — the "
    "all-pairs join never forms. Value oracle replays assignment and "
    "pairing term-for-term (bit-identical fold dot products both "
    "engines).",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accident_prediction_montreal_spark.functions.vectors import (
        cosine_similarity,
    )
    from accident_prediction_montreal_spark.operators.kmeans import assign_cells

    base = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    planted = base.filter(F.col("vec_id") < _SEM_PLANT).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "vec"
    )
    corpus = base.unionByName(planted)
    seeds = base.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").alias("cell"), F.col("vec").alias("cvec")
    )
    assigned = assign_cells(corpus, seeds).select("vec_id", "vec", "cell")
    a = assigned.select(
        F.col("cell"), F.col("vec_id").alias("keep_cand"), F.col("vec").alias("va")
    )
    b = assigned.select(
        F.col("cell"), F.col("vec_id").alias("dup_id"), F.col("vec").alias("vb")
    )
    pairs = a.join(b, "cell").filter(F.col("keep_cand") < F.col("dup_id"))
    hits = pairs.filter(cosine_similarity("va", "vb") >= F.lit(_SEM_THRESH))
    return (
        hits.groupBy("dup_id", "cell")
        .agg(F.min("keep_cand").alias("keep_id"))
        .select("dup_id", "keep_id", "cell")
        .orderBy("dup_id")
    )
