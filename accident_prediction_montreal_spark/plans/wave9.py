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
_SQL_V = (
    "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings "
    "WHERE embedding IS NOT NULL"  # degenerate-vector contract (r14)
)
# Cosine-based queries additionally drop zero-norm vectors (cos is 0/0):
_SQL_V_COS = (
    "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings "
    "WHERE embedding IS NOT NULL AND "
    "list_dot_product(CAST(embedding AS DOUBLE[]), "
    "CAST(embedding AS DOUBLE[])) > 0"
)
_SQL_D2 = (
    "list_dot_product(v.vec, v.vec)"
    " - 2.0 * list_dot_product(v.vec, c.cvec)"
    " + list_dot_product(c.cvec, c.cvec)"
)


def _lloyd_oracle(rounds: int) -> str:
    """Generate the literal n-round Lloyd oracle: each round is a
    distance CTE + argmin CTE; every round but the last feeds a
    DECIMAL-exact centroid-update CTE. Mirrors lloyd_kmeans term for
    term (including the rank-based ORDER BY/LIMIT seeding)."""
    parts = [
        f"WITH v AS ({_SQL_V}),",
        f"c0 AS (SELECT vec_id AS cell, vec AS cvec FROM v"
        f" ORDER BY vec_id LIMIT {_K}),",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""d{r} AS (
      SELECT v.vec_id, v.vec, c.cell, {_SQL_D2} AS d2
      FROM v CROSS JOIN c{r - 1} c
    ),
    a{r} AS (
      SELECT vec_id, vec, cell, d2 FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
        FROM d{r}) WHERE rn = 1
    ),"""
        )
        if r < rounds:
            parts.append(
                f"""ex{r} AS (
      SELECT cell, i AS dim, vec[i] AS val
      FROM a{r}, range(1, 65) t(i)
    ),
    mu{r} AS (
      SELECT cell, dim,
        ROUND(CAST(SUM(CAST(ROUND(val, 9) AS DECIMAL(24,9))) AS DOUBLE)
              / COUNT(*), 9) AS cval
      FROM ex{r} GROUP BY cell, dim
    ),
    c{r} AS (SELECT cell, list(cval ORDER BY dim) AS cvec
             FROM mu{r} GROUP BY cell),"""
            )
    body = "\n    ".join(parts).rstrip(",")
    return f"""
    {body}
    SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_members,
      ROUND(CAST(SUM(CAST(ROUND(d2, 9) AS DECIMAL(28,9))) AS DOUBLE)
            / COUNT(*), 6) + 0.0 AS inertia
    FROM a{rounds} GROUP BY cell ORDER BY cell
    """


_LLOYD_ROUNDS = 3


@register(
    "sim_kmeans_lloyd",
    oracle=_lloyd_oracle(_LLOYD_ROUNDS),
    description=f"Distributed Lloyd k-means, {_LLOYD_ROUNDS} rounds, FULL "
    "literal value oracle (the engine-checkable complement to MLlib's "
    "black-box KMeans inside the IVF quantizer): deterministic rank-based "
    f"seeds (the {_K} smallest-id vectors via TakeOrderedAndProject), "
    "bit-stable sequential-fold distances, DECIMAL-exact order-"
    "independent centroid means, (d2 ASC, cell ASC) argmin tie-break — "
    "every step reproduced term-for-term by the generated n-round "
    "oracle, so per-cell membership counts AND inertia match to 6 "
    "decimals across TWO refinement rounds (centroid-update convergence "
    "is pinned, not just one step). Scale shape (operators/kmeans.py): "
    "assignment is a zero-shuffle map pass (centroids packed into one "
    "broadcast array-of-structs row, argmin = array_min over transform "
    "— no explode, no window); the update is the only shuffle per round "
    "and its reduce-side output is K*dim rows regardless of corpus "
    "size.",
)
def sim_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accident_prediction_montreal_spark.operators.kmeans import lloyd_kmeans

    # NULL embeddings drop (unencodable; _SQL_V mirrors); zero vectors
    # stay — squared-euclidean k-means is defined for them (r14 contract)
    emb = (
        load_table(spark, "embeddings", sf_dir)
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    )
    assigned = lloyd_kmeans(emb, k=_K, n_iter=_LLOYD_ROUNDS)
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

# SemDeDup cell count GROWS with the corpus: K = clamp(N/1024, 8, 4096),
# so expected cell size stays ~1024 rows and the within-cell quadratic
# pair stage stays linear in N overall instead of quadratic under a
# fixed K. Computed IN-PLAN (1-row agg, broadcast onto the seed filter —
# no driver collect); the oracle mirrors it as a scalar subquery.
_SQL_ADAPTIVE_K = "(SELECT GREATEST(8, LEAST(4096, COUNT(*) // 1024)) FROM {src})"


def _adaptive_k_col(n: F.Column) -> F.Column:
    return F.greatest(
        F.lit(8).cast("long"),
        F.least(F.lit(4096).cast("long"), F.floor(n / F.lit(1024)).cast("long")),
    )


def _adaptive_seeds(emb: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """The K smallest-id vectors as (cell, cvec), K adaptive in count(emb).

    The fixture id space is dense 0-based (TESTDATA.md contract), so
    ``id < K`` is exactly rank-K seeding here and stays SQL-mirrorable;
    the general rank-based form lives in operators/kmeans.py.
    """
    kdf = emb.agg(_adaptive_k_col(F.count(F.lit(1))).alias("__k"))
    return (
        emb.crossJoin(F.broadcast(kdf))
        .filter(F.col(id_col) < F.col("__k"))
        .select(F.col(id_col).alias("cell"), F.col("vec").alias("cvec"))
    )


@register(
    "dedup_semantic",
    oracle=f"""
    WITH base AS ({_SQL_V_COS}),
    corpus AS (
      SELECT vec_id, vec FROM base
      UNION ALL
      SELECT vec_id + 100000 AS vec_id, vec FROM base WHERE vec_id < {_SEM_PLANT}
    ),
    c0 AS (SELECT vec_id AS cell, vec AS cvec FROM base
           WHERE vec_id < {_SQL_ADAPTIVE_K.format(src="base")}),
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
    "within a cell, and K is ADAPTIVE — clamp(N/1024, 8, 4096), computed "
    "in-plan from a broadcast 1-row count (no driver collect) — so "
    "expected cell size stays ~1024 rows and total pair work stays "
    "linear in N; the all-pairs join never forms. The pair stage is a "
    "per-cell VECTORIZED matmul (cell_cosine_pairs: Arrow ships each "
    "cell once, numpy computes the Gram matrix — the paper's own "
    "per-cluster shape; ~10x over the interpreted per-pair fold at "
    "sf1). Value oracle replays assignment (fold-exact argmin) and the "
    "adaptive K (scalar subquery); pair cosines differ from the "
    "oracle's folds only in ~1e-15 summation order, immaterial against "
    "the 0.999 threshold margin and verified end-to-end by the hash "
    "gate.",
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accident_prediction_montreal_spark.operators.kmeans import assign_cells
    from accident_prediction_montreal_spark.operators.similarity import (
        cell_cosine_pairs,
    )

    from accident_prediction_montreal_spark.functions.vectors import valid_vectors

    # cosine-based near-dup: degenerate vectors drop (r14 contract;
    # oracle mirrors via _SQL_V_COS) — a zero-norm "copy" pair would
    # otherwise be 0/0: NaN in Spark, NULL in DuckDB, and DuckDB orders
    # NaN ABOVE all values so the >= threshold predicate diverges.
    base = valid_vectors(load_table(spark, "embeddings", sf_dir)).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    planted = base.filter(F.col("vec_id") < _SEM_PLANT).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "vec"
    )
    corpus = base.unionByName(planted)
    seeds = _adaptive_seeds(base)
    # Assignment stays the fold-exact broadcast argmin (bit-identical to
    # the oracle's replay); the within-cell pair stage is the vectorized
    # per-cell matmul (operators/similarity.py::cell_cosine_pairs — see
    # its docstring for the fp-order note vs the oracle's fold).
    assigned = assign_cells(corpus, seeds).select("cell", "vec_id", "vec")
    pairs = cell_cosine_pairs(assigned, _SEM_THRESH)
    return (
        pairs.groupBy(F.col("id_b").alias("dup_id"), F.col("cell"))
        .agg(F.min("id_a").alias("keep_id"))
        .select("dup_id", "keep_id", "cell")
        .orderBy("dup_id")
    )


@register(
    "llm_epoch_schedule",
    oracle="""
    WITH d AS (
      SELECT source AS domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS units
      FROM documents GROUP BY source
    ),
    t AS (SELECT CAST(SUM(units) AS DOUBLE) AS total FROM d),
    w AS (
      SELECT domain, n_docs, units,
        CAST(ROUND(sqrt(CAST(units AS DOUBLE) / total), 12)
             AS DECIMAL(20,12)) AS pw
      FROM d, t
    ),
    n AS (
      SELECT domain, n_docs, units,
        CAST(pw AS DOUBLE) / CAST(SUM(pw) OVER () AS DOUBLE) AS p_tau
      FROM w
    ),
    s AS (
      SELECT domain, n_docs, units, p_tau,
        (1.5 * (SELECT total FROM t)) * p_tau AS target,
        LEAST(2.0, ((1.5 * (SELECT total FROM t)) * p_tau)
                   / CAST(units AS DOUBLE)) AS epochs
      FROM n
    )
    SELECT domain, n_docs, units,
      ROUND(p_tau, 6) + 0.0 AS p_tau,
      ROUND(epochs, 6) + 0.0 AS epochs,
      ROUND(epochs * CAST(units AS DOUBLE), 2) + 0.0 AS realized_units,
      ROUND(target - epochs * CAST(units AS DOUBLE), 2) + 0.0 AS deficit_units
    FROM s ORDER BY domain
    """,
    description="Per-domain epoch/repeat schedule for a 1.5x-corpus training "
    "budget (the UP-sampling complement to llm_temperature_mix, whose "
    "Bernoulli rates cap at 1 epoch): temperature-weighted target "
    "shares p_tau ~ share^0.5 over char units, epochs = min(2.0, "
    "budget*p_tau/units) — small domains hit the repetition cap and "
    "surface a deficit, large domains train under one epoch. The whole "
    "table is one map-side-combined groupBy producing |domains| rows; "
    "shares reuse the mixing module's DECIMAL-exact normalizer "
    "(operators/mixing.py::epoch_schedule), so every column is engine-"
    "reproducible to the rounded decimal.",
)
def llm_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accident_prediction_montreal_spark.operators.mixing import epoch_schedule

    docs = load_table(spark, "documents", sf_dir)
    out = epoch_schedule(
        docs, budget_frac=1.5, temperature=0.5, max_epochs=2.0
    )
    return out.select(
        "domain",
        "n_docs",
        "units",
        (F.round("p_tau", 6) + 0.0).alias("p_tau"),
        (F.round("epochs", 6) + 0.0).alias("epochs"),
        (F.round("realized_units", 2) + 0.0).alias("realized_units"),
        (F.round("deficit_units", 2) + 0.0).alias("deficit_units"),
    ).orderBy("domain")


_SQL_QC_TOKENS = (
    "CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[]) "
    "ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END"
)


@register(
    "text_quality_classifier",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_QC_TOKENS} AS w FROM documents),
    per AS (
      SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
        -- NULL text -> NULL score (mirrors Spark's aggregate-over-NULL-
        -- array; DuckDB's list_prepend(0, NULL) would otherwise yield
        -- [0] and score 0 -- r14 registry-wide fuzz triage)
        CASE WHEN w IS NULL THEN NULL ELSE
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(w, t ->
            ((list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(1, length(t) + 1),
                               i -> CAST(ascii(t[i]) AS BIGINT))),
              (h, c) -> (h * 31 + c) % 1000003) % 64)
             * 2654435761) % 2001 - 1000)),
          (a, b) -> a + b) AS BIGINT) END AS score_milli
      FROM toks
    )
    SELECT doc_id, n_tokens, score_milli,
      ROUND(1.0 / (1.0 + exp(-(CAST(score_milli AS DOUBLE)
            / (1000.0 * GREATEST(n_tokens, 1))))), 6) + 0.0 AS prob,
      CAST(score_milli >= 0 AS BIGINT) AS keep
    FROM per
    """,
    description="Hashing-trick linear quality classifier (the fastText-style "
    "model-based filter stage of a pretraining pipeline, §2.14): each "
    "token 31-poly-hashes (rolling_hash convention) into 64 feature "
    "buckets whose integer milli-weights come from a Knuth "
    "multiplicative mix — the 'model' is a pure function, so there is "
    "no weight table to broadcast and the document score is an EXACT "
    "integer fold (bit-equal in any engine); sigmoid(prob) is the only "
    "float, rounded to 6. One map pass, zero shuffles, no UDF, no "
    "explode (operators/text.py::quality_classifier); a trained model "
    "swaps the weight function for a broadcast lookup with the same "
    "plan shape.",
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accident_prediction_montreal_spark.operators.text import (
        quality_classifier,
    )

    docs = load_table(spark, "documents", sf_dir)
    return quality_classifier(docs)


@register(
    "llm_curation_pipeline",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text, source, n_chars FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text, source, n_chars
      FROM documents WHERE doc_id < {_SEM_PLANT}
    ),
    toks AS (
      SELECT doc_id, source, n_chars,
        CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
             ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS w
      FROM corpus
    ),
    qc AS (
      SELECT doc_id, source, n_chars,
        -- NULL text -> NULL score, same convention as the standalone
        -- classifier oracle above (r14 fuzz triage); kept then drops
        -- the doc (NULL >= 0 is not true), matching Spark
        CASE WHEN w IS NULL THEN NULL ELSE
        CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(w, t ->
            ((list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(range(1, length(t) + 1),
                               i -> CAST(ascii(t[i]) AS BIGINT))),
              (h, c) -> (h * 31 + c) % 1000003) % 64)
             * 2654435761) % 2001 - 1000)),
          (a, b) -> a + b) AS BIGINT) END AS score_milli
      FROM toks
    ),
    kept AS (SELECT doc_id, source, n_chars FROM qc WHERE score_milli >= 0),
    v AS ({_SQL_V}),
    kv AS (
      SELECT k.doc_id, e.vec FROM kept k
      JOIN v e ON e.vec_id = k.doc_id % 100000
    ),
    c0 AS (SELECT vec_id AS cell, vec AS cvec FROM v
           WHERE vec_id < {_SQL_ADAPTIVE_K.format(src="v")}),
    d1 AS (
      SELECT kv.doc_id, kv.vec, c.cell,
        list_dot_product(kv.vec, kv.vec)
        - 2.0 * list_dot_product(kv.vec, c.cvec)
        + list_dot_product(c.cvec, c.cvec) AS d2
      FROM kv CROSS JOIN c0 c
    ),
    a1 AS (
      SELECT doc_id, vec, cell FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY d2 ASC, cell ASC) AS rn
        FROM d1) WHERE rn = 1
    ),
    dups AS (
      SELECT DISTINCT b.doc_id AS dup_id
      FROM a1 a JOIN a1 b ON a.cell = b.cell AND a.doc_id < b.doc_id
      WHERE list_dot_product(a.vec, b.vec)
          / (sqrt(list_dot_product(a.vec, a.vec))
             * sqrt(list_dot_product(b.vec, b.vec))) >= {_SEM_THRESH}
    ),
    surv AS (
      SELECT k.* FROM kept k LEFT JOIN dups d ON k.doc_id = d.dup_id
      WHERE d.dup_id IS NULL
    ),
    d AS (
      SELECT source AS domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS units
      FROM surv GROUP BY source
    ),
    t AS (SELECT CAST(SUM(units) AS DOUBLE) AS total FROM d),
    w AS (
      SELECT domain, n_docs, units,
        CAST(ROUND(sqrt(CAST(units AS DOUBLE) / total), 12)
             AS DECIMAL(20,12)) AS pw
      FROM d, t
    ),
    n AS (
      SELECT domain, n_docs, units,
        CAST(pw AS DOUBLE) / CAST(SUM(pw) OVER () AS DOUBLE) AS p_tau
      FROM w
    ),
    s AS (
      SELECT domain, n_docs, units, p_tau,
        (1.5 * (SELECT total FROM t)) * p_tau AS target,
        LEAST(2.0, ((1.5 * (SELECT total FROM t)) * p_tau)
                   / CAST(units AS DOUBLE)) AS epochs
      FROM n
    ),
    raw AS (
      SELECT source AS domain, CAST(COUNT(*) AS BIGINT) AS n_raw
      FROM corpus GROUP BY source
    ),
    kc AS (
      SELECT source AS domain, CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM kept GROUP BY source
    )
    SELECT s.domain, raw.n_raw, kc.n_kept, s.n_docs, s.units,
      ROUND(s.p_tau, 6) + 0.0 AS p_tau,
      ROUND(s.epochs, 6) + 0.0 AS epochs,
      ROUND(s.epochs * CAST(s.units AS DOUBLE), 2) + 0.0 AS realized_units,
      ROUND(s.target - s.epochs * CAST(s.units AS DOUBLE), 2) + 0.0
        AS deficit_units
    FROM s JOIN raw USING (domain) JOIN kc USING (domain)
    ORDER BY s.domain
    """,
    description="Model-based curation capstone — the THIRD pipeline composite "
    "next to llm_pretrain_pipeline (heuristic filters + MinHash) and "
    "apm_dataset_pipeline: hashed-linear QUALITY CLASSIFIER gate -> "
    "SemDeDup SEMANTIC dedup over k-means cells (docs without an "
    "embedding pass through — you cannot semantically dedup what you "
    "cannot embed) -> per-domain EPOCH/REPEAT schedule for a 1.5x "
    "budget, in ONE lazy plan with a full CTE oracle. Planted +100000 "
    "document copies travel the whole pipeline: identical text scores "
    "identically through the classifier, identical embeddings land in "
    "the original's cell and die in the dedup stage, so the stage "
    "counts (n_raw > n_kept >= n_docs) are structurally guaranteed. "
    "Per stage the scale shape is the proven one: zero-shuffle "
    "classifier map, broadcast argmin assignment with ADAPTIVE K = "
    "clamp(N/1024, 8, 4096) (in-plan 1-row count, no driver collect), "
    "cell-bounded pairwise, |domains|-row schedule.",
)
def llm_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accident_prediction_montreal_spark.operators.kmeans import assign_cells
    from accident_prediction_montreal_spark.operators.mixing import epoch_schedule
    from accident_prediction_montreal_spark.operators.similarity import (
        cell_cosine_pairs,
    )
    from accident_prediction_montreal_spark.operators.text import (
        quality_classifier,
    )

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text", "source", "n_chars"
    )
    planted = docs.filter(F.col("doc_id") < _SEM_PLANT).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "source", "n_chars"
    )
    corpus = docs.unionByName(planted)

    qc = quality_classifier(corpus)
    kept = corpus.join(
        qc.filter(F.col("keep") == 1).select("doc_id"), "doc_id", "left_semi"
    )

    # NULL embeddings drop (degenerate-vector contract, r14; the
    # oracle's v CTE = _SQL_V carries the same WHERE). Zero vectors may
    # stay: assignment is L2 and the pair stage's 0-cosine (numpy
    # zero-norm guard) / NULL-cosine (DuckDB 0/0) both fail the >=
    # threshold filter identically.
    emb = (
        load_table(spark, "embeddings", sf_dir)
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    )
    kv = kept.select("doc_id").join(
        emb, emb["vec_id"] == F.col("doc_id") % 100000
    ).select("doc_id", "vec")
    seeds = _adaptive_seeds(emb)
    # Fold-exact assignment; vectorized per-cell matmul pair stage
    # (operators/similarity.py::cell_cosine_pairs).
    assigned = assign_cells(kv, seeds, id_col="doc_id").select(
        "cell", "doc_id", "vec"
    )
    dups = (
        cell_cosine_pairs(assigned, _SEM_THRESH, id_col="doc_id")
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    surv = kept.join(dups, "doc_id", "left_anti")

    sched = epoch_schedule(surv)
    raw_c = corpus.groupBy(F.col("source").alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_raw")
    )
    kept_c = kept.groupBy(F.col("source").alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    )
    return (
        sched.join(raw_c, "domain")
        .join(kept_c, "domain")
        .select(
            "domain",
            "n_raw",
            "n_kept",
            "n_docs",
            "units",
            (F.round("p_tau", 6) + 0.0).alias("p_tau"),
            (F.round("epochs", 6) + 0.0).alias("epochs"),
            (F.round("realized_units", 2) + 0.0).alias("realized_units"),
            (F.round("deficit_units", 2) + 0.0).alias("deficit_units"),
        )
        .orderBy("domain")
    )


@register(
    "text_lm_perplexity",
    oracle="""
    WITH toks AS (SELECT doc_id, {tokens} AS w FROM documents),
    ex AS (SELECT doc_id, unnest(w) AS tok FROM toks),
    cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM ex GROUP BY tok),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v
      FROM cnt
    ),
    nll AS (
      SELECT tok,
        CAST(ROUND(-ln((CAST(c AS DOUBLE) + 1.0)
             / (CAST(n AS DOUBLE) + CAST(v AS DOUBLE))), 9)
             AS DECIMAL(20,9)) AS q
      FROM cnt, tot
    ),
    per AS (
      SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, SUM(q) AS s
      FROM ex e JOIN nll USING (tok) GROUP BY e.doc_id
    )
    SELECT doc_id, n_tokens,
      ROUND(CAST(s AS DOUBLE) / n_tokens, 6) + 0.0 AS avg_nll,
      ROUND(exp(CAST(s AS DOUBLE) / n_tokens), 4) + 0.0 AS ppl
    FROM per
    """.replace("{tokens}", _SQL_QC_TOKENS),
    description="CCNet-style unigram-LM perplexity filter (Wenzek et al. 2020 "
    "pattern) — the third quality-filter modality next to the heuristic "
    "signals and the hashed classifier: an add-1-smoothed unigram model "
    "fit on the corpus scores each document's average per-token NLL and "
    "perplexity. Per-token NLLs are 9-decimal-rounded and summed as "
    "DECIMAL(20,9), so per-document totals are exact and order-"
    "independent in any engine. Scale: counts are one map-side-combined "
    "groupBy, the (N,V) normalizer a 1-row broadcast, scoring a hash "
    "join on token (stopword skew -> AQE skew split) + one reduce "
    "(operators/text.py::lm_perplexity).",
)
def text_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accident_prediction_montreal_spark.operators.text import lm_perplexity

    docs = load_table(spark, "documents", sf_dir)
    return lm_perplexity(docs)


@register(
    "j9_asof_nearest",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'click'
      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
    ),
    errors AS (
      SELECT event_id, ts, user_id FROM events WHERE event_type = 'error'
    ),
    bwd AS (
      SELECT e.event_id, c.event_id AS cid, c.value AS cval, c.ts AS cts
      FROM errors e
      ASOF LEFT JOIN clicks c ON e.user_id = c.user_id AND e.ts >= c.ts
    ),
    fwd AS (
      SELECT e.event_id, c.event_id AS cid, c.value AS cval, c.ts AS cts
      FROM errors e
      ASOF LEFT JOIN clicks c ON e.user_id = c.user_id AND e.ts <= c.ts
    )
    SELECT e.user_id, e.event_id,
      CASE WHEN b.cts IS NOT NULL AND (f.cts IS NULL
             OR (epoch_us(e.ts) - epoch_us(b.cts))
                <= (epoch_us(f.cts) - epoch_us(e.ts)))
           THEN b.cid ELSE f.cid END AS nearest_click_event_id,
      ROUND(CASE WHEN b.cts IS NOT NULL AND (f.cts IS NULL
             OR (epoch_us(e.ts) - epoch_us(b.cts))
                <= (epoch_us(f.cts) - epoch_us(e.ts)))
           THEN b.cval ELSE f.cval END, 6) AS nearest_click_value,
      CASE WHEN b.cts IS NOT NULL AND (f.cts IS NULL
             OR (epoch_us(e.ts) - epoch_us(b.cts))
                <= (epoch_us(f.cts) - epoch_us(e.ts)))
           THEN epoch_us(e.ts) - epoch_us(b.cts)
           ELSE epoch_us(f.cts) - epoch_us(e.ts) END AS gap_us
    FROM errors e
    LEFT JOIN bwd b USING (event_id)
    LEFT JOIN fwd f USING (event_id)
    """,
    description="NEAREST as-of join (pandas merge_asof direction='nearest' "
    "semantics, completing J9's backward/forward/tolerance family): for "
    "each error, the click minimizing |gap| per user, ties to the "
    "backward side. One shuffle: both carries (last-non-null backward, "
    "first-non-null forward) run over the SAME (ts, side, tie) sort and "
    "the per-row chooser compares microsecond gaps "
    "(operators/asof.py, direction='nearest'). Oracle composes DuckDB's "
    "two native ASOF directions with the identical tie rule.",
)
def j9_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from accident_prediction_montreal_spark.operators.asof import asof_join
    from accident_prediction_montreal_spark.sources.registry import epoch_us

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts", "event_id", "value")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "ts", "user_id"
    )
    out = asof_join(
        errors, clicks, by=["user_id"], value_cols=["event_id", "value"],
        direction="nearest",
    )
    dt = dict(out.dtypes)
    gap = F.abs(
        epoch_us(F.col("ts"), dt["ts"]) - epoch_us(F.col("ts_right"), dt["ts_right"])
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("event_id_right").alias("nearest_click_event_id"),
        F.round("value_right", 6).alias("nearest_click_value"),
        gap.cast("long").alias("gap_us"),
    )
