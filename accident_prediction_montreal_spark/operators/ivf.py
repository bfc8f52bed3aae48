"""IVF (inverted-file) approximate nearest-neighbor search.

The coarse-quantization scale path for similarity search: k-means
centroids partition the corpus into cells; a query only scans its
``n_probe`` nearest cells. Complements the exact brute-force path
(operators/similarity.py) and MLlib's BRP-LSH:

  * build: one KMeans fit (sampled), one pass to assign cells — the
    corpus is then bucketed (and at rest can be WRITTEN partitioned by
    cell, turning probes into partition-pruned scans);
  * query: centroids are tiny → broadcast; candidate set is
    |corpus| · n_probe / n_cells on average, an equi-join on cell_id
    instead of a full scan.

Exactness: recall < 1 when a true neighbor lives in an unprobed cell —
raise ``n_probe`` to trade cost for recall (n_probe = n_cells ≡ exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.functions.vectors import cosine_similarity


def build_ivf_index(
    corpus: DataFrame,
    n_cells: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_fraction: float = 1.0,
    seed: int = 42,
    literal_cells_max: int = 64,
    max_iter: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """Fit centroids and assign every corpus vector to its cell.

    Returns (assigned_corpus with cell_id, centroids(cell_id, centroid)).
    KMeans fits on a seeded sample when the corpus is large.

    ``literal_cells_max`` bounds the zero-shuffle literal-expansion
    assignment: the inlined argmax expression grows O(n_cells · dim), so
    past the threshold assignment switches to a broadcast join against
    the centroid DataFrame + one per-id max aggregate (one shuffle of
    (id, vec) rows — the right trade at realistic IVF cell counts, where
    a thousand inlined centroid arrays would bloat analysis/codegen).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    # NULL embeddings are unencodable (array_to_vector NPEs on them) and
    # drop here — the engine-wide degenerate-vector contract
    # (functions/vectors.valid_vectors; r14 embeddings fuzz find).
    # when() guard: Catalyst can merge this filter into a downstream
    # UDF-bearing predicate where subexpression elimination evaluates
    # array_to_vector before the null check; conditional branches stay
    # conditional in codegen.
    vecs = corpus.filter(F.col(vec_col).isNotNull()).select(
        id_col,
        vec_col,
        F.when(
            F.col(vec_col).isNotNull(),
            array_to_vector(F.col(vec_col).cast("array<double>")),
        ).alias("__v"),
    )
    fit_on = (
        vecs
        if sample_fraction >= 1.0
        else vecs.sample(withReplacement=False, fraction=sample_fraction, seed=seed)
    )
    # MLlib KMeans crashes when k exceeds the point count (tiny or
    # heavily-filtered corpora). limit(k).count() bounds the probe at
    # O(k) rows read — never a full scan at 100 TB.
    n_avail = fit_on.limit(n_cells).count()
    if n_avail == 0 and sample_fraction < 1.0:
        fit_on = vecs  # degenerate sample on a tiny corpus: fit on all
        n_avail = fit_on.limit(n_cells).count()
    if n_avail == 0:
        spark = corpus.sparkSession
        empty_cents = spark.createDataFrame(
            [], "cell_id INT, centroid ARRAY<DOUBLE>"
        )
        return (
            vecs.select(id_col, vec_col, F.lit(0).cast("int").alias("cell_id")),
            empty_cents,
        )
    if n_avail == 1:
        # MLlib requires k > 1; a single-vector corpus needs no fit —
        # that vector IS the (only) centroid. Bounded 1-row collect.
        centroids = [
            fit_on.select(F.col(vec_col).cast("array<double>")).head()[0]
        ]
    else:
        n_cells = min(n_cells, n_avail)

        def _fit(k: int):
            return KMeans(
                k=k, seed=seed, maxIter=max_iter,
                featuresCol="__v", predictionCol="cell_id",
            ).fit(fit_on)

        try:
            model = _fit(n_cells)
            centroids = model.clusterCenters()
        except Exception:
            # Duplicate-heavy tiny corpus: MLlib's k-means|| init crashes
            # when k exceeds the DISTINCT point count. The distinct probe
            # runs ONLY on this exception path — never on the normal
            # (large, continuous-valued) corpus, where distinct would be
            # a full shuffle.
            n_distinct = (
                fit_on.select(F.col(vec_col).cast("array<double>"))
                .distinct()
                .limit(n_cells)
                .count()
            )
            if n_distinct <= 1:
                centroids = [
                    fit_on.select(F.col(vec_col).cast("array<double>")).head()[0]
                ]
            else:
                model = _fit(n_distinct)
                centroids = model.clusterCenters()
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell_id INT, centroid ARRAY<DOUBLE>",
    )
    # Assign cells by COSINE against the centroids — the SAME metric and
    # tie-break the query-time probe ranking uses — not KMeans's
    # euclidean transform. Centroids of unit-ish vectors have unequal
    # norms, so euclidean-nearest and cosine-nearest cells can diverge;
    # metric-matched assignment guarantees a corpus vector's own cell is
    # its queries' top-1 probe (self-hit at any n_probe >= 1) and aligns
    # the coarse quantizer with the search metric. The centroid list is
    # already LOCAL (model.clusterCenters()), so the per-row argmax is a
    # single zero-shuffle projection over literal centroid arrays —
    # array_max over (sim, -cell_id) structs reproduces the probe
    # ranking's (sim DESC, cell_id ASC) tie-break exactly.
    #
    # Zero-norm guard (both paths): a ‖v‖ = 0 vector has NaN cosine
    # against EVERY centroid; nanvl maps that to −2.0 — below the valid
    # [−1, 1] cosine range — so the (sim DESC, cell_id ASC) tie-break
    # assigns cell 0 by RULE, not by Spark's NaN-sorts-greatest accident.
    if n_cells <= literal_cells_max:
        best = F.array_max(
            F.array(
                *[
                    F.struct(
                        F.nanvl(
                            cosine_similarity(
                                vec_col,
                                F.array(*[F.lit(float(x)) for x in c]),
                            ),
                            F.lit(-2.0),
                        ).alias("s"),
                        F.lit(-i).alias("nc"),
                    )
                    for i, c in enumerate(centroids)
                ]
            )
        )
        assigned = vecs.select(
            id_col, vec_col, (-best["nc"]).cast("int").alias("cell_id")
        )
    else:
        # Broadcast-join path: expression size stays O(dim); the argmax
        # is max(struct(sim, -cell_id)) per id — identical tie-break.
        scored = (
            vecs.select(id_col, vec_col)
            .crossJoin(F.broadcast(cent_df))
            .withColumn(
                "__s", F.nanvl(cosine_similarity(vec_col, "centroid"), F.lit(-2.0))
            )
        )
        assigned = (
            scored.groupBy(id_col)
            .agg(
                F.first(vec_col).alias(vec_col),
                F.max(F.struct(F.col("__s").alias("s"), (-F.col("cell_id")).alias("nc"))).alias(
                    "__b"
                ),
            )
            .select(id_col, vec_col, (-F.col("__b.nc")).cast("int").alias("cell_id"))
        )
    return assigned, cent_df


def ivf_cosine_topk(
    queries: DataFrame,
    assigned_corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 3,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Top-k by cosine among the ``n_probe`` nearest cells per query.

    Sized for a SMALL query side (the ANN-serving shape: a handful of
    probes against a big indexed corpus): the probe ranking is a
    row_number window that shuffles |queries| x n_cells rows, and the
    per-candidate cosine is the expression form (interpreted
    zip_with/aggregate folds). Both are fine at serving volumes and
    wrong for a MASSIVE query side — there, use the decontamination
    pattern instead (operators/decontam.py::_semantic_contamination_
    bucketed): zero-shuffle probe selection via an Arrow mapInPandas
    against the driver-local centroid matrix, then a cogroup-per-cell
    numpy Gram matmul that never materializes candidate pairs through
    an exchange (35.7 -> 3.7 s measured at sf1 on a 20k-query side;
    PERF.md r10).
    """
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("cell_sim", cosine_similarity(query_vec, "centroid"))
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy(query_id).orderBy(
                    F.col("cell_sim").desc(), F.col("cell_id").asc()
                )
            ),
        )
        .filter(F.col("probe_rank") <= n_probe)
        .select(query_id, query_vec, "cell_id")
    )
    candidates = probes.join(assigned_corpus, "cell_id")
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id).asc())
    return (
        candidates.withColumn("cosine", cosine_similarity(query_vec, corpus_vec))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )


def ivf_cosine_topk_bucketed(
    queries: DataFrame,
    assigned_corpus: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_probe: int = 3,
    query_id: str = "query_id",
    query_vec: str = "query_vec",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """MASSIVE-query-side twin of :func:`ivf_cosine_topk` — the regime
    split documented there, now implemented: same output contract
    (query_id, corpus_id, cosine, rank<=k; ties cosine DESC, id ASC),
    but the physical plan is the decontamination pattern
    (operators/decontam.py::_semantic_contamination_bucketed, measured
    35.7 -> 3.7 s at sf1 on a 20k-query side):

      * probe selection is ZERO-SHUFFLE: centroids (<= n_cells rows)
        collect driver-side and broadcast as a numpy matrix into an
        Arrow mapInPandas — no |queries| x n_cells window exchange;
      * per probed cell, a cogroup-per-cell numpy Gram matmul emits
        each query's CELL-LOCAL top-k — candidate pairs never
        materialize through an exchange (the shuffle carries at most
        n_probe x k rows per query);
      * the global top-k re-ranks that bounded union with the same
        (cosine DESC, id ASC) window.

    Exact when n_probe = n_cells (property: equals ivf_cosine_topk and
    the brute-force scan — tested). Zero-norm vectors are undefined
    input, mirroring cosine_similarity's contract; for determinism they
    follow build_ivf_index's convention anyway (sentinel sim -2.0 to
    every cell, so the cell_id-ascending tie-break probes cell 0 first
    — the cell the builder assigns zero-norm corpus vectors to).
    """
    import numpy as np
    from pyspark.sql import types as T

    from accident_prediction_montreal_spark import cachereg

    cents = centroids.select("cell_id", "centroid").collect()  # <= n_cells
    ids_c = np.array([r["cell_id"] for r in cents], dtype=np.int64)
    cmat = np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in cents])
    cn = np.sqrt((cmat * cmat).sum(axis=1, keepdims=True))
    cn[cn == 0.0] = 1.0
    cunit_t = (cmat / cn).T
    bc = queries.sparkSession.sparkContext.broadcast((ids_c, cunit_t))
    # The returned plan is lazy, so the broadcast can't be destroyed
    # here; generation-scoped lifecycle via cachereg (Broadcast has the
    # same unpersist() surface as DataFrame) — the next invocation or a
    # release_all() frees the previous generation's executor copies.
    cachereg.register("operators.ivf_cosine_topk_bucketed", bc)
    npb = min(n_probe, len(ids_c))

    qid_type = queries.schema[query_id].dataType
    cid_type = assigned_corpus.schema[corpus_id].dataType
    cell_type = centroids.schema["cell_id"].dataType
    probe_schema = T.StructType(
        [
            T.StructField(query_id, qid_type),
            T.StructField(query_vec, T.ArrayType(T.DoubleType())),
            T.StructField("cell_id", cell_type),
        ]
    )

    def assign_probes(batches):
        import pandas as pd

        ids_cc, cut = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[query_vec].to_numpy()).astype(np.float64)
            xn = np.sqrt((x * x).sum(axis=1, keepdims=True))
            zero = xn[:, 0] == 0.0
            xn[zero] = 1.0
            g = (x / xn) @ cut  # (batch, n_cells)
            # build_ivf_index's zero-norm rule, mirrored: sentinel -2.0
            # to every cell -> tie-break probes cell 0 (+ next ids) by
            # RULE, aligning both code paths on one convention.
            g[zero] = -2.0
            order = np.lexsort(
                (np.broadcast_to(ids_cc, g.shape), -g), axis=1
            )[:, :npb]
            n, kk = order.shape
            yield pd.DataFrame(
                {
                    query_id: pdf[query_id].to_numpy().repeat(kk),
                    query_vec: pdf[query_vec].to_numpy().repeat(kk),
                    "cell_id": ids_cc[order].ravel(),
                }
            )

    probes = queries.select(
        query_id, F.col(query_vec).cast("array<double>").alias(query_vec)
    ).mapInPandas(assign_probes, probe_schema)

    pair_schema = T.StructType(
        [
            T.StructField(query_id, qid_type),
            T.StructField(corpus_id, cid_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def cell_topk(left, right):
        import pandas as pd

        if not len(left) or not len(right):
            return pd.DataFrame(
                {query_id: [], corpus_id: [], "cosine": []}
            ).astype({"cosine": "float64"})
        x = np.stack(left[query_vec].to_numpy()).astype(np.float64)
        y = np.stack(right[corpus_vec].to_numpy()).astype(np.float64)
        order = np.argsort(right[corpus_id].to_numpy(), kind="stable")
        y = y[order]
        ids = right[corpus_id].to_numpy()[order]
        xn = np.sqrt((x * x).sum(axis=1, keepdims=True))
        xn[xn == 0.0] = 1.0
        yn = np.sqrt((y * y).sum(axis=1, keepdims=True))
        yn[yn == 0.0] = 1.0
        g = (x / xn) @ (y / yn).T  # (queries_in_cell, corpus_in_cell)
        kk = min(k, g.shape[1])
        ordk = np.lexsort(
            (np.broadcast_to(ids, g.shape), -g), axis=1
        )[:, :kk]
        rows = np.arange(len(g))[:, None]
        return pd.DataFrame(
            {
                query_id: left[query_id].to_numpy().repeat(kk),
                corpus_id: ids[ordk].ravel(),
                "cosine": g[rows, ordk].ravel(),
            }
        )

    corpus = assigned_corpus.select(
        "cell_id",
        corpus_id,
        F.col(corpus_vec).cast("array<double>").alias(corpus_vec),
    )
    cand = (
        probes.groupBy("cell_id")
        .cogroup(corpus.groupBy("cell_id"))
        .applyInPandas(cell_topk, pair_schema)
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id).asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cosine", "rank")
    )
