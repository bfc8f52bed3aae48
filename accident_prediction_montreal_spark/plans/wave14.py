"""Wave-14 queries (r14): product-quantization ANN (train→encode→ADC).

The similarity family's missing scale tier: brute cosine (exact),
BRP-LSH / IVF (pruned scan), and now PQ — the *compressed* scan
(Jégou et al., TPAMI 2011), where the corpus at rest is m small codes
per vector instead of dim floats and query-time distance is m lookup
additions. operators/pq.py composes the deterministic-Lloyd machinery
(operators/kmeans.py) per subspace, so unlike MLlib-backed ANN paths
the ENTIRE pipeline has a literal ANSI value oracle: the generated SQL
below replays seeding, one DECIMAL-exact centroid update, re-assignment,
encoding, the per-query LUTs and the fixed-order ADC sums term for term.

Reference semantics contract: the reference engine has no ANN/PQ
operators; this extends SURVEY §2.14's training-data-pipeline family
(similarity-search scale path) beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.plans.registry import register
from accident_prediction_montreal_spark.sources.registry import load_table

_PQ_M = 4  # subspaces
_PQ_K = 8  # codes per subspace (seeds = the 8 smallest-id subvectors)
_PQ_ITER = 2  # assignment passes (one DECIMAL-exact update between)
_PQ_SUBDIM = 16  # 64-dim fixture contract / 4 subspaces
_PQ_NQ = 5  # queries = vec_id < 5
_PQ_TOPK = 5

# Fold-exact squared L2 between two DOUBLE[] expressions, the exact
# term order of operators/kmeans._sq_dist: ‖a‖² − 2·a·b + ‖b‖².
_D2 = (
    "list_dot_product({a}, {a})"
    " - 2.0 * list_dot_product({a}, {b})"
    " + list_dot_product({b}, {b})"
)


def _pq_oracle() -> str:
    """Generate the literal PQ oracle: per subspace a Lloyd block
    (seed → assign → DECIMAL-exact update → re-assign → codes) plus a
    per-query LUT; the ADC sum joins the m code columns to the m LUTs
    and adds left-to-right — the same IEEE order as the Spark side's
    chained element_at additions."""
    parts = [
        "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec"
        " FROM embeddings WHERE embedding IS NOT NULL),"
    ]
    for mi in range(_PQ_M):
        o1, o2 = mi * _PQ_SUBDIM + 1, (mi + 1) * _PQ_SUBDIM
        d2_sc = _D2.format(a="s.sv", b="c.cvec")
        d2_qc = _D2.format(a="q.sv", b="c.cvec")
        parts.append(
            f"""s{mi} AS (SELECT vec_id, vec[{o1}:{o2}] AS sv FROM v),
    c{mi}_0 AS (SELECT vec_id AS cell, sv AS cvec FROM s{mi}
                ORDER BY vec_id LIMIT {_PQ_K}),
    d{mi}_1 AS (
      SELECT s.vec_id, s.sv, c.cell, {d2_sc} AS d2
      FROM s{mi} s CROSS JOIN c{mi}_0 c
    ),
    a{mi}_1 AS (
      SELECT vec_id, sv, cell FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
        FROM d{mi}_1) WHERE rn = 1
    ),
    ex{mi}_1 AS (
      SELECT cell, i AS dim, sv[i] AS val
      FROM a{mi}_1, range(1, {_PQ_SUBDIM + 1}) t(i)
    ),
    mu{mi}_1 AS (
      SELECT cell, dim,
        ROUND(CAST(SUM(CAST(ROUND(val, 9) AS DECIMAL(24,9))) AS DOUBLE)
              / COUNT(*), 9) AS cval
      FROM ex{mi}_1 GROUP BY cell, dim
    ),
    c{mi}_1 AS (SELECT cell, list(cval ORDER BY dim) AS cvec
                FROM mu{mi}_1 GROUP BY cell),
    d{mi}_2 AS (
      SELECT s.vec_id, c.cell, {d2_sc} AS d2
      FROM s{mi} s CROSS JOIN c{mi}_1 c
    ),
    codes{mi} AS (
      SELECT vec_id, cell FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
        FROM d{mi}_2) WHERE rn = 1
    ),
    lut{mi} AS (
      SELECT q.vec_id AS query_id, c.cell, {d2_qc} AS d
      FROM (SELECT vec_id, sv FROM s{mi} WHERE vec_id < {_PQ_NQ}) q
      CROSS JOIN c{mi}_1 c
    ),"""
        )
    joins = "\n      ".join(
        f"JOIN codes{mi} c{mi} ON c{mi}.vec_id = c0.vec_id" for mi in range(1, _PQ_M)
    )
    lut_joins = "\n      ".join(
        f"JOIN lut{mi} l{mi} ON l{mi}.query_id = l0.query_id"
        f" AND l{mi}.cell = codes.k{mi}"
        for mi in range(1, _PQ_M)
    )
    adc_sum = " + ".join(f"l{mi}.d" for mi in range(_PQ_M))
    kcols = ", ".join(f"c{mi}.cell AS k{mi}" for mi in range(_PQ_M))
    parts.append(
        f"""codes AS (
      SELECT c0.vec_id, {kcols.replace('c0.cell AS k0', 'c0.cell AS k0')}
      FROM codes0 c0
      {joins}
    ),
    adc AS (
      SELECT l0.query_id, codes.vec_id, {adc_sum} AS adc_d2
      FROM codes
      JOIN lut0 l0 ON l0.cell = codes.k0
      {lut_joins}
    )
    SELECT query_id, vec_id, ROUND(adc_d2, 6) + 0.0 AS adc_d2,
      CAST(rn AS BIGINT) AS "rank"
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_d2 ASC, vec_id ASC) AS rn
      FROM adc
    ) WHERE rn <= {_PQ_TOPK}"""
    )
    return "\n    ".join(parts)


@register(
    "sim_pq_adc_topk",
    oracle=_pq_oracle(),
    description="Product-quantization ANN with a FULL literal value oracle "
    "(train -> encode -> ADC scan -> top-k; Jégou et al. 2011): the 64-dim "
    "corpus splits into 4 subspaces of 16; each subspace fits an "
    "engine-reproducible Lloyd codebook (rank-based seeds, fold-exact "
    "distances, DECIMAL-exact means — operators/kmeans.py composed by "
    "operators/pq.py); vectors compress to 4 small codes (256 bytes -> "
    "4 codes at scale, the page-cache win for a 100 TB corpus); queries "
    "build per-subspace LUTs and the scan cost per corpus row is 4 map "
    "lookups + 3 additions, no vector math. Scale shape: training "
    "shuffles K*sub_dim rows per subspace (corpus-size independent), "
    "encoding is ONE zero-shuffle projection against broadcast packed "
    "codebooks, LUTs broadcast (Q rows), and the ADC scan's candidate "
    "rows carry no arrays. Composes with IVF cells for the standard "
    "IVF-PQ billion-scale layout. The oracle replays every stage "
    "term-for-term, so codes, LUT entries, fixed-order ADC sums, and "
    "the (adc ASC, vec_id ASC) top-k tie-break all hash-match.",
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accident_prediction_montreal_spark.operators.pq import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebooks,
    )

    emb = (
        load_table(spark, "embeddings", sf_dir)
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    )
    books = train_pq_codebooks(
        emb, m=_PQ_M, k=_PQ_K, n_iter=_PQ_ITER, sub_dim=_PQ_SUBDIM
    )
    codes = pq_encode(emb, books, sub_dim=_PQ_SUBDIM)
    queries = emb.filter(F.col("vec_id") < _PQ_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("query_vec")
    )
    out = pq_adc_topk(
        queries, codes, books, sub_dim=_PQ_SUBDIM, k=_PQ_TOPK
    )
    return out.select(
        "query_id",
        "vec_id",
        (F.round("adc_d2", 6) + 0.0).alias("adc_d2"),
        F.col("rank").cast("long").alias("rank"),
    )


# --- IVF-PQ: the composed billion-scale layout ---------------------------------

_IVFPQ_NPROBE = 2  # of the 8 coarse cells
_IVFPQ_COARSE_K = 8


def _sub_block(mi: int) -> str:
    """One PQ subspace Lloyd block (identical text to _pq_oracle's) —
    shared by the IVF-PQ oracle so both queries replay the same
    codebook training."""
    o1, o2 = mi * _PQ_SUBDIM + 1, (mi + 1) * _PQ_SUBDIM
    d2_sc = _D2.format(a="s.sv", b="c.cvec")
    d2_qc = _D2.format(a="q.sv", b="c.cvec")
    return f"""s{mi} AS (SELECT vec_id, vec[{o1}:{o2}] AS sv FROM v),
    c{mi}_0 AS (SELECT vec_id AS cell, sv AS cvec FROM s{mi}
                ORDER BY vec_id LIMIT {_PQ_K}),
    d{mi}_1 AS (
      SELECT s.vec_id, s.sv, c.cell, {d2_sc} AS d2
      FROM s{mi} s CROSS JOIN c{mi}_0 c
    ),
    a{mi}_1 AS (
      SELECT vec_id, sv, cell FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
        FROM d{mi}_1) WHERE rn = 1
    ),
    ex{mi}_1 AS (
      SELECT cell, i AS dim, sv[i] AS val
      FROM a{mi}_1, range(1, {_PQ_SUBDIM + 1}) t(i)
    ),
    mu{mi}_1 AS (
      SELECT cell, dim,
        ROUND(CAST(SUM(CAST(ROUND(val, 9) AS DECIMAL(24,9))) AS DOUBLE)
              / COUNT(*), 9) AS cval
      FROM ex{mi}_1 GROUP BY cell, dim
    ),
    c{mi}_1 AS (SELECT cell, list(cval ORDER BY dim) AS cvec
                FROM mu{mi}_1 GROUP BY cell),
    d{mi}_2 AS (
      SELECT s.vec_id, c.cell, {d2_sc} AS d2
      FROM s{mi} s CROSS JOIN c{mi}_1 c
    ),
    codes{mi} AS (
      SELECT vec_id, cell FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
        FROM d{mi}_2) WHERE rn = 1
    ),
    lut{mi} AS (
      SELECT q.vec_id AS query_id, c.cell, {d2_qc} AS d
      FROM (SELECT vec_id, sv FROM s{mi} WHERE vec_id < {_PQ_NQ}) q
      CROSS JOIN c{mi}_1 c
    ),"""


def _ivfpq_oracle() -> str:
    """IVF-PQ replayed literally: a FULL-DIM Lloyd block trains the
    coarse quantizer (same seeding/update/tie-break as the subspace
    blocks), probes = per-query top-n_probe cells by (d2, cell), and
    the ADC sum runs only over candidates whose coarse cell is probed —
    the same pruning the Spark side's broadcast hash join on cell does."""
    dim = _PQ_M * _PQ_SUBDIM
    d2_gc = _D2.format(a="s.vec", b="c.cvec")
    d2_qg = _D2.format(a="q.vec", b="c.cvec")
    parts = [
        "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec"
        " FROM embeddings WHERE embedding IS NOT NULL),",
        f"""g_0 AS (SELECT vec_id AS cell, vec AS cvec FROM v
                ORDER BY vec_id LIMIT {_IVFPQ_COARSE_K}),
    gd_1 AS (
      SELECT s.vec_id, s.vec, c.cell, {d2_gc} AS d2
      FROM v s CROSS JOIN g_0 c
    ),
    ga_1 AS (
      SELECT vec_id, vec, cell FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
        FROM gd_1) WHERE rn = 1
    ),
    gex_1 AS (
      SELECT cell, i AS dim, vec[i] AS val
      FROM ga_1, range(1, {dim + 1}) t(i)
    ),
    gmu_1 AS (
      SELECT cell, dim,
        ROUND(CAST(SUM(CAST(ROUND(val, 9) AS DECIMAL(24,9))) AS DOUBLE)
              / COUNT(*), 9) AS cval
      FROM gex_1 GROUP BY cell, dim
    ),
    g_1 AS (SELECT cell, list(cval ORDER BY dim) AS cvec
            FROM gmu_1 GROUP BY cell),
    gd_2 AS (
      SELECT s.vec_id, c.cell, {d2_gc} AS d2
      FROM v s CROSS JOIN g_1 c
    ),
    gassign AS (
      SELECT vec_id, cell FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rn
        FROM gd_2) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT q.vec_id AS query_id, c.cell,
          ROW_NUMBER() OVER (PARTITION BY q.vec_id
                             ORDER BY {d2_qg} ASC, c.cell ASC) AS rn
        FROM (SELECT vec_id, vec FROM v WHERE vec_id < {_PQ_NQ}) q
        CROSS JOIN g_1 c
      ) WHERE rn <= {_IVFPQ_NPROBE}
    ),""",
    ]
    for mi in range(_PQ_M):
        parts.append(_sub_block(mi))
    joins = "\n      ".join(
        f"JOIN codes{mi} c{mi} ON c{mi}.vec_id = c0.vec_id" for mi in range(1, _PQ_M)
    )
    lut_joins = "\n      ".join(
        f"JOIN lut{mi} l{mi} ON l{mi}.query_id = cand.query_id"
        f" AND l{mi}.cell = cand.k{mi}"
        for mi in range(1, _PQ_M)
    )
    adc_sum = " + ".join(f"l{mi}.d" for mi in range(_PQ_M))
    kcols = ", ".join(f"c{mi}.cell AS k{mi}" for mi in range(_PQ_M))
    parts.append(
        f"""codes AS (
      SELECT c0.vec_id, {kcols}
      FROM codes0 c0
      {joins}
    ),
    cand AS (
      SELECT p.query_id, codes.*
      FROM codes
      JOIN gassign ga ON ga.vec_id = codes.vec_id
      JOIN probes p ON p.cell = ga.cell
    ),
    adc AS (
      SELECT cand.query_id, cand.vec_id, {adc_sum} AS adc_d2
      FROM cand
      JOIN lut0 l0 ON l0.query_id = cand.query_id AND l0.cell = cand.k0
      {lut_joins}
    )
    SELECT query_id, vec_id, ROUND(adc_d2, 6) + 0.0 AS adc_d2,
      CAST(rn AS BIGINT) AS "rank"
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY adc_d2 ASC, vec_id ASC) AS rn
      FROM adc
    ) WHERE rn <= {_PQ_TOPK}"""
    )
    return "\n    ".join(parts)


@register(
    "sim_ivfpq_topk",
    oracle=_ivfpq_oracle(),
    description="IVF-PQ — the composed billion-scale ANN layout (faiss "
    "IndexIVFPQ shape, no-residual variant) with a FULL literal value "
    "oracle: a deterministic-Lloyd COARSE quantizer (8 cells over the "
    "full 64 dims — same rank-based seeds / DECIMAL-exact update / "
    "(d2, cell) tie-break as the PQ codebooks, so unlike the MLlib-"
    "backed IVF the whole composition is engine-replayable) prunes "
    "each query to its n_probe=2 nearest cells; the PQ ADC scan "
    "(sim_pq_adc_topk's codebooks, shared oracle text) runs ONLY over "
    "candidates in probed cells. Scan cost per query: |corpus| * "
    "n_probe / n_cells code rows * 4 map lookups — vectors and "
    "unprobed cells are never read. Plan shape: probe selection is "
    "zero-shuffle (one broadcast packed-centroid row, array_sort + "
    "slice per query); candidate selection is a broadcast HASH join "
    "on cell (partition pruning once the corpus is written "
    "partitioned by cell); LUTs broadcast; WindowGroupLimit top-k. "
    "Residual encoding is the documented drop-in refinement. "
    "Approximate when a true neighbor lives in an unprobed cell; "
    "n_probe = n_cells degenerates to exact-ADC (= sim_pq_adc_topk).",
)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accident_prediction_montreal_spark.operators.kmeans import assign_cells
    from accident_prediction_montreal_spark.operators.pq import (
        ivfpq_topk,
        pq_encode,
        train_books,
    )

    dim = _PQ_M * _PQ_SUBDIM
    emb = (
        load_table(spark, "embeddings", sf_dir)
        .filter(F.col("embedding").isNotNull())
        .select("vec_id", F.col("embedding").cast("array<double>").alias("vec"))
    )
    # coarse quantizer = a 1-subspace codebook over the full dim: the
    # same deterministic-Lloyd train loop the subspace books use. The
    # coarse book and the m subspace books train FUSED in one corpus
    # pass per iteration (train_books with overlapping specs; r15 —
    # guide §2.1 eliminate redundant passes): the per-book values are
    # bit-identical to the two standalone trains (shared TakeOrdered
    # seeds, same per-book slices/tie-breaks, DECIMAL-exact sums keyed
    # (book, cell, dim)), but the corpus is scanned once per iteration
    # instead of twice and ONE persisted table serves every consumer.
    # Requires k equal across books (both are 8 here).
    assert _IVFPQ_COARSE_K == _PQ_K
    all_books = train_books(
        emb,
        [(0, dim)] + [(mi * _PQ_SUBDIM, _PQ_SUBDIM) for mi in range(_PQ_M)],
        k=_PQ_K,
        n_iter=_PQ_ITER,
    )
    coarse_cents, books = all_books[0], all_books[1:]
    # ONE at-rest index table (vec_id, cell, code_0..3): coarse assign
    # then encode in the same lineage, so the query path never joins
    # two corpus-sized relations (pq_encode keep_cols).
    coarse_assigned = assign_cells(emb, coarse_cents, vec_col="vec")
    index = pq_encode(
        coarse_assigned, books, sub_dim=_PQ_SUBDIM, keep_cols=["cell"]
    )
    queries = emb.filter(F.col("vec_id") < _PQ_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("query_vec")
    )
    out = ivfpq_topk(
        queries,
        coarse_cents,
        index,
        books,
        sub_dim=_PQ_SUBDIM,
        k=_PQ_TOPK,
        n_probe=_IVFPQ_NPROBE,
    )
    return out.select(
        "query_id",
        "vec_id",
        (F.round("adc_d2", 6) + 0.0).alias("adc_d2"),
        F.col("rank").cast("long").alias("rank"),
    )
