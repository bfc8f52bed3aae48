"""Vector math over ``array<float|double>`` embedding columns.

Built-in higher-order functions (``aggregate``/``zip_with``) keep the
arithmetic JVM-side — no Python round trip — which is what makes
brute-force cosine top-k viable as the baseline ANN path at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (JVM-side, no UDF)."""
    pairs = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(pairs, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (‖a‖·‖b‖); null-safe only insofar as inputs are non-empty."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def sq_norm(a: Column | str) -> Column:
    """Σ aᵢ² (no sqrt) — the cheap degenerate-vector test."""
    return F.aggregate(
        _c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def valid_vectors(
    df, vec_col: str = "embedding", positive_norm: bool = True
):
    """Drop degenerate vectors — the engine-wide contract (r14, found by
    the embeddings-table cross-engine fuzz):

      * NULL embeddings are unencodable and are dropped by every vector
        operator (also: DuckDB 1.0.0's list_dot_product ERRORS outright
        on parquet-read NULL lists, so an unfiltered oracle can't even
        evaluate them);
      * zero-norm vectors additionally drop from COSINE-based operators
        (cosine is 0/0 — Spark ANSI throws DIVIDE_BY_ZERO, DuckDB yields
        NULL, and NaN/NULL threshold comparisons are not portable:
        DuckDB orders NaN above all values). L2-based operators
        (euclidean LSH, k-means, PQ) keep zero vectors — their distances
        are well-defined.

    SQL mirror: ``WHERE embedding IS NOT NULL [AND
    list_dot_product(v, v) > 0]``.
    """
    out = df.filter(F.col(vec_col).isNotNull())
    if positive_norm:
        out = out.filter(sq_norm(vec_col) > 0.0)
    return out
