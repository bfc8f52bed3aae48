"""Weighted PageRank by power iteration (A-surface, graph family —
complements operators/components.py's connected components with the
other canonical distributed-graph primitive).

Semantics: the classic damped update over a weighted directed graph,
   rank'(v) = (1-d)/N + d * Σ_{(u,v)∈E} rank(u) · w(u,v) / out_w(u)
iterated a FIXED number of rounds (deterministic, oracle-replayable;
no dangling-mass redistribution — nodes without out-edges simply leak
their damped mass, which is the common simplified formulation and is
mirrored exactly in the SQL oracle).

Scale shape: one hash-partitioned groupBy(dst) per iteration is the
only data-sized shuffle; the rank vector (one row per node) joins the
edge list broadcast when small, hash-co-partitioned with the edges
when not. Edges are normalized ONCE up front (w/out_w precomputed), so
iterations touch only (src, dst, frac) — at 100 TB you'd persist the
normalized edges partitioned by src and every iteration reuses that
layout; the iteration count is fixed and small, so the lazy plan stays
bounded (callers wanting many rounds should checkpoint every ~10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def normalize_edges(
    edges: DataFrame, src: str = "src", dst: str = "dst", weight: str = "w"
) -> DataFrame:
    """(src, dst, frac): edge weight as a fraction of its source's
    out-weight — one aggregate + one broadcast-able join, done once."""
    out_w = edges.groupBy(src).agg(F.sum(weight).alias("__out_w"))
    return edges.join(out_w, on=src).select(
        src, dst, (F.col(weight) / F.col("__out_w")).alias("frac")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(node, rank) after ``iterations`` damped power-iteration rounds,
    starting uniform over the node set (distinct src ∪ dst)."""
    norm = normalize_edges(edges, src, dst, weight)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    # node count as a 1-row broadcast, not a driver-side collect
    n1 = nodes.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    base = F.lit(1.0 - damping) / F.col("__n")
    for _ in range(iterations):
        contribs = (
            norm.join(ranks, norm[src] == ranks["node"])
            .select(F.col(dst).alias("node"), (F.col("rank") * F.col("frac")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("__in"))
        )
        ranks = (
            nodes.join(contribs, on="node", how="left")
            .crossJoin(F.broadcast(n1))
            .select(
                "node",
                (base + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
    return ranks
