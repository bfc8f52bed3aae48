"""Recall/latency bracket for the APPROXIMATE regime of
ivf_cosine_topk_bucketed (r11 verdict ask #2).

The registered query (sim_cosine_topk_bucketed) runs EXACT mode
(n_probe = n_cells) so a brute-force SQL scan can be its full value
oracle; this script publishes the treatment its window-form twin
already has (sim_ann_recall): measured recall@k against the exact
top-k for n_probe in {1, 2, 4, 8} over the sf1 embeddings, with the
wall-clock latency curve beside it — the cost/recall trade a 100-TB
deployment actually tunes.

Writes BENCH_ann_bucketed_recall_r{N}.json and prints the JSON line.
Usage: python scripts/bench_ann_bucketed_recall.py [round_number]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F  # noqa: E402

from accident_prediction_montreal_spark.session import get_session  # noqa: E402
from accident_prediction_montreal_spark.sources.registry import load_table  # noqa: E402
from bench_sf1 import ensure_stress_dir  # noqa: E402

N_CELLS = 8
K = 10
PROBES = [1, 2, 4, 8]
RUNS = 2


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "12"
    sf_dir = ensure_stress_dir()
    spark = get_session("bench-ann-recall")

    from accident_prediction_montreal_spark import cachereg
    from accident_prediction_montreal_spark.operators.ivf import (
        build_ivf_index,
        ivf_cosine_topk_bucketed,
    )

    # The sf1 stress dir is 10 consistent-key REPLICAS of sf0.1 — fine
    # for join/agg stress, degenerate for a recall curve: each query's
    # exact top-k would be its own identical copies, which share one
    # cell, making recall 1.0 at ANY n_probe (measured before this
    # perturbation: 1.0 at n_probe=1). A deterministic per-(vec_id,
    # element) offset makes all 20k vectors distinct while preserving
    # the corpus's cluster geometry, so the curve measures the real
    # probe/recall trade.
    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: x
            + (
                F.pmod(F.col("vec_id") * 31 + i * 7, F.lit(997)).cast("double")
                / 997.0
                - 0.5
            )
            * 0.2,
        ).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") % 20 == 7).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    n_corpus = emb.count()
    n_q = queries.count()

    # One quantizer fit shared across the bracket (the fit is the fixed
    # cost; the bracket varies only the probe budget). The assignment is
    # persisted: a deployment would hold it AT REST partitioned by cell.
    assigned, cents = build_ivf_index(
        emb, n_cells=N_CELLS, sample_fraction=0.25, max_iter=5
    )
    assigned = assigned.persist()
    assigned.count()

    def run(n_probe: int) -> tuple[float, object]:
        best = float("inf")
        out = None
        for _ in range(RUNS):
            t0 = time.perf_counter()
            out = ivf_cosine_topk_bucketed(
                queries, assigned, cents, k=K, n_probe=n_probe
            )
            out.count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), out

    # n_probe = n_cells is EXACT (tested equal to the brute scan) — it
    # is both the last bracket point and the recall denominator.
    exact_sec, exact = run(N_CELLS)
    exact_hits = exact.select("query_id", "vec_id").persist()
    denom = exact_hits.count()  # n_q * K (fewer only if corpus < K)

    curves = []
    for p in PROBES:
        sec, out = (exact_sec, exact) if p == N_CELLS else run(p)
        n_match = (
            out.select("query_id", "vec_id")
            .join(exact_hits, ["query_id", "vec_id"], "left_semi")
            .count()
        )
        curves.append(
            {
                "n_probe": p,
                "recall_at_k": round(n_match / denom, 4),
                "sec": sec,
            }
        )
        print(f"n_probe={p}: recall@{K}={n_match / denom:.4f} {sec}s")

    exact_hits.unpersist()
    assigned.unpersist()
    cachereg.release_all()

    artifact = {
        "metric": "ann_bucketed_recall_latency",
        "n_cells": N_CELLS,
        "k": K,
        "n_corpus": n_corpus,
        "n_queries": n_q,
        "runs": RUNS,
        "curves": curves,
        "sf": 1.0,
        "ts": round(time.time(), 1),
    }
    path = os.path.join(REPO, f"BENCH_ann_bucketed_recall_r{rnd}.json")
    with open(path, "w") as f:
        f.write(json.dumps(artifact) + "\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
