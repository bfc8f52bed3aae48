"""Source-quota SKEW stress: one domain = 90% of the corpus.

A single dominant domain is the NORM in web corpora, not an edge case
— and it is exactly the input that breaks a naive per-source rank
window: partitionBy(source) sends the dominant source's ENTIRE row set
to one reducer, so one task carries 90% of the shuffle while 31 idle.

This script measures the registered quota shape both ways on a skewed
corpus (N_DOCS docs, SKEW_FRAC of them in one source, the rest spread
over N_MINOR_SOURCES):

  * plain   — row_number window straight over the corpus (the r10 plan)
  * levered — mixing.local_topk_pretruncate first (each input
    partition keeps its local top-K per source map-side; the global
    top-K is a subset of the union), then the same exact window

and records (a) wall time for each, (b) the row count entering the
window shuffle (corpus size vs the bounded pre-truncated count), and
(c) the kept-set checksum equality that proves the lever changes the
PLAN, never the ANSWER.

Usage: python scripts/bench_quota_skew.py [round_number]
  -> writes /root/repo/BENCH_quota_skew_r{N}.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from accident_prediction_montreal_spark.session import get_session  # noqa: E402

N_DOCS = 4_000_000
SKEW_FRAC = 0.9
N_MINOR_SOURCES = 40
K = 40
N_PARTS = 32


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from accident_prediction_montreal_spark.operators.mixing import (
        lcg_uniform,
        local_topk_pretruncate,
        should_pretruncate,
    )

    rnd = sys.argv[1] if len(sys.argv) > 1 else "X"
    spark = get_session("quota-skew")

    # Deterministic skewed corpus, generated distributed (no fixture
    # I/O — range() is parallel and the skew assignment is pure math):
    # doc_id % 10 < 9 -> the dominant source, else one of 40 minors.
    docs = (
        spark.range(0, N_DOCS, 1, N_PARTS)
        .select(
            F.col("id").alias("doc_id"),
            F.when(
                (F.col("id") % 10) < int(SKEW_FRAC * 10), F.lit("s_dominant")
            )
            .otherwise(
                F.concat(F.lit("s_minor_"), (F.col("id") % N_MINOR_SOURCES))
            )
            .alias("source"),
            (100 + F.col("id") % 900).alias("n_chars"),
        )
        .withColumn("__ord", lcg_uniform(F.col("doc_id"), salt=7))
        .persist()
    )
    n_rows = docs.count()  # materialize once so both paths read hot input

    w = Window.partitionBy("source").orderBy("__ord", "doc_id")

    def kept_checksum(frame):
        kept = frame.withColumn("rnk", F.row_number().over(w)).filter(
            F.col("rnk") <= K
        )
        row = kept.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("id_sum"),
            F.sum("n_chars").alias("chars"),
        ).collect()[0]
        return (row["n"], row["id_sum"], row["chars"])

    t0 = time.time()
    plain = kept_checksum(docs)
    plain_s = time.time() - t0

    t0 = time.time()
    pruned = local_topk_pretruncate(docs, "source", ["__ord", "doc_id"], K)
    pruned = pruned.persist()
    pruned_rows = pruned.count()  # rows entering the window shuffle
    levered = kept_checksum(pruned)
    levered_s = time.time() - t0
    pruned.unpersist()
    docs.unpersist()

    bound = N_PARTS * (N_MINOR_SOURCES + 1) * K
    # The registered query's input-size gate (r12): it must ENGAGE at
    # this stress shape and SKIP at the bench scales, with the same
    # n_keys_hint=64 the plan passes.
    gate = {
        "stress_engaged": should_pretruncate(n_rows, N_PARTS, 64, K),  # want True
        "sf0.1_engaged": should_pretruncate(5_000, 4, 64, K),  # want False
        "sf1_engaged": should_pretruncate(50_000, 8, 64, K),  # want False
    }
    out = {
        "metric": "quota_skew_stress",
        "unit": "sec",
        "n_docs": n_rows,
        "skew_frac": SKEW_FRAC,
        "k": K,
        "n_parts": N_PARTS,
        "plain_window_s": round(plain_s, 2),
        "levered_s": round(levered_s, 2),
        "window_input_rows_plain": n_rows,
        "window_input_rows_levered": pruned_rows,
        "window_input_bound": bound,
        "bound_holds": pruned_rows <= bound,
        "kept_sets_equal": plain == levered,
        "kept_checksum": list(plain),
        "gate": gate,
    }
    path = os.path.join(REPO, f"BENCH_quota_skew_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
