"""Stress evidence for the incremental-dedup scale claim (r8 verdict #7).

The claim under test: probing a NEW BATCH against the corpus LSH band
index costs O(|batch| x collision rate) — the CORPUS size only affects
the (amortized, at-rest) index build, never the per-batch probe. The
measurement holds the batch FIXED (derived from the sf0.1 documents)
and swaps the corpus between sf0.1 (1x, ~5.2k docs) and the 10x stress
corpus (~52.5k docs):

  - index_build_s: banded_signatures over the corpus, persisted +
    materialized (the production at-rest cost, paid once per corpus).
  - probe_s: the batch's band rows equi-joined against the persisted
    index + exact-signature est_jaccard per distinct colliding pair —
    the steady-state per-batch cost the claim is about (min of RUNS).

Writes BENCH_stress_r{N}.json:
  {"corpus_1x": {...}, "corpus_10x": {...}, "probe_ratio": ...,
   "index_ratio": ...}
Pass: probe_ratio stays near 1 (bounded by collision-rate growth)
while index_ratio tracks the 10x corpus.

Usage: python scripts/bench_incremental_stress.py [round_number]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from accident_prediction_montreal_spark.operators.dedup import (  # noqa: E402
    band_explode,
    banded_signatures,
    minhash_signature_hashed,
)
from accident_prediction_montreal_spark.operators.text import tokenize  # noqa: E402
from accident_prediction_montreal_spark.session import get_session  # noqa: E402
from accident_prediction_montreal_spark.sources.registry import load_table  # noqa: E402

STRESS_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def ensure_stress_dir() -> str:
    if not os.path.isdir(STRESS_DIR) or not os.listdir(STRESS_DIR):
        subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "scripts", "make_stress_sf.py"),
                "/root/testdata/sf0.1",
                STRESS_DIR,
                "10",
            ],
            check=True,
        )
    return STRESS_DIR


def fixed_batch(spark):
    """The dedup_incremental fixture batch, ALWAYS from sf0.1 — planted
    exact copies of every 13th sf0.1 doc plus synthetic novel docs — so
    the probe workload is identical against both corpora."""
    docs = load_table(spark, "documents", "/root/testdata/sf0.1").select(
        "doc_id", "text"
    )
    dup_src = docs.filter(
        (F.col("doc_id") % 13 == 0) & (F.size(tokenize(F.col("text"))) >= 3)
    )
    planted = dup_src.select((F.col("doc_id") + 200_000).alias("doc_id"), "text")
    novel = docs.filter(F.col("doc_id") % 13 == 1).select(
        (F.col("doc_id") + 200_000).alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit(f"zq{i}x"), F.col("doc_id").cast("string"))
                for i in range(6)
            ],
        ).alias("text"),
    )
    return planted.unionByName(novel)


def measure(spark, sf_dir: str, batch) -> dict:
    corpus = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    t0 = time.perf_counter()
    idx = (
        banded_signatures(corpus)
        .select(
            F.col("doc").alias("corpus_id"),
            F.col("sig").alias("__csig"),
            "band_id",
            "band_hash",
        )
        .persist()
    )
    n_index_rows = idx.count()
    index_build_s = round(time.perf_counter() - t0, 3)

    # Probe: map-only batch signatures -> band rows -> equi-join on the
    # persisted index -> exact-signature agreement per distinct pair.
    def probe() -> tuple[float, int]:
        t1 = time.perf_counter()
        bands = (
            batch.select(
                F.col("doc_id").alias("new_id"),
                minhash_signature_hashed(F.col("text")).alias("__nsig"),
            )
            .filter(F.col("__nsig").isNotNull())
            .select("new_id", "__nsig", band_explode("__nsig").alias("band"))
            .select("new_id", "__nsig", "band.band_id", "band.band_hash")
        )
        n_eq = F.size(
            F.filter(
                F.zip_with("__nsig", "__csig", lambda p, q: (p == q).cast("int")),
                lambda x: x == 1,
            )
        )
        pairs = (
            bands.join(idx, ["band_id", "band_hash"])
            .select("new_id", "corpus_id", (n_eq / F.lit(32.0)).alias("est"))
            .dropDuplicates(["new_id", "corpus_id"])
            .filter(F.col("est") >= 0.5)
        )
        n = pairs.count()
        return time.perf_counter() - t1, n

    best, n_pairs = probe()
    for _ in range(RUNS - 1):
        t, n_pairs = probe()
        best = min(best, t)
    out = {
        "corpus_docs": corpus.count(),
        "index_rows": n_index_rows,
        "index_build_s": index_build_s,
        "probe_s": round(best, 3),
        "pairs_found": n_pairs,
    }
    idx.unpersist()
    return out


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "0"
    stress = ensure_stress_dir()
    spark = get_session("bench-incr-stress")
    batch = fixed_batch(spark).persist()
    n_batch = batch.count()
    one = measure(spark, "/root/testdata/sf0.1", batch)
    ten = measure(spark, stress, batch)
    out = {
        "metric": "incremental_dedup_fixed_batch_probe",
        "batch_docs": n_batch,
        "runs": RUNS,
        "corpus_1x": one,
        "corpus_10x": ten,
        "index_ratio": round(ten["index_build_s"] / one["index_build_s"], 2),
        "probe_ratio": round(ten["probe_s"] / one["probe_s"], 2),
    }
    path = os.path.join(REPO, f"BENCH_stress_r{rnd}.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
