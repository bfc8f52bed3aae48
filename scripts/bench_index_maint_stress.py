"""Index-maintenance scaling stress: fixed |delta|, growing corpus.

llm_index_maintenance's claim is that the MAINTENANCE path costs
O(|delta|) signature work + an anti-join against the slim index, while
the rebuild it replaces costs O(|corpus|). This script measures both
paths against the SAME absolute delta (D changed + D added + D removed
docs) on the sf0.1 corpus and on the 10x stress corpus
(scripts/make_stress_sf.py output, the same dir bench_sf1 uses):

  * maintain_s — corpus_diff + banded signatures of the 2D delta docs
    + doc-id anti-join + union, materialized (the at-rest index of A is
    built first and its cost charged separately, as in production);
  * rebuild_s — banded signatures of the whole of B, materialized (the
    cost a non-incremental pipeline pays per snapshot).

Expected shape: rebuild_s grows ~10x with the corpus; maintain_s grows
far sub-linearly (the diff's digest join touches every id — 32 bytes
per doc — but the signature work, the expensive part, is fixed at 2D
docs). The embedding-refresh twin (llm_embedding_refresh) shares this
exact shape with the encoder in place of the signature.

Usage: python scripts/bench_index_maint_stress.py [round]
  -> writes /root/repo/BENCH_index_maint_stress_r{N}.json and prints it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from accident_prediction_montreal_spark.session import get_session  # noqa: E402

STRESS_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
D = 400  # changed docs; same count added and removed


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


def measure(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from accident_prediction_montreal_spark.operators.dedup import (
        banded_signatures,
    )
    from accident_prediction_montreal_spark.operators.text import corpus_diff
    from accident_prediction_montreal_spark.sources.registry import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    n_corpus = docs.count()
    # FIXED-size delta regardless of corpus size: the first D ids change,
    # the next D are removed, D brand-new ids are added.
    ids = [r["doc_id"] for r in docs.select("doc_id").orderBy("doc_id").limit(2 * D).collect()]
    changed_ids, removed_ids = set(ids[:D]), set(ids[D : 2 * D])
    chg = F.col("doc_id").isin(list(changed_ids))
    rm = F.col("doc_id").isin(list(removed_ids))
    b = (
        docs.filter(chg).select(
            "doc_id", F.concat(F.col("text"), F.lit(" [rev2]")).alias("text")
        )
        .unionByName(docs.filter(~chg & ~rm).select("doc_id", "text"))
        .unionByName(
            docs.filter(chg).select(
                (F.col("doc_id") + 900_000_000).alias("doc_id"), "text"
            )
        )
    )

    bands = ["doc", "band_id", "band_hash"]
    idx_a = banded_signatures(docs).select(*bands).persist()
    t0 = time.perf_counter()
    n_index = idx_a.count()
    index_build_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    diff = corpus_diff(docs, b).persist()
    stale = diff.filter(F.col("status").isin("removed", "changed")).select(
        F.col("doc_id").alias("doc")
    )
    fresh = b.join(
        diff.filter(F.col("status").isin("added", "changed")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    maintained = idx_a.join(stale, "doc", "left_anti").unionByName(
        banded_signatures(fresh).select(*bands)
    )
    n_maintained = maintained.count()
    maintain_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_rebuild = banded_signatures(b).select(*bands).count()
    rebuild_s = time.perf_counter() - t0

    assert n_maintained == n_rebuild, (n_maintained, n_rebuild)
    diff.unpersist()
    idx_a.unpersist()
    return {
        "n_corpus": n_corpus,
        "n_index_rows": n_index,
        "index_build_s": round(index_build_s, 3),
        "maintain_s": round(maintain_s, 3),
        "rebuild_s": round(rebuild_s, 3),
        "maintained_equals_rebuild_rows": n_maintained,
    }


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "X"
    spark = get_session("idx-maint-stress")
    measure(spark, "/root/testdata/sf0.1")  # warm-up: JIT + codegen
    base = measure(spark, "/root/testdata/sf0.1")
    big = measure(spark, ensure_stress_dir())
    out = {
        "metric": "index_maintenance_scaling",
        "unit": "sec",
        "delta_docs": 3 * D,
        "base": base,
        "x10": big,
        "rebuild_ratio": round(big["rebuild_s"] / base["rebuild_s"], 2),
        "maintain_ratio": round(big["maintain_s"] / base["maintain_s"], 2),
    }
    path = os.path.join(REPO, f"BENCH_index_maint_stress_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
