"""Incremental line-dedup maintenance stress: hold the DELTA fixed
(odd doc_ids of sf0.1) and grow the BASE corpus 10x (even doc_ids of
sf0.1 vs the sf1 stress replica). The operator's claim is that
maintain cost is bounded by the delta, not the corpus — state build is
the one-off at-rest cost charged separately (in production the state
is a bucketed digest table; per-delta runs never re-explode the base).

Writes BENCH_line_maint_r{N}.json. Usage:
    python scripts/bench_line_maint.py [round]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from accident_prediction_montreal_spark.plans.wave13 import (  # noqa: E402
    _line_dedup_incremental_impl,
)
from accident_prediction_montreal_spark.session import get_session  # noqa: E402
from accident_prediction_montreal_spark.sources.registry import load_table  # noqa: E402

STRESS_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "0"
    spark = get_session("bench-line-maint")
    delta = (
        load_table(spark, "documents", "/root/testdata/sf0.1")
        .select("doc_id", "source", "text")
        .filter(F.col("doc_id") % 2 == 1)
    )
    # warm-up amortizes JVM/codegen/parquet-footer start (the first
    # cut skipped it and read base_10x FASTER than base_1x)
    delta.count()
    out: dict = {"metric": "line_dedup_incremental_maintain", "unit": "sec"}
    bases = {
        "base_1x": "/root/testdata/sf0.1",
        "base_10x": STRESS_DIR,
    }
    best: dict = {k: {} for k in bases}
    # INTERLEAVED min-of-3 per label: back-to-back label blocks let the
    # second label ride the first's page cache (the first cut read
    # base_10x "faster" than base_1x purely from run order)
    for _ in range(3):
        for label, base_dir in bases.items():
            base = (
                load_table(spark, "documents", base_dir)
                .select("doc_id", "source", "text")
                .filter(F.col("doc_id") % 2 == 0)
            )
            t: dict = {}
            t0 = time.perf_counter()
            _line_dedup_incremental_impl(base, delta, timings=t)
            t["total_s"] = round(time.perf_counter() - t0, 3)
            spark.catalog.clearCache()
            if not best[label] or t["maintain_s"] < best[label]["maintain_s"]:
                best[label] = t
    for label in bases:
        out[label] = best[label]
        print(f"  {label}: {best[label]}", file=sys.stderr)
    out["maintain_ratio_10x_over_1x"] = round(
        out["base_10x"]["maintain_s"] / out["base_1x"]["maintain_s"], 3
    )
    path = os.path.join(REPO, f"BENCH_line_maint_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
