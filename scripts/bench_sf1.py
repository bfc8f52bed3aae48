"""sf1 (10x) stress bench -> machine-diffable per-round JSON artifact.

The sf0.1 bench cannot see quadratic blowups (round 4 found two only at
sf1), so every round publishes BENCH_sf1_r{N}.json next to BENCH_r{N}
.json: same shape as bench.py's output, per-query seconds over the same
headline set, at 10x the driver's bench scale. Regressions are then a
JSON diff, not archaeology in PERF.md prose.

Usage: python scripts/bench_sf1.py [round_number]
  - builds the stress dir via make_stress_sf.py on first use
    (10 consistent-key replicas of sf0.1, see that script's docstring)
  - SPARK_GRAFT_BENCH_RUNS (default 2 here; sf1 queries are expensive)
  - writes /root/repo/BENCH_sf1_r{N}.json and prints the JSON line
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (HEADLINE + run_headline: the single timing protocol)
from accident_prediction_montreal_spark.session import get_session  # noqa: E402

STRESS_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")


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


def main() -> None:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "0"
    sf_dir = ensure_stress_dir()
    spark = get_session("bench-sf1")
    # min-of-3, the SAME protocol as the sf0.1 artifact (r5 verdict #3:
    # r5's min-of-2 vs r4's prose numbers made deltas unattributable).
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    out = bench.run_headline(spark, sf_dir, runs)
    out["sf"] = 1.0
    bench.canary_normalize(out, 1.0)
    out["runs"] = runs
    path = os.path.join(REPO, f"BENCH_sf1_r{rnd}.json")
    with open(path, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
