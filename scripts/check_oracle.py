"""Local correctness harness: run every registered query on Spark AND its
DuckDB oracle, compare row count, column names and order-insensitive
value hash — a local approximation of the driver's t2 gate.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from accident_prediction_montreal_spark.plans import REGISTRY  # noqa: E402
from accident_prediction_montreal_spark.session import get_session  # noqa: E402
from accident_prediction_montreal_spark.sources.registry import TABLES  # noqa: E402


def canon(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if value == int(value) and abs(value) < 1e15:
            return repr(float(value))
        return repr(value)
    if isinstance(value, list):
        return "[" + ",".join(canon(v) for v in value) + "]"
    return repr(value)


def row_set(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_session("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, spec in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            failures.append(name)
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            orows = con.sql(spec.oracle).fetchall()
            ocols = [d[0] for d in con.sql(spec.oracle).description]
        except Exception:
            failures.append(name)
            print(f"FAIL {name}: duckdb error\n{traceback.format_exc()}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} duck={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not problems:
            s = row_set(scols, [[r[c] for c in scols] for r in srows])
            o = row_set(ocols, orows)
            if s != o:
                diff = [(a, b) for a, b in zip(s, o) if a != b][:3]
                problems.append(f"values differ, e.g. {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(srows)} rows match")
    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
