"""Build a 10x stress-scale copy of an sf directory under /tmp.

Replicates every fact table R times with CONSISTENT key shifts (orders
and lineitem share the orderkey shift, etc.) so join fan-outs and group
cardinalities scale like real data rather than key-collision artifacts.
Dimension tables (nation/region) stay fixed, like TPC-H itself.
Document text gets a per-replica suffix — verbatim copies would turn the
near-dup queries into degenerate all-duplicate workloads (every shingle
above any doc-frequency cap) instead of a 10x-bigger realistic one.

Usage: python scripts/make_stress_sf.py [src_dir] [dst_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

SHIFTED = {
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey", "l_suppkey": "suppkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "customer": {"c_custkey": "custkey"},
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
DOMAIN_SOURCE = {
    "orderkey": ("orders", "o_orderkey"),
    "custkey": ("customer", "c_custkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    stride = {
        dom: con.sql(
            f"SELECT MAX({col}) + 1 FROM '{SRC}/{tbl}.parquet'"
        ).fetchone()[0]
        for dom, (tbl, col) in DOMAIN_SOURCE.items()
    }
    for tbl in ("nation", "region"):
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{tbl}.parquet') TO '{DST}/{tbl}.parquet'"
        )
    for tbl, shifts in SHIFTED.items():
        cols = [
            c[0]
            for c in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{tbl}.parquet'"
            ).fetchall()
        ]
        parts = []
        for i in range(R):
            exprs = []
            for c in cols:
                if c in shifts:
                    exprs.append(f"{c} + {i * stride[shifts[c]]} AS {c}")
                elif tbl == "documents" and c == "text" and i > 0:
                    exprs.append(f"text || ' replica{i}' AS text")
                else:
                    exprs.append(c)
            parts.append(f"SELECT {', '.join(exprs)} FROM '{SRC}/{tbl}.parquet'")
        con.sql(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/{tbl}.parquet'"
        )
    for tbl in list(SHIFTED) + ["nation", "region"]:
        n = con.sql(f"SELECT COUNT(*) FROM '{DST}/{tbl}.parquet'").fetchone()[0]
        print(tbl, n)


if __name__ == "__main__":
    main()
