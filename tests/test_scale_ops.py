"""Contract tests for the r7 scale-pattern operators: CDC merge,
Bloom semi-join, Misra-Gries heavy hitters, point-in-polygon, Z-order
layout, data-quality gate."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.bloomjoin import (
    bloom_bitmap,
    bloom_prefilter,
    bloom_semi_join,
)
from accident_prediction_montreal_spark.operators.cdc import cdc_apply
from accident_prediction_montreal_spark.operators.heavyhitters import (
    heavy_hitters_exact,
    misra_gries_candidates,
)
from accident_prediction_montreal_spark.operators.polygon import (
    demo_polygons,
    point_in_polygon_join,
)
from accident_prediction_montreal_spark.operators.zorder import write_zordered, zvalue


# --- CDC merge -----------------------------------------------------------------


def test_cdc_apply_semantics(spark):
    TS = datetime(2024, 1, 1)
    base = spark.createDataFrame(
        [(1, 10.0, TS), (2, 20.0, TS), (3, 30.0, TS)], "k LONG, v DOUBLE, ts TIMESTAMP"
    )
    # key 1: upsert then delete (delete wins: later order)
    # key 2: two upserts, last-writer-wins on (ts, cid)
    # key 4: brand-new upsert; key 5: delete of a nonexistent key
    T2 = datetime(2024, 1, 2)
    changes = spark.createDataFrame(
        [
            (1, 99.0, T2, 1, "U"),
            (1, 0.0, T2, 2, "D"),
            (2, 21.0, T2, 1, "U"),
            (2, 22.0, T2, 2, "U"),
            (4, 40.0, T2, 1, "U"),
            (5, 0.0, T2, 1, "D"),
        ],
        "k LONG, v DOUBLE, ts TIMESTAMP, cid LONG, op STRING",
    )
    got = {
        r["k"]: (r["v"], r["src"])
        for r in cdc_apply(
            base, changes, ["k"], ["ts", "cid"], ["v"], op_col="op"
        ).collect()
    }
    assert got == {2: (22.0, "upsert"), 3: (30.0, "base"), 4: (40.0, "upsert")}


# --- Bloom semi-join ------------------------------------------------------------


def test_bloom_no_false_negatives_and_exact(spark):
    build = spark.range(0, 500, 7).withColumnRenamed("id", "bk")  # keys 0,7,14,...
    probe = spark.range(0, 1000).withColumnRenamed("id", "pk")
    m, k = 1 << 12, 3
    bm = bloom_bitmap(build, "bk", m, k)
    pre = {r["pk"] for r in bloom_prefilter(probe, "pk", bm, m, k).collect()}
    truth = {i for i in range(0, 1000) if i < 500 and i % 7 == 0}
    assert truth <= pre  # superset: no false negatives
    exact = {r["pk"] for r in bloom_semi_join(probe, build, "pk", "bk", m, k).collect()}
    assert exact == truth  # downstream exact join removes the leaks


def test_bloom_prefilter_is_selective(spark):
    # 50 build keys in a 4096-bit filter: the prefilter must reject the
    # overwhelming majority of the 10k non-member probes
    build = spark.range(0, 50).withColumnRenamed("id", "bk")
    probe = spark.range(100, 10100).withColumnRenamed("id", "pk")
    bm = bloom_bitmap(build, "bk", 1 << 12, 3)
    n_pass = bloom_prefilter(probe, "pk", bm, 1 << 12, 3).count()
    assert n_pass < 1000  # expected fpp ~ (1 - e^(-150/4096))^3 << 1%


# --- heavy hitters --------------------------------------------------------------


def test_misra_gries_superset_and_exact_counts(spark):
    # 4 partitions; keys 0..4 heavy (400 each), 2000 unique tail keys
    rows = [(kk,) for kk in range(5) for _ in range(400)] + [
        (1000 + i,) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "hh_key LONG").repartition(4)
    n = len(rows)
    heavy_truth = {k: 400 for k in range(5) if 400 > 0.05 * n}
    cand = {r["hh_key"] for r in misra_gries_candidates(df, "hh_key", 41).collect()}
    assert set(heavy_truth) <= cand  # pigeonhole superset guarantee
    got = {
        r["hh_key"]: r["cnt"]
        for r in heavy_hitters_exact(df, "hh_key", 0.05).collect()
    }
    assert got == heavy_truth  # exact recount, exact threshold


# --- point in polygon -----------------------------------------------------------


def _brute_inside(px, py, edges_by_poly):
    out = set()
    for poly_id, edges in edges_by_poly.items():
        crossings = 0
        for x1, y1, x2, y2 in edges:
            if (y1 > py) != (y2 > py) and px < x1 + (py - y1) * (x2 - x1) / (y2 - y1):
                crossings += 1
        if crossings % 2 == 1:
            out.add(poly_id)
    return out


def test_point_in_polygon_matches_bruteforce(spark):
    edges = demo_polygons()
    edges_by_poly: dict = {}
    for p, x1, y1, x2, y2 in edges:
        edges_by_poly.setdefault(p, []).append((x1, y1, x2, y2))
    # deterministic point cloud over the whole plane incl. polygon interiors
    pts = [
        (i, (i * 131) % 1009 / 100.9, (i * 523) % 1009 / 100.9) for i in range(800)
    ]
    pdf = spark.createDataFrame(pts, "pid LONG, x DOUBLE, y DOUBLE")
    edf = spark.createDataFrame(
        edges, "poly_id INT, x1 DOUBLE, y1 DOUBLE, x2 DOUBLE, y2 DOUBLE"
    )
    got = {(r["pid"], r["poly_id"]) for r in
           point_in_polygon_join(pdf, edf, cell_size=1.0).collect()}
    want = {
        (pid, poly) for pid, px, py in pts for poly in _brute_inside(px, py, edges_by_poly)
    }
    assert got == want
    assert want  # fixture actually has points inside polygons


# --- z-order --------------------------------------------------------------------


def test_zvalue_interleave(spark):
    df = spark.createDataFrame([(0b101, 0b011)], "a LONG, b LONG")
    (z,) = df.select(zvalue(F.col("a"), F.col("b"), bits=4).alias("z")).collect()[0]
    # a bits at even positions: 1,0,1 -> 0b010001; b bits odd: 1,1,0 -> 0b001010
    assert z == 0b010001 | 0b001010


def test_zorder_layout_prunes_files(spark, tmp_path):
    df = spark.range(0, 20000).select(
        (F.col("id") % 200).alias("a"),
        ((F.col("id") * 7) % 100).alias("b"),
        F.col("id").alias("payload"),
    )
    path = str(tmp_path / "z")
    write_zordered(df, path, "a", "b", num_files=16)
    back = spark.read.parquet(path)
    total = back.select(F.input_file_name()).distinct().count()
    assert total >= 8
    touched = (
        back.filter((F.col("a") < 20) & (F.col("b") < 10))
        .withColumn("__f", F.input_file_name())
        .select("__f")
        .distinct()
        .count()
    )
    assert touched < total / 2  # rectangle predicate hits a minority of files
    # layout must not change the data
    assert back.count() == 20000
    got = back.filter((F.col("a") < 20) & (F.col("b") < 10)).count()
    want = df.filter((F.col("a") < 20) & (F.col("b") < 10)).count()
    assert got == want


# --- data-quality gate: one aggregate pass --------------------------------------


def test_dq_gate_single_pass_plan(spark):
    from accident_prediction_montreal_spark.operators import quality as Q

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 7.0), (3, "a", None)], "id LONG, cat STRING, v DOUBLE"
    )
    rep = Q.run_checks(
        df,
        [
            Q.completeness("v", 0.9),
            Q.bounded("id", 0, 10),
            Q.in_set("cat", ["a", "b"]),
        ],
    )
    rows = {r["chk"]: (r["ok"], r["measure"]) for r in rep.collect()}
    assert rows["completeness_v"] == (0, pytest.approx(2 / 3, abs=1e-6))
    assert rows["bounded_id"] == (1, 0.0)
    assert rows["in_set_cat"] == (1, 0.0)
    # one scan, one aggregate: no join/union in the plan
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Union" not in plan


# --- pagerank -------------------------------------------------------------------


def test_pagerank_matches_bruteforce(spark):
    from accident_prediction_montreal_spark.operators.graph import pagerank

    edges = [(0, 1, 2), (0, 2, 1), (1, 2, 3), (2, 0, 1), (3, 0, 5)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG, w LONG")
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=4).collect()}

    nodes = sorted({n for e in edges for n in e[:2]})
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    rank = {n: 1.0 / len(nodes) for n in nodes}
    for _ in range(4):
        contrib = {n: 0.0 for n in nodes}
        for s, d, w in edges:
            contrib[d] += rank[s] * (w / out_w[s])
        rank = {n: 0.15 / len(nodes) + 0.85 * contrib[n] for n in nodes}
    assert got.keys() == rank.keys()
    for n in nodes:
        assert abs(got[n] - rank[n]) < 1e-12, (n, got[n], rank[n])
    # dangling node 3 keeps only the base mass
    assert abs(got[3] - 0.15 / 4) < 1e-12


# --- triangle counting ---------------------------------------------------------


def test_triangle_stats_vs_brute_force(spark):
    import itertools
    import random

    from accident_prediction_montreal_spark.operators.graph import triangle_stats

    rng = random.Random(7)
    nodes = list(range(12))
    edges = sorted(
        {(u, v) for u, v in itertools.combinations(nodes, 2) if rng.random() < 0.4}
    )
    adj = {n: set() for n in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    brute_tri = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    df = spark.createDataFrame(edges, "u LONG, v LONG")
    row = triangle_stats(df).collect()[0]
    touched = {n for e in edges for n in e}
    assert row["n_nodes"] == len(touched)
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == brute_tri
    # oriented wedge count >= triangles, and equals sum over out-degrees
    assert row["n_wedges"] >= brute_tri


def test_triangle_stats_counts_each_once(spark):
    from accident_prediction_montreal_spark.operators.graph import triangle_stats

    # K4: 4 triangles, 6 edges; a star (no triangles) hangs off node 0
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (0, 9), (0, 8)]
    df = spark.createDataFrame(k4, "u LONG, v LONG")
    row = triangle_stats(df).collect()[0]
    assert row["n_triangles"] == 4
    assert row["n_nodes"] == 6


# --- global row index ----------------------------------------------------------


def test_global_row_index_matches_window(spark):
    import random

    from pyspark.sql import Window

    from accident_prediction_montreal_spark.operators.indexing import global_row_index

    rng = random.Random(3)
    rows = [(i, rng.randint(0, 10_000)) for i in range(5_000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "id LONG, key LONG").repartition(16)
    got = global_row_index(df, ["key", "id"], num_partitions=8)
    expected = df.withColumn(
        "want", F.row_number().over(Window.orderBy("key", "id")) - 1
    )
    bad = (
        got.join(expected.select("id", "want"), "id")
        .filter(F.col("global_idx") != F.col("want"))
        .count()
    )
    assert bad == 0
    # index is a 0..n-1 bijection
    n = got.count()
    assert got.select("global_idx").distinct().count() == n
    assert got.agg(F.min("global_idx"), F.max("global_idx")).collect()[0] == (0, n - 1)


def test_global_row_index_no_single_partition_sort(spark):
    from accident_prediction_montreal_spark.operators.indexing import global_row_index

    df = spark.range(1000).select(F.col("id").alias("k"))
    plan = global_row_index(df, ["k"], num_partitions=8)._jdf.queryExecution().executedPlan().toString()
    # the data-sized path must carry no global Sort (rangepartitioning
    # shuffle + within-partition sort only); a Window over an empty
    # partition spec would show 'Window' with a single-partition exchange
    assert "SinglePartition" not in plan.split("Window")[0]


# --- weighted sampling ---------------------------------------------------------


def test_weighted_sample_topk_equals_naive(spark):
    from pyspark.sql import Window

    from accident_prediction_montreal_spark.operators.mixing import (
        SALT_WEIGHTED,
        lcg_uniform,
        weighted_sample_topk,
    )

    df = (
        spark.range(2000)
        .select(
            F.col("id").alias("rid"),
            (F.col("id") % 3).cast("string").alias("g"),
            ((F.col("id") * 37) % 100 + 1.0).alias("w"),
        )
        .repartition(16)
    )
    got = weighted_sample_topk(
        df, id_col="rid", weight_col=F.col("w"), k=25, strata_col="g"
    ).select("g", "rid", "sample_rank")

    key = F.pow(lcg_uniform("rid", salt=SALT_WEIGHTED), F.lit(1.0) / F.col("w"))
    naive = (
        df.withColumn("__k", key)
        .withColumn(
            "sample_rank",
            F.row_number().over(
                Window.partitionBy("g").orderBy(F.col("__k").desc(), F.col("rid"))
            ),
        )
        .filter(F.col("sample_rank") <= 25)
        .select("g", "rid", "sample_rank")
    )
    assert got.exceptAll(naive).count() == 0
    assert naive.exceptAll(got).count() == 0


def test_weighted_sample_topk_excludes_nonpositive(spark):
    from accident_prediction_montreal_spark.operators.mixing import weighted_sample_topk

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, 2.0)], "rid LONG, w DOUBLE"
    )
    got = weighted_sample_topk(df, id_col="rid", weight_col=F.col("w"), k=10)
    ids = {r["rid"] for r in got.collect()}
    assert ids == {1, 4}


# --- audio frames --------------------------------------------------------------


def test_wav_frame_features_vs_numpy(spark):
    import numpy as np

    from accident_prediction_montreal_spark.operators.multimodal import (
        encode_wav_pcm16,
        wav_frame_features,
    )

    rng = np.random.default_rng(11)
    samples = rng.integers(-32768, 32767, size=63, dtype=np.int64)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav_pcm16(samples)))], "media_id LONG, payload BINARY"
    )
    out = {r["frame_id"]: r for r in wav_frame_features(df, frame_len=25).collect()}
    assert sorted(out) == [0, 1, 2]
    assert [out[i]["n_samples"] for i in (0, 1, 2)] == [25, 25, 13]
    for fid in (0, 1, 2):
        fr = samples[fid * 25 : (fid + 1) * 25]
        assert out[fid]["zero_cross"] == int((fr[:-1] * fr[1:] < 0).sum())
        assert abs(out[fid]["rms_amp"] - float(np.sqrt((fr.astype(float) ** 2).mean()))) < 1e-9
