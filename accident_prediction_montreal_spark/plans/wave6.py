"""Wave-6 queries (r7): bounded-round graph search, time-series
autocorrelation, the gains/lift targeting table, bounded-frame rolling
medians, and manifest-based snapshot time travel — closing the
remaining diagnostics/layout families. All value-oracle-backed.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from accident_prediction_montreal_spark import cachereg
from accident_prediction_montreal_spark.plans.registry import register
from accident_prediction_montreal_spark.plans.relational_extra import _scratch
from accident_prediction_montreal_spark.sources.registry import load_table

_BFS_ROUNDS = 3
_BFS_INF = 999

# The g2/g3 bucket-capped co-occurrence graph, shared verbatim.
_GRAPH_CTES = """
    b0 AS (
      SELECT DISTINCT user_id AS uid, event_type, date_trunc('hour', ts) AS h
      FROM events
    ),
    b AS (
      SELECT uid, event_type, h FROM (
        SELECT uid, event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type, h
                                  ORDER BY uid) AS rn
        FROM b0) t WHERE rn <= 5
    ),
    e AS (
      SELECT DISTINCT x.uid AS u, y.uid AS v
      FROM b x JOIN b y USING (event_type, h) WHERE x.uid < y.uid
    ),
    nbr AS (SELECT u AS a, v AS b FROM e UNION ALL SELECT v, u FROM e),
    nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e)
"""


def _capped_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(u, v) unique undirected edges of the bucket-capped co-occurrence
    graph (users sharing an (event_type, hour) bucket; 5 smallest uids
    per bucket — the g2_triangle_count construction)."""
    ev = load_table(spark, "events", sf_dir)
    b0 = ev.select(
        F.col("user_id").alias("uid"),
        "event_type",
        F.date_trunc("hour", "ts").alias("h"),
    ).distinct()
    cap_w = Window.partitionBy("event_type", "h").orderBy("uid")
    b = (
        b0.withColumn("__rn", F.row_number().over(cap_w))
        .filter(F.col("__rn") <= 5)
        .drop("__rn")
    )
    x = b.select(F.col("uid").alias("u"), "event_type", "h")
    y = b.select(F.col("uid").alias("v"), "event_type", "h")
    return (
        x.join(y, on=["event_type", "h"])
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


def _bfs_round(sql_prev: str) -> str:
    return f"""(
      SELECT n.node, LEAST(n.dist, COALESCE(MIN(l.dist) + 1, n.dist)) AS dist
      FROM {sql_prev} n LEFT JOIN nbr ON nbr.a = n.node
                        LEFT JOIN {sql_prev} l ON l.node = nbr.b
      GROUP BY n.node, n.dist
    )"""


@register(
    "g4_bfs_khop",
    oracle=f"""
    WITH {_GRAPH_CTES},
    d0 AS (
      SELECT node,
        CASE WHEN node = (SELECT MIN(node) FROM nodes)
             THEN 0 ELSE {_BFS_INF} END AS dist
      FROM nodes
    ),
    d1 AS {_bfs_round("d0")},
    d2 AS {_bfs_round("d1")},
    d3 AS {_bfs_round("d2")}
    SELECT node, CAST(dist AS BIGINT) AS dist FROM d3
    WHERE dist < {_BFS_INF} ORDER BY node
    """,
    description=f"Single-source k-hop BFS (graph family, the search "
    "primitive beside g1 PageRank / g2 triangles / g3 label "
    "propagation): hop distance from the minimum-id seed over the "
    f"bucket-capped co-occurrence graph, {_BFS_ROUNDS} synchronous "
    "relaxation rounds — dist(v) <- min(dist(v), min over neighbors "
    "dist(u)+1), the Bellman-Ford step that at 100 TB is one "
    "neighbor-keyed join + one groupBy(node) min per round over a "
    "PERSISTED neighbor list (cachereg; rounds never recompute the "
    "edge subtree). The seed is a 1-row aggregate broadcast, never a "
    "driver-side collect. Oracle replays the rounds as chained CTEs; "
    "unreached nodes (sentinel dist) are excluded on both sides.",
)
def g4_bfs_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _capped_graph(spark, sf_dir)
    nbr = (
        edges.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionByName(edges.select(F.col("v").alias("a"), F.col("u").alias("b")))
        .persist()
    )
    # nodes feeds the seed aggregate AND the initial dist frame, and the
    # initial dist frame is itself referenced twice by round 0 (the
    # relaxation join and the left join) — unpersisted, the nbr-distinct
    # ran three times before the first relaxation (r14 measurement:
    # ~1.4 s per replay at sf0.1, pure fixed cost). Node-sized frames,
    # tiny at any scale (same argument as the per-round persists below).
    nodes = nbr.select(F.col("a").alias("node")).distinct().persist()
    seed1 = nodes.agg(F.min("node").alias("__seed"))
    dist = (
        nodes.crossJoin(F.broadcast(seed1))
        .select(
            "node",
            F.when(F.col("node") == F.col("__seed"), 0)
            .otherwise(_BFS_INF)
            .alias("dist"),
        )
        .persist()
    )
    # Each round references `dist` TWICE (relaxation join + left join):
    # left lazy, the per-round lineage doubles and round 1 re-executes
    # 2^rounds times (measured 5.6 s -> 1.4 s at sf1 with the per-round
    # persist). The frames are node-sized, tiny at any data scale.
    frames = [nbr, nodes, dist]
    for _ in range(_BFS_ROUNDS):
        cand = (
            nbr.join(dist, nbr["b"] == dist["node"])
            .groupBy("a")
            .agg((F.min("dist") + 1).alias("__nd"))
        )
        dist = (
            dist.join(cand, dist["node"] == cand["a"], "left")
            .select(
                "node",
                F.least(
                    F.col("dist"), F.coalesce(F.col("__nd"), F.col("dist"))
                ).alias("dist"),
            )
            .persist()
        )
        frames.append(dist)
    cachereg.register("plans.wave6.bfs", *frames)
    return (
        dist.filter(F.col("dist") < _BFS_INF)
        .select("node", F.col("dist").cast("long").alias("dist"))
        .orderBy("node")
    )


@register(
    "a30_autocorr",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS DOUBLE) AS cnt
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT cnt,
        LAG(cnt, 1) OVER w AS l1,
        LAG(cnt, 2) OVER w AS l2,
        LAG(cnt, 3) OVER w AS l3
      FROM hourly WINDOW w AS (ORDER BY h)
    )
    SELECT lag, ROUND(acf, 6) AS acf FROM (
      SELECT 1 AS lag, corr(cnt, l1) AS acf FROM lagged
      UNION ALL SELECT 2, corr(cnt, l2) FROM lagged
      UNION ALL SELECT 3, corr(cnt, l3) FROM lagged
    ) ORDER BY lag
    """,
    description="Autocorrelation function of the hourly event-count "
    "series at lags 1-3 (A-surface time-series family, beside TWA/OHLC/"
    "seasonal baseline): one map-side-combined hourly aggregate "
    "REDUCES the data to one row per hour — the global-order lag "
    "window then runs over that bounded series (720 rows for a month, "
    "8.8k for a year, regardless of event volume), which is why the "
    "single-partition window is safe here and only here. Pearson r "
    "per lag via the built-in corr aggregate (null lag pairs at the "
    "series head are skipped identically by both engines).",
)
def a30_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    w = Window.orderBy("h")
    lagged = hourly.select(
        "cnt",
        F.lag("cnt", 1).over(w).alias("l1"),
        F.lag("cnt", 2).over(w).alias("l2"),
        F.lag("cnt", 3).over(w).alias("l3"),
    )
    # NOT the corr aggregate: Spark 4's ANSI `corr` THROWS
    # DIVIDE_BY_ZERO on a zero-variance series where DuckDB's returns
    # NULL (found by the r14 events-table fuzz: identical hourly
    # counts). Same Pearson estimator composed from the pairwise
    # co-moments with try_divide, which yields NULL exactly where
    # DuckDB does — zero variance, and n<2 pairs (stddev_samp NULL).
    # The x-side moments must use only pairwise-COMPLETE rows (corr's
    # pairwise deletion), hence the when(lk notnull, cnt) columns.
    def acf(lk: str):
        x = F.when(F.col(lk).isNotNull(), F.col("cnt"))
        return F.try_divide(
            F.covar_samp(x, F.col(lk)),
            F.stddev_samp(x) * F.stddev_samp(F.col(lk)),
        )

    acfs = lagged.agg(
        acf("l1").alias("a1"),
        acf("l2").alias("a2"),
        acf("l3").alias("a3"),
    )
    return (
        acfs.select(
            F.explode(
                F.array(
                    F.struct(F.lit(1).alias("lag"), F.round("a1", 6).alias("acf")),
                    F.struct(F.lit(2).alias("lag"), F.round("a2", 6).alias("acf")),
                    F.struct(F.lit(3).alias("lag"), F.round("a3", 6).alias("acf")),
                )
            ).alias("r")
        )
        .select("r.lag", "r.acf")
        .orderBy("lag")
    )


@register(
    "m16_gains_table",
    oracle="""
    WITH scored AS (
      SELECT ((o_orderkey * 2654435761) % 1001) / 1000.0 AS prob,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
      FROM orders
    ),
    bands AS (
      SELECT CAST(LEAST(FLOOR(prob * 10), 9) AS INT) AS band,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(label) AS BIGINT) AS n_pos
      FROM scored GROUP BY 1
    )
    SELECT band, n, n_pos,
      CAST(SUM(n) OVER w AS BIGINT) AS cum_n,
      CAST(SUM(n_pos) OVER w AS BIGINT) AS cum_pos,
      ROUND(SUM(n_pos) OVER w / CAST(SUM(n_pos) OVER () AS DOUBLE), 6) AS gain,
      ROUND((SUM(n_pos) OVER w / CAST(SUM(n) OVER w AS DOUBLE))
            / (SUM(n_pos) OVER () / CAST(SUM(n) OVER () AS DOUBLE)), 6) AS lift
    FROM bands
    WINDOW w AS (ORDER BY band DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY band DESC
    """,
    description="Cumulative gains / lift table (ML-evaluation surface, "
    "completing the sweep + calibration + count-rate diagnostics "
    "family): score bands descending, cumulative positives captured "
    "and lift vs the base rate — the campaign-targeting table. Scale "
    "shape: ONE map-side-combined aggregate collapses the data to 10 "
    "band rows; every cumulative statistic is a window over that "
    "10-row table (never a global sort of scored rows — the ntile "
    "formulation would single-partition-sort the full dataset). Same "
    "deterministic Knuth-hash score as m_calibration_bins.",
)
def m16_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    scored = orders.select(
        (((F.col("o_orderkey") * 2654435761) % 1001) / 1000.0).alias("prob"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
    )
    bands = scored.groupBy(
        F.least(F.floor(F.col("prob") * 10), F.lit(9)).cast("int").alias("band")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("label").cast("long").alias("n_pos"),
    )
    w = Window.orderBy(F.col("band").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy()
    cum_n = F.sum("n").over(w)
    cum_pos = F.sum("n_pos").over(w)
    tot_n = F.sum("n").over(tot)
    tot_pos = F.sum("n_pos").over(tot)
    return (
        bands.select(
            "band",
            "n",
            "n_pos",
            cum_n.cast("long").alias("cum_n"),
            cum_pos.cast("long").alias("cum_pos"),
            F.round(cum_pos / tot_pos.cast("double"), 6).alias("gain"),
            F.round(
                (cum_pos / cum_n.cast("double")) / (tot_pos / tot_n.cast("double")), 6
            ).alias("lift"),
        )
        .orderBy(F.col("band").desc())
    )


@register(
    "w10_rolling_median",
    oracle="""
    SELECT event_id,
      ROUND(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
        AS rolling_med
    FROM events ORDER BY event_id
    """,
    description="Bounded-frame rolling MEDIAN (W-surface, the order-"
    "statistic frame the built-in window aggregates lack): per user, "
    "median of the last 5 values in (ts, event_id) order. Spark has no "
    "median window function — the frame is materialized as a "
    "collect_list over the 5-row bounded frame, array_sorted in-row, "
    "and interpolated exactly like DuckDB's median (odd -> middle, "
    "even -> mean of the two middles). The frame bound is the safety "
    "contract: state per row is O(frame), never O(partition), so the "
    "plan holds at any scale on the same single user-keyed shuffle as "
    "every other per-user window.",
)
def w10_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    mid_hi = (n / 2 + 1).cast("int")  # 1-based upper middle
    mid_lo = (n / 2).cast("int")
    # n == 0 branch FIRST: collect_list skips NULLs, so a frame whose
    # every value is NULL yields an empty array — without the guard the
    # even-length branch evaluates element_at(arr, 0), a runtime error
    # under ANSI (found by the r14 events-table fuzz; DuckDB's median
    # returns NULL on an all-NULL set, so the mirrors now agree).
    med = (
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n % 2 == 1, F.element_at(arr, ((n + 1) / 2).cast("int")))
        .otherwise((F.element_at(arr, mid_lo) + F.element_at(arr, mid_hi)) / 2)
    )
    return ev.select(
        "event_id", F.round(med, 6).alias("rolling_med")
    ).orderBy("event_id")


_TT_CUTOFF = "2024-01-16"


@register(
    "x25_time_travel",
    oracle=f"""
    SELECT 1 AS version, CAST(COUNT(*) AS BIGINT) AS n_rows,
      ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS value_sum,
      MAX(ts) AS max_ts
    FROM events WHERE ts < TIMESTAMP '{_TT_CUTOFF} 00:00:00'
    UNION ALL
    SELECT 2, CAST(COUNT(*) AS BIGINT),
      ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6),
      MAX(ts)
    FROM events
    ORDER BY version
    """,
    description="Manifest-based snapshot TIME TRAVEL (X-surface layout "
    "family, beside x9 schema evolution / x22 dynamic overwrite / x13 "
    "compaction): version 1 writes the base file set, version 2 "
    "appends a delta file set WITHOUT touching v1's files, and a tiny "
    "JSON manifest maps each version to its file list — the Iceberg/"
    "Delta snapshot pattern reduced to its core: readers resolve a "
    "version to immutable files and scan exactly those, so old "
    "versions stay readable forever and no write ever rewrites "
    "history. Reading the manifest is a driver-side metadata "
    "operation (bytes, like a catalog lookup); both snapshot scans "
    "stay fully distributed. Oracle recomputes both versions from the "
    "source with the split predicate; decimal-exact checksums make "
    "any file-set error (lost delta, double-counted base) a hash "
    "mismatch.",
)
def x25_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, _ = _scratch("ttravel", sf_dir)
    v1_dir = os.path.join(base, "v1")
    v2_dir = os.path.join(base, "v2")
    ev = load_table(spark, "events", sf_dir)
    cutoff = F.lit(_TT_CUTOFF).cast("timestamp")
    ev.filter(F.col("ts") < cutoff).write.mode("overwrite").parquet(v1_dir)
    ev.filter(F.col("ts") >= cutoff).write.mode("overwrite").parquet(v2_dir)
    manifest_path = os.path.join(base, "manifest.json")
    with open(manifest_path, "w") as f:
        json.dump({"1": [v1_dir], "2": [v1_dir, v2_dir]}, f)

    with open(manifest_path) as f:
        manifest = json.load(f)

    def snapshot(version: str) -> DataFrame:
        files = manifest[version]
        return (
            spark.read.parquet(*files)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.round(
                    F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 6
                ).alias("value_sum"),
                F.max("ts").alias("max_ts"),
            )
            .select(
                F.lit(int(version)).alias("version"), "n_rows", "value_sum", "max_ts"
            )
        )

    return snapshot("1").unionByName(snapshot("2")).orderBy("version")
