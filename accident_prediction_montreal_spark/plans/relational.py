"""Relational operator inventory (SURVEY.md §2.1-2.8) as oracle-checked queries.

Each query names the §2 operator it covers. Spark side uses the engine's
operators/functions; oracle side is plain ANSI SQL for DuckDB over the
same parquet tables (pre-registered views).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.functions.money import davg, dsum
from accident_prediction_montreal_spark.operators.windows import (
    cumulative_sum,
    top_k_per_group,
)
from accident_prediction_montreal_spark.plans.registry import register
from accident_prediction_montreal_spark.sources.registry import load_table


# --- S1/S2/P1-P5: scan, project, filter (pushdown-friendly) -----------------

@register(
    "s1_scan_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_quantity > 45
    """,
    description="Parquet scan with pushed filter + column pruning (S1/S2, P1, P4, P5)",
)
def s1_scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.filter(
        (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


# --- A1/A2: grouped aggregation (TPC-H Q1 shape) -----------------------------

@register(
    "a1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
        AS sum_disc_price,
      CAST(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS DOUBLE) AS avg_qty,
      CAST(CAST(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount) AS DOUBLE) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    description="Partial+final hash aggregation, decimal-exact sums (A1/A2)",
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    # Products use DECIMAL(18,4): a (38,6)×(38,6) product overflows the
    # 38-digit cap (DuckDB errors; Spark silently reduces scale).
    dec4 = lambda c: c.cast("decimal(18,4)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(dec4(F.col("l_extendedprice")) * dec4(F.lit(1) - F.col("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- A1 + J5: group-count outer-joined to the dim, zero-filled ---------------
# The reference's accident_count shape (src/preprocess.py:520-528).

@register(
    "a1_group_count_zerofill",
    oracle="""
    SELECT c.c_custkey, CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
           COALESCE(o.max_price, 0.0) AS max_price
    FROM customer c
    LEFT JOIN (SELECT o_custkey, COUNT(*) AS n_orders, MAX(o_totalprice) AS max_price
               FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    """,
    description="Group-count + group-max + outer join to dim + zero-fill "
    "(A1, A3, J5, P10; the reference's accident_count shape "
    "preprocess.py:520-528 and street-length max road_network.py:80-82)",
)
def a1_group_count_zerofill(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    counts = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max("o_totalprice").alias("max_price"),
    )
    return (
        cust.join(counts, cust.c_custkey == counts.o_custkey, "left")
        .na.fill({"n_orders": 0, "max_price": 0.0})
        .select(
            "c_custkey",
            F.col("n_orders").cast("long").alias("n_orders"),
            "max_price",
        )
    )


# --- A3: group-max (street-length shape, road_network.py:80-82) --------------

@register(
    "a3_group_max",
    oracle="""
    SELECT c_nationkey, MAX(c_acctbal) AS max_bal, MIN(c_acctbal) AS min_bal,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_nationkey
    """,
    description="Group max/min (A3) — exact on doubles, no rounding needed",
)
def a3_group_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, "customer", sf_dir)
        .groupBy("c_nationkey")
        .agg(
            F.max("c_acctbal").alias("max_bal"),
            F.min("c_acctbal").alias("min_bal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


# --- A4: pivot (threshold-sweep contract, random_forest.py:174-183) ----------

@register(
    "a4_pivot",
    oracle="""
    SELECT l_returnflag,
      CAST(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(38,6)) END) AS VARCHAR) AS DOUBLE) AS qty_o,
      CAST(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(38,6)) END) AS VARCHAR) AS DOUBLE) AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
    description="Pivot with pinned value list and explicit aliases (A4)",
)
def a4_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_o"),
            F.col("F").alias("qty_f"),
        )
    )


# --- A8: distinct count ------------------------------------------------------

@register(
    "a8_distinct_count",
    oracle="""
    SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           CAST(1 AS BIGINT) AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
    description="Exact distinct aggregation (A8) plus an oracle-checkable "
    "invariant on the HLL sketch scale path: approx_count_distinct must land "
    "within 10% of the exact count (the sketch itself differs per engine, "
    "so the invariant — not the estimate — is what gets hashed)",
)
def a8_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    out = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )
    approx_ok = (
        F.abs(F.col("approx_parts") - F.col("n_parts"))
        <= 0.1 * F.col("n_parts")
    ).cast("long")
    return out.select(
        "l_returnflag", "n_parts", "n_supps", approx_ok.alias("approx_ok")
    )


# --- A9: cube / grouping sets -------------------------------------------------

@register(
    "a9_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    description="CUBE rollup lattice (A9)",
)
def a9_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.cube("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))


# --- J1: equi-join chain with broadcast dims ---------------------------------

@register(
    "j1_join_chain_revenue",
    oracle="""
    SELECT n.n_name, r.r_name,
      CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue,
      COUNT(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    description="Multi-table equi-join with explicit broadcast of small dims (J1)",
)
def j1_join_chain_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(dsum("o_totalprice").alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


# --- J2: multi-key equi-join ---------------------------------------------------

@register(
    "j2_multikey_join",
    oracle="""
    SELECT l.l_orderkey, l.l_suppkey, COUNT(*) AS n_lines
    FROM lineitem l
    JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity > 40) d
      ON l.l_orderkey = d.l_orderkey AND l.l_suppkey = d.l_suppkey
    GROUP BY l.l_orderkey, l.l_suppkey
    """,
    description="Composite-key equi-join (J2)",
)
def j2_multikey_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    dim = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_suppkey").distinct()
    return (
        li.join(dim, ["l_orderkey", "l_suppkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


# --- J3: self-join ------------------------------------------------------------

@register(
    "j3_self_join_pairs",
    oracle="""
    SELECT a.l_orderkey, COUNT(*) AS n_pairs
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    GROUP BY a.l_orderkey
    """,
    description="Self-join pair enumeration within a group (J3, street-length shape)",
)
def j3_self_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_linenumber")
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
        )
        .groupBy(F.col("a.l_orderkey").alias("l_orderkey"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --- J4: anti / semi join -------------------------------------------------------
# The reference emulates anti-join with left_outer + isnull (preprocess.py:450-461);
# the engine uses the first-class join types.

@register(
    "j4_semi_anti",
    oracle="""
    SELECT c_custkey, 'has_orders' AS which FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT c_custkey, 'no_orders' AS which FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    description="Left-semi + left-anti join in one tagged output (J4 + its dual; "
    "the reference emulates anti with left_outer+isnull, preprocess.py:450-461)",
)
def j4_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    semi = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey")
        .withColumn("which", F.lit("has_orders"))
    )
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey")
        .withColumn("which", F.lit("no_orders"))
    )
    return semi.unionByName(anti)


# --- J5: full-outer join + zero-fill -------------------------------------------

@register(
    "j5_full_outer_zerofill",
    oracle="""
    SELECT
      COALESCE(c.c_custkey, o.o_custkey) AS custkey,
      CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
      CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END AS known_customer
    FROM customer c
    FULL OUTER JOIN (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    """,
    description="Full outer join with null-side handling (J5, P7, P10)",
)
def j5_full_outer_zerofill(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    counts = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        cust.join(counts, cust.c_custkey == counts.o_custkey, "outer")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            F.coalesce("n_orders", F.lit(0)).cast("long").alias("n_orders"),
            F.when(F.col("c_custkey").isNull(), 0).otherwise(1).alias("known_customer"),
        )
    )


# --- J6: cross join -------------------------------------------------------------

@register(
    "j6_cross_join_grid",
    oracle="""
    SELECT n.n_nationkey, r.r_regionkey,
      CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS is_home
    FROM nation n CROSS JOIN region r
    """,
    description="Cartesian grid generation (J6, dates×roads shape preprocess.py:290)",
)
def j6_cross_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir)
    return nation.crossJoin(region).select(
        "n_nationkey",
        "r_regionkey",
        F.when(F.col("n_regionkey") == F.col("r_regionkey"), 1).otherwise(0).alias("is_home"),
    )


# --- J7: theta (non-equi residual) join ------------------------------------------

@register(
    "j7_theta_join",
    oracle="""
    SELECT p.p_partkey, COUNT(*) AS n_above_retail
    FROM lineitem l JOIN part p
      ON l.l_partkey = p.p_partkey AND l.l_extendedprice > p.p_retailprice
    GROUP BY p.p_partkey
    """,
    description="Equi-join with non-equi residual predicate (J7)",
)
def j7_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir)
    return (
        li.join(
            F.broadcast(part),
            (li.l_partkey == part.p_partkey) & (li.l_extendedprice > part.p_retailprice),
        )
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("n_above_retail"))
    )


# --- W1/W2: top-k per group -------------------------------------------------------

@register(
    "w_topk_rank_rownum",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(rnk AS BIGINT) AS rnk, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey,
             RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rnk <= 3
    """,
    description="Top-k per group, both semantics in one window pass: rank() keeps "
    "ties (W1, preprocess.py:74-91), row_number() breaks them "
    "deterministically (W2). rank <= row_number, so filtering on rnk "
    "keeps every row either ranking selects.",
)
def w_topk_rank_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    ties = top_k_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc()],
        k=3,
        rank_col="rnk",
        keep_ties=True,
    )
    rn_w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return ties.withColumn("rn", F.row_number().over(rn_w)).select(
        "o_custkey",
        "o_orderkey",
        F.col("rnk").cast("long").alias("rnk"),
        F.col("rn").cast("long").alias("rn"),
    )


# --- W3: rolling frame average ------------------------------------------------------

@register(
    "w3_rolling_avg",
    oracle="""
    SELECT user_id, event_id,
      ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN CURRENT ROW AND 1 FOLLOWING), 6) AS rolling_avg
    FROM events
    """,
    description="Rolling frame avg over next row (W3, midpoint densification shape)",
)
def w3_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(0, 1)
    return events.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("rolling_avg"),
    )


# --- W5: cumulative and suffix sums ---------------------------------------------------

@register(
    "w5_running_sums",
    oracle="""
    SELECT o_custkey, o_orderkey,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_total,
      CAST(COALESCE(SUM(1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS BIGINT) AS n_later
    FROM orders
    """,
    description="Prefix (running, decimal-exact) + exclusive-suffix window "
    "aggregation over one sort (W5 both frames, random_forest.py:141-145); "
    "one shuffle serves both frames.",
)
def w5_running_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    running = cumulative_sum(
        F.col("o_totalprice").cast("decimal(38,6)"),
        ["o_custkey"],
        ["o_orderdate", "o_orderkey"],
    )
    later = cumulative_sum(
        F.lit(1), ["o_custkey"], ["o_orderdate", "o_orderkey"], reverse_exclusive=True
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        running.cast("double").alias("running_total"),
        F.coalesce(later, F.lit(0)).cast("long").alias("n_later"),
    )


# --- W6: global (unpartitioned) window -------------------------------------------------

@register(
    "w6_global_rank",
    oracle="""
    SELECT n_name, revenue,
           CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, n_name ASC) AS BIGINT) AS rn
    FROM (
      SELECT n.n_name,
        CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    ) t
    """,
    description="Global ordinal indexing over an aggregate (W6, preprocess.py:553)",
)
def w6_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    rev = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    return rev.withColumn("rn", F.row_number().over(w).cast("long"))


# --- O1/O2: order by + limit --------------------------------------------------------------

@register(
    "o1_order_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    description="Global sort + limit with deterministic tie-break (O1, O2)",
)
def o1_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


# --- U1/U2: set operations ------------------------------------------------------------------

@register(
    "u_set_ops",
    oracle="""
    WITH buyers AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders),
    building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
    rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    SELECT c_custkey, 'in_union' AS which
    FROM (SELECT * FROM building UNION SELECT * FROM rich)
    UNION ALL
    SELECT c_custkey, 'both' AS which
    FROM (SELECT * FROM building INTERSECT SELECT * FROM buyers)
    UNION ALL
    SELECT c_custkey, 'building_only' AS which
    FROM (SELECT * FROM building EXCEPT SELECT * FROM buyers)
    """,
    description="Set-operation family in one tagged output: unionByName + "
    "distinct (U1; positional-union footgun avoided), INTERSECT and "
    "EXCEPT (U2)",
)
def u_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    buyers = orders.select(F.col("o_custkey").alias("c_custkey")).distinct()
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    union = building.unionByName(rich).distinct().withColumn("which", F.lit("in_union"))
    both = building.intersect(buyers).withColumn("which", F.lit("both"))
    only = building.exceptAll(buyers).distinct().withColumn("which", F.lit("building_only"))
    return union.unionByName(both).unionByName(only)


# --- R4: temporal split ------------------------------------------------------------------------

@register(
    "r4_temporal_split",
    oracle="""
    SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 'train' ELSE 'test' END AS split,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total
    FROM orders GROUP BY 1
    """,
    description="Temporal train/test split on a date literal (R4, preprocess.py:511-517)",
)
def r4_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    split = F.when(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"), "train"
    ).otherwise("test")
    return (
        orders.withColumn("split", split)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
    )


# --- P6/P8: IN-list filter + conditional bucketing in one pass -----------------------------------

@register(
    "p_filter_bucket",
    oracle="""
    SELECT o_orderpriority,
      CASE WHEN o_totalprice < 50000 THEN 'low'
           WHEN o_totalprice < 150000 THEN 'mid'
           ELSE 'high' END AS price_band,
      COUNT(*) AS n
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderstatus <> 'P'
    GROUP BY 1, 2
    """,
    description="IN-list + composed predicates (P5, P6) feeding when/otherwise "
    "conditional bucketing (P8), one scan",
)
def p_filter_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    band = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return (
        orders.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_orderstatus") != "P")
        )
        .withColumn("price_band", band)
        .groupBy("o_orderpriority", "price_band")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- P11: dedup via distinct ----------------------------------------------------------------------

@register(
    "p11_distinct",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
    description="distinct() projection dedup (P11)",
)
def p11_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "customer", sf_dir).select("c_nationkey", "c_mktsegment").distinct()


# --- S9: generated dimension grid ⋈ facts -----------------------------------------------------------
# The reference's date×hour generator (preprocess.py:226-236) re-expressed with
# sequence/explode instead of a driver loop.

@register(
    "s9_generated_grid",
    oracle="""
    WITH grid AS (
      SELECT CAST(d AS DATE) AS day, h AS hour
      FROM (SELECT UNNEST(generate_series(DATE '2024-01-01', DATE '2024-01-30', INTERVAL 1 DAY)) AS d)
      CROSS JOIN (SELECT UNNEST(range(0, 24)) AS h)
    ),
    hourly AS (
      SELECT CAST(ts AS DATE) AS day, EXTRACT(hour FROM ts) AS hour, COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT g.day, CAST(g.hour AS BIGINT) AS hour,
           CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events
    FROM grid g LEFT JOIN hourly h ON g.day = h.day AND g.hour = h.hour
    """,
    description="Generated date×hour dim grid outer-joined to facts (S9, J5/J6)",
)
def s9_generated_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"),
                F.lit("2024-01-30").cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )
    hours = spark.range(0, 24).select(F.col("id").cast("long").alias("hour"))
    grid = days.crossJoin(hours)
    hourly = events.groupBy(
        F.col("ts").cast("date").alias("day"),
        F.hour("ts").cast("long").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        grid.join(hourly, ["day", "hour"], "left")
        .na.fill(0, ["n_events"])
        .select("day", "hour", F.col("n_events").cast("long").alias("n_events"))
    )


# --- scalar functions: JSON/regexp extraction (S-family scalar surface) -----------------------------

@register(
    "f_regexp_json_extract",
    oracle="""
    SELECT event_type,
      CAST(SUM(CAST(CAST(regexp_extract(props, '"k":\\s*([0-9]+)', 1) AS BIGINT) AS DECIMAL(38,6))) AS DOUBLE)
        AS sum_k,
      COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    description="Regexp field extraction from JSON-ish props + agg (scalar F surface)",
)
def f_regexp_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    k = F.regexp_extract("props", r'"k":\s*([0-9]+)', 1).cast("long")
    return events.groupBy("event_type").agg(
        F.sum(k.cast("decimal(38,6)")).cast("double").alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )
