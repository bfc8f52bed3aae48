"""Composite-operator inventory (SURVEY.md §2 J8, A6, A7, W4, M8, M9 + §2.9
composites) as oracle-checked queries.

The testdata has no coordinates, so geo queries derive deterministic
pseudo-coordinates from integer keys — the SAME closed-form formula in the
Spark plan and the DuckDB oracle, so both engines see identical inputs.
All trig outputs are rounded to 6 decimals (meters to 3), far coarser than
cross-engine libm drift (SURVEY.md §7.4 float-parity note).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.functions.cyclic import cyclic_encode
from accident_prediction_montreal_spark.functions.geo import haversine_meters
from accident_prediction_montreal_spark.functions.solar import solar_elevation
from accident_prediction_montreal_spark.operators.encoding import target_encode
from accident_prediction_montreal_spark.operators.metrics import (
    count_rate_model,
    threshold_sweep,
)
from accident_prediction_montreal_spark.operators.spatial import (
    idw_interpolate,
    idw_interpolate_radius,
    knn_join,
    knn_join_grid,
    knn_join_grid_exact,
)
from accident_prediction_montreal_spark.operators.windows import exp_weighted_moving_average
from accident_prediction_montreal_spark.plans.registry import register
from accident_prediction_montreal_spark.sources.registry import load_table

# Derived pseudo-coordinates (identical formulas on both sides).
CUST_LAT = "45.4 + (c_custkey % 997) / 3000.0"
CUST_LON = "-73.9 + (c_custkey % 1009) / 3000.0"
SUPP_LAT = "45.4 + (s_suppkey % 89) / 300.0"
SUPP_LON = "-73.9 + (s_suppkey % 97) / 300.0"


def _customers_with_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        (F.lit(45.4) + (F.col("c_custkey") % 997) / 3000.0).alias("lat"),
        (F.lit(-73.9) + (F.col("c_custkey") % 1009) / 3000.0).alias("lon"),
    )


def _suppliers_with_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, "supplier", sf_dir).select(
        "s_suppkey",
        "s_acctbal",
        (F.lit(45.4) + (F.col("s_suppkey") % 89) / 300.0).alias("rlat"),
        (F.lit(-73.9) + (F.col("s_suppkey") % 97) / 300.0).alias("rlon"),
    )


def _haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """DuckDB expression mirroring functions/geo.py::haversine_meters term-for-term."""
    return f"""(2.0 * 6371000.0) * atan2(
      sqrt(
        pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)
        + cos(radians({lat1})) * cos(radians({lat2}))
          * pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)
      ),
      sqrt(1 - (
        pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)
        + cos(radians({lat1})) * cos(radians({lat2}))
          * pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)
      ))
    )"""


# --- composite haversine (§2.9) ----------------------------------------------

@register(
    "geo_haversine",
    oracle=f"""
    SELECT c_custkey,
      ROUND({_haversine_sql(CUST_LAT, CUST_LON, "45.5", "-73.6")}, 3) AS dist_m
    FROM customer
    """,
    description="Haversine distance expression factory (§2.9, road_network.py:311-324)",
)
def geo_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _customers_with_coords(spark, sf_dir)
    return cust.select(
        "c_custkey",
        F.round(haversine_meters("lat", "lon", F.lit(45.5), F.lit(-73.6)), 3).alias("dist_m"),
    )


# --- J8: spatial kNN join (reference + grid-bucketed scale path) --------------

_KNN_ORACLE = f"""
    WITH samples AS (
      SELECT c_custkey, {CUST_LAT} AS lat, {CUST_LON} AS lon
      FROM customer WHERE c_custkey % 10 = 0
    ),
    sites AS (
      SELECT s_suppkey, {SUPP_LAT} AS rlat, {SUPP_LON} AS rlon FROM supplier
    ),
    pairs AS (
      SELECT c_custkey, s_suppkey,
        {_haversine_sql("lat", "lon", "rlat", "rlon")} AS distance_m
      FROM samples CROSS JOIN sites
    )
    SELECT c_custkey, s_suppkey, ROUND(distance_m, 3) AS distance_m,
           CAST(knn_rank AS BIGINT) AS knn_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY c_custkey ORDER BY distance_m ASC, s_suppkey ASC) AS knn_rank
      FROM pairs
    ) WHERE knn_rank <= 3
    """


def _knn_inputs(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    left = _customers_with_coords(spark, sf_dir).filter(F.col("c_custkey") % 10 == 0)
    right = _suppliers_with_coords(spark, sf_dir).drop("s_acctbal")
    return left, right


@register(
    "j8_knn_join",
    oracle=_KNN_ORACLE,
    description="Spatial kNN join, reference form: crossJoin + haversine + window top-k "
    "(J8, preprocess.py:59-223)",
)
def j8_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _knn_inputs(spark, sf_dir)
    out = knn_join(left, right, k=3, left_id="c_custkey", right_id="s_suppkey")
    return out.select(
        "c_custkey",
        "s_suppkey",
        F.round("distance_m", 3).alias("distance_m"),
        F.col("knn_rank").cast("long").alias("knn_rank"),
    )


@register(
    "j8_knn_join_grid",
    oracle=_KNN_ORACLE,
    description="Spatial kNN join, grid-bucketed scale path (SURVEY.md §4): "
    "density-estimated cells + per-point exactness proof + escalation "
    "(knn_join_grid_exact), so results are guaranteed identical to the "
    "exhaustive j8_knn_join at ANY scale — the earlier fixed 0.5° cell "
    "covered the whole 0.34° data spread and went quadratic at 10x data.",
)
def j8_knn_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    left, right = _knn_inputs(spark, sf_dir)
    out = knn_join_grid_exact(left, right, k=3, left_id="c_custkey", right_id="s_suppkey")
    return out.select(
        "c_custkey",
        "s_suppkey",
        F.round("distance_m", 3).alias("distance_m"),
        F.col("knn_rank").cast("long").alias("knn_rank"),
    )


# --- J8 at the antimeridian + pole: the exactness guarantees under fire -------

# Seam-straddling polar fixture: samples at lat ~86.5-86.8 around lon
# ±180 (raw lon > 180 wraps to the negative side), stations spread up to
# ~88 N. At 86.5 N a longitude degree is only ~6.8 km, so nearest
# neighbors are dominated by latitude and roughly half the true NN pairs
# CROSS the seam — a grid that does not handle the wrap proves the wrong
# answer, and degenerate polar lon-cells stress the cos clamp
# (spatial.py seam_safe + worst_cos guards, both r5 fixes).
SEAM_LAT = "86.5 + (c_custkey % 997) / 3000.0"
SEAM_LON_RAW = "179.9 + (c_custkey % 1009) / 3000.0"
SEAM_RLAT = "86.5 + (s_suppkey % 89) / 60.0"
SEAM_RLON_RAW = "179.9 + (s_suppkey % 97) / 300.0"


def _wrap_sql(raw: str) -> str:
    return f"CASE WHEN ({raw}) > 180.0 THEN ({raw}) - 360.0 ELSE ({raw}) END"


def _wrap_col(raw):
    return F.when(raw > 180.0, raw - 360.0).otherwise(raw)


@register(
    "j8_knn_seam_polar",
    oracle=f"""
    WITH samples AS (
      SELECT c_custkey, {SEAM_LAT} AS lat, {_wrap_sql(SEAM_LON_RAW)} AS lon
      FROM customer WHERE c_custkey % 10 = 0
    ),
    sites AS (
      SELECT s_suppkey, {SEAM_RLAT} AS rlat, {_wrap_sql(SEAM_RLON_RAW)} AS rlon
      FROM supplier
    ),
    pairs AS (
      SELECT c_custkey, s_suppkey,
        {_haversine_sql("lat", "lon", "rlat", "rlon")} AS distance_m
      FROM samples CROSS JOIN sites
    )
    SELECT c_custkey, s_suppkey, ROUND(distance_m, 3) AS distance_m,
           CAST(knn_rank AS BIGINT) AS knn_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY c_custkey ORDER BY distance_m ASC, s_suppkey ASC) AS knn_rank
      FROM pairs
    ) WHERE knn_rank <= 3
    """,
    description="Spatial kNN join over an ANTIMERIDIAN-straddling polar "
    "fixture (samples ~86.5N at lon ±180, stations up to ~88N on both "
    "sides of the seam): the oracle is the exhaustive cross join, whose "
    "haversine is wrap-correct by construction (sin² of half-angles), so "
    "its true nearest neighbors routinely CROSS lon ±180 — a grid path "
    "that prunes by non-wrapping lon cells, or trusts cos(lat) bounds in "
    "degenerate polar cells, proves the wrong neighbor and hash-"
    "mismatches. Exercises knn_join_grid_exact's seam_safe refusal + "
    "polar cos clamp (spatial.py): every seam-adjacent point escalates "
    "to the exhaustive fallback, trading speed for guaranteed exactness "
    "on exactly the rows where the grid bound cannot prove it.",
)
def j8_knn_seam_polar(spark: SparkSession, sf_dir: str) -> DataFrame:
    left = load_table(spark, "customer", sf_dir).filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        (F.lit(86.5) + (F.col("c_custkey") % 997) / 3000.0).alias("lat"),
        _wrap_col(F.lit(179.9) + (F.col("c_custkey") % 1009) / 3000.0).alias("lon"),
    )
    right = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey",
        (F.lit(86.5) + (F.col("s_suppkey") % 89) / 60.0).alias("rlat"),
        _wrap_col(F.lit(179.9) + (F.col("s_suppkey") % 97) / 300.0).alias("rlon"),
    )
    out = knn_join_grid_exact(left, right, k=3, left_id="c_custkey", right_id="s_suppkey")
    return out.select(
        "c_custkey",
        "s_suppkey",
        F.round("distance_m", 3).alias("distance_m"),
        F.col("knn_rank").cast("long").alias("knn_rank"),
    )


# --- A6: IDW interpolation ------------------------------------------------------

@register(
    "a6_idw_interpolation",
    oracle=f"""
    WITH samples AS (
      SELECT c_custkey, {CUST_LAT} AS lat, {CUST_LON} AS lon FROM customer
    ),
    stations AS (
      SELECT s_suppkey, s_acctbal, {SUPP_LAT} AS slat, {SUPP_LON} AS slon FROM supplier
    ),
    pairs AS (
      SELECT c_custkey, s_acctbal,
        1.0 / pow({_haversine_sql("lat", "lon", "slat", "slon")}, 2.0) AS w
      FROM samples CROSS JOIN stations
    )
    SELECT c_custkey,
      ROUND(
        SUM(CASE WHEN NOT isnan(s_acctbal) AND s_acctbal IS NOT NULL THEN w * s_acctbal ELSE 0.0 END)
        / SUM(CASE WHEN NOT isnan(s_acctbal) AND s_acctbal IS NOT NULL THEN w ELSE 0.0 END),
      6) AS acctbal_idw
    FROM pairs GROUP BY c_custkey
    """,
    description="Inverse-distance-weighted interpolation, NaN-masked "
    "(A6, preprocess.py:360-398)",
)
def a6_idw_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    samples = _customers_with_coords(spark, sf_dir)
    stations = _suppliers_with_coords(spark, sf_dir).select(
        "s_suppkey",
        F.col("s_acctbal").alias("acctbal_idw"),
        F.col("rlat").alias("station_lat"),
        F.col("rlon").alias("station_lon"),
    )
    out = idw_interpolate(
        samples,
        stations,
        value_cols=["acctbal_idw"],
        sample_id="c_custkey",
        sample_coords=("lat", "lon"),
        station_coords=("station_lat", "station_lon"),
        power=2.0,
    )
    return out.select("c_custkey", F.round("acctbal_idw", 6).alias("acctbal_idw"))


@register(
    "a6_idw_radius",
    oracle=f"""
    WITH samples AS (
      SELECT c_custkey, {CUST_LAT} AS lat, {CUST_LON} AS lon FROM customer
    ),
    stations AS (
      SELECT s_suppkey, s_acctbal, {SUPP_LAT} AS slat, {SUPP_LON} AS slon FROM supplier
    ),
    pairs AS (
      SELECT c_custkey, s_acctbal, d,
        1.0 / pow(d, 2.0) AS w
      FROM (
        SELECT c_custkey, s_acctbal,
          {_haversine_sql("lat", "lon", "slat", "slon")} AS d
        FROM samples CROSS JOIN stations
      ) WHERE d <= 2000.0
    )
    SELECT c_custkey,
      ROUND(
        SUM(CASE WHEN NOT isnan(s_acctbal) AND s_acctbal IS NOT NULL THEN w * s_acctbal ELSE 0.0 END)
        / SUM(CASE WHEN NOT isnan(s_acctbal) AND s_acctbal IS NOT NULL THEN w ELSE 0.0 END),
      6) AS acctbal_idw
    FROM pairs GROUP BY c_custkey
    """,
    description="Radius-truncated IDW, the A6 scale path: full IDW is "
    "samples x stations by definition, so at scale only stations within a "
    "2 km search radius contribute — implemented as the same 3x3 spatial "
    "grid equi-join as the kNN scale path (cells sized to cover the "
    "radius, exact haversine refilter, identical NaN-masked aggregation), "
    "so per-sample cost is bounded by station density inside the radius, "
    "not by table size. The oracle applies the same radius cut to the "
    "exhaustive cross join: any station wrongly included/excluded by the "
    "grid hash-mismatches.",
)
def a6_idw_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    samples = _customers_with_coords(spark, sf_dir)
    stations = _suppliers_with_coords(spark, sf_dir).select(
        "s_suppkey",
        F.col("s_acctbal").alias("acctbal_idw"),
        F.col("rlat").alias("station_lat"),
        F.col("rlon").alias("station_lon"),
    )
    out = idw_interpolate_radius(
        samples,
        stations,
        value_cols=["acctbal_idw"],
        radius_m=2000.0,
        sample_id="c_custkey",
        sample_coords=("lat", "lon"),
        station_coords=("station_lat", "station_lon"),
        power=2.0,
    )
    return out.select("c_custkey", F.round("acctbal_idw", 6).alias("acctbal_idw"))


# --- W4: stacked-lag EWMA ----------------------------------------------------------

_EWMA_WINDOW = 12
_EWMA_RATE = 0.5


def _ewma_oracle() -> str:
    offsets = range(-(_EWMA_WINDOW - 1), 1)
    raw = [math.exp(_EWMA_RATE * t) for t in offsets]
    norm = sum(raw)
    # Explicit DOUBLE casts: DuckDB parses bare float literals as DECIMAL,
    # which would silently turn the whole sum into decimal arithmetic.
    terms = " + ".join(
        f"COALESCE(LAG(risky, {-t}) OVER w * CAST({wt / norm!r} AS DOUBLE), CAST(0.0 AS DOUBLE))"
        for t, wt in zip(offsets, raw)
    )
    return f"""
    SELECT user_id, event_id, ROUND({terms}, 6) AS risky_ewma
    FROM (
      SELECT user_id, event_id, ts,
             CASE WHEN value > 100 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS risky
      FROM events
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@register(
    "w4_ewma",
    oracle=_ewma_oracle(),
    description="Exponentially-weighted moving average via stacked lag windows "
    "(W4, weather.py:228-244; ordered by (ts, event_id) per §7.4)",
)
def w4_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    risky = events.withColumn(
        "risky", F.when(F.col("value") > 100, 1.0).otherwise(0.0)
    )
    ewma = exp_weighted_moving_average(
        "risky",
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        window_size=_EWMA_WINDOW,
        rate=_EWMA_RATE,
    )
    return risky.select("user_id", "event_id", F.round(ewma, 6).alias("risky_ewma"))


# --- §2.9 composites: cyclic + solar features ------------------------------------------

_TWO_PI_24 = 2.0 * math.pi / 24.0


@register(
    "f_cyclic_encode",
    oracle=f"""
    SELECT DISTINCT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
      ROUND(cos(EXTRACT(hour FROM ts) * {_TWO_PI_24!r}), 6) + 0.0 AS hour_cos,
      ROUND(sin(EXTRACT(hour FROM ts) * {_TWO_PI_24!r}), 6) + 0.0 AS hour_sin
    FROM events
    """,
    description="Cyclic (cos, sin) feature encoding (§2.9, preprocess.py:401-419)",
)
def f_cyclic_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    hour = F.hour("ts")
    cos_c, sin_c = cyclic_encode(hour, 24.0)
    return events.select(
        hour.cast("long").alias("hour"),
        # + 0.0 folds IEEE −0.0 into +0.0 (cross-engine repr parity).
        (F.round(cos_c, 6) + 0.0).alias("hour_cos"),
        (F.round(sin_c, 6) + 0.0).alias("hour_sin"),
    ).distinct()


def _solar_oracle() -> str:
    two_pi_365 = 2.0 * math.pi / 365.0
    # DST offset (post-2007 rule): DuckDB dayofweek is Sunday=0, so the
    # first Sunday on/after a date d is d + (7 - dayofweek(d)) % 7 days.
    y = "EXTRACT(year FROM o_orderdate)"
    mar8 = f"make_date(CAST({y} AS INT), 3, 8)"
    nov1 = f"make_date(CAST({y} AS INT), 11, 1)"
    dst_start = (
        f"(CAST({mar8} + to_days(CAST((7 - dayofweek({mar8})) % 7 AS INT)) AS TIMESTAMP)"
        f" + INTERVAL 2 HOUR)"
    )
    dst_end = (
        f"(CAST({nov1} + to_days(CAST((7 - dayofweek({nov1})) % 7 AS INT)) AS TIMESTAMP)"
        f" + INTERVAL 2 HOUR)"
    )
    off = (
        f"(CASE WHEN o_orderdate > {dst_start} AND o_orderdate < {dst_end} "
        f"THEN CAST(-4.0 AS DOUBLE) ELSE CAST(-5.0 AS DOUBLE) END)"
    )
    doy = "dayofyear(o_orderdate)"
    decl = f"radians(-23.45 * cos({two_pi_365!r} * ({doy} + 10)))"
    d = f"({two_pi_365!r} * {doy})"
    eot = f"(-7.655 * sin({d}) + 9.873 * sin({d} * 2 + 3.588))"
    tc = f"(4.0 * ((-73.554) - 15.0 * {off}) + {eot})"
    lsh = f"((o_orderkey % 24) + 0.5 + {tc} / 60.0)"
    ha = f"(0.2618 * ({lsh} - 12.0))"
    elev = (
        f"degrees(asin(sin({decl}) * sin(radians(45.5078)) "
        f"+ cos({decl}) * cos(radians(45.5078)) * cos({ha})))"
    )
    return (
        f"SELECT o_orderkey, {off} AS utc_offset, "
        f"ROUND({elev}, 6) + 0.0 AS solar_elev FROM orders"
    )


@register(
    "f_solar_elevation",
    oracle=_solar_oracle(),
    description="Solar-elevation geometry pipeline with DST-aware local-time "
    "offset (§2.9, solar_features.py:6-79): eastern_utc_offset_hours derives "
    "the −4/−5 UTC offset from the post-2007 DST rule instead of the "
    "reference's hardcoded per-year chain, and feeds the hour-angle chain.",
)
def f_solar_elevation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accident_prediction_montreal_spark.functions.solar import (
        eastern_utc_offset_hours,
    )

    orders = load_table(spark, "orders", sf_dir)
    offset = eastern_utc_offset_hours("o_orderdate")
    elev = solar_elevation(
        date="o_orderdate",
        hour=F.col("o_orderkey") % 24,
        lat=F.lit(45.5078),
        lon=F.lit(-73.554),
        utc_offset_hours=offset,
    )
    return orders.select(
        "o_orderkey",
        offset.alias("utc_offset"),
        (F.round(elev, 6) + 0.0).alias("solar_elev"),
    )


# --- M8: single-pass threshold sweep ------------------------------------------------------

_SWEEP_N = 20

_SWEEP_ORACLE = f"""
    WITH scored AS (
      SELECT ((o_orderkey * 2654435761) % 1001) / 1000.0 AS prob,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
      FROM orders
    ),
    hist AS (
      SELECT label, CAST(floor(prob * {_SWEEP_N}) AS INT) AS id_bucket, COUNT(*) AS cnt
      FROM scored GROUP BY 1, 2
    ),
    grid AS (
      SELECT CAST(b AS INT) AS id_bucket, l AS label
      FROM (SELECT UNNEST(range(-1, {_SWEEP_N} + 1)) AS b)
      CROSS JOIN (VALUES (0), (1)) t(l)
    ),
    filled AS (
      SELECT COALESCE(g.id_bucket, h.id_bucket) AS id_bucket,
             COALESCE(g.label, h.label) AS label,
             COALESCE(h.cnt, 0) AS cnt
      FROM grid g FULL OUTER JOIN hist h
        ON g.id_bucket = h.id_bucket AND g.label = h.label
    ),
    cum AS (
      SELECT id_bucket, label,
        SUM(cnt) OVER (PARTITION BY label ORDER BY id_bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_below,
        COALESCE(SUM(cnt) OVER (PARTITION BY label ORDER BY id_bucket
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS n_above
      FROM filled
    ),
    piv AS (
      -- COALESCE 0 mirrors Spark's pivot([0,1]) + fill(0) zero-fill of a
      -- missing label slot (reference random_forest.py:176-184 na.fill);
      -- the grid spans -1..n inclusive so both labels have cumulative
      -- rows even at the prob=1.0 bucket.
      SELECT (id_bucket + 1) / {_SWEEP_N}.0 AS threshold,
        CAST(COALESCE(SUM(CASE WHEN label = 0 THEN n_below END), 0) AS BIGINT) AS true_negative,
        CAST(COALESCE(SUM(CASE WHEN label = 0 THEN n_above END), 0) AS BIGINT) AS false_positive,
        CAST(COALESCE(SUM(CASE WHEN label = 1 THEN n_below END), 0) AS BIGINT) AS false_negative,
        CAST(COALESCE(SUM(CASE WHEN label = 1 THEN n_above END), 0) AS BIGINT) AS true_positive
      FROM cum GROUP BY id_bucket
    )
    SELECT threshold, true_negative, false_positive, false_negative, true_positive,
      ROUND(CASE WHEN true_positive + false_positive <> 0
            THEN true_positive / CAST(true_positive + false_positive AS DOUBLE) END, 6)
        AS precision,
      ROUND(CASE WHEN true_positive <> 0
            THEN true_positive / CAST(true_positive + false_negative AS DOUBLE)
            ELSE 0.0 END, 6) AS recall,
      ROUND(CASE WHEN false_positive + true_negative <> 0
            THEN false_positive / CAST(false_positive + true_negative AS DOUBLE) END, 6)
        AS false_positive_rate,
      ROUND((true_positive + true_negative)
            / CAST(true_positive + true_negative + false_positive + false_negative AS DOUBLE), 6)
        AS accuracy
    FROM piv
    """


@register(
    "m8_threshold_sweep",
    oracle=_SWEEP_ORACLE,
    description="Single-pass threshold-dependent metrics: histogram + grid OUTER join "
    "+ cumulative windows + pivot (M8, random_forest.py:136-221). The prob "
    "formula lands on exactly 1.0 for some rows, exercising the bucket-n "
    "path the reference's outer join preserves.",
)
def m8_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    scored = orders.select(
        (((F.col("o_orderkey") * 2654435761) % 1001) / 1000.0).alias("prob_positive"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
    )
    out = threshold_sweep(spark, scored, n_points=_SWEEP_N)
    return out.select(
        "threshold",
        F.col("true_negative").cast("long").alias("true_negative"),
        F.col("false_positive").cast("long").alias("false_positive"),
        F.col("false_negative").cast("long").alias("false_negative"),
        F.col("true_positive").cast("long").alias("true_positive"),
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        F.round("false_positive_rate", 6).alias("false_positive_rate"),
        F.round("accuracy", 6).alias("accuracy"),
    )


@register(
    "m_calibration_bins",
    oracle=f"""
    WITH scored AS (
      SELECT ((o_orderkey * 2654435761) % 1001) / 1000.0 AS prob,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
      FROM orders
    )
    SELECT CAST(LEAST(FLOOR(prob * 10), 9) AS INT) AS bin,
      CAST(COUNT(*) AS BIGINT) AS n,
      ROUND(CAST(SUM(CAST(prob AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6)
        AS mean_prob,
      ROUND(SUM(label) / CAST(COUNT(*) AS DOUBLE), 6) AS frac_pos
    FROM scored GROUP BY 1
    """,
    description="Calibration / reliability bins (ML-evaluation surface): decile "
    "buckets of predicted probability (top bucket closed at 1.0) with "
    "decimal-exact mean predicted prob vs empirical positive rate — one "
    "map-side-combined aggregation pass, the companion diagnostic to the "
    "M8 threshold sweep.",
)
def m_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    scored = orders.select(
        (((F.col("o_orderkey") * 2654435761) % 1001) / 1000.0).alias("prob"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("label"),
    )
    binned = scored.select(
        F.least(F.floor(F.col("prob") * 10), F.lit(9)).cast("int").alias("bin"),
        "prob",
        "label",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("prob").cast("decimal(38,6)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_prob"),
        F.round(F.sum("label") / F.count(F.lit(1)).cast("double"), 6).alias("frac_pos"),
    )


# --- M9: one-pass count-threshold baseline model ----------------------------------------------

@register(
    "m9_count_rate_model",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey, COUNT(*) AS cnt,
             MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS label
      FROM orders GROUP BY o_custkey
    ),
    hist AS (
      SELECT cnt AS threshold, COUNT(*) AS n_total, SUM(label) AS n_pos
      FROM per_cust GROUP BY cnt
    )
    SELECT CAST(threshold AS BIGINT) AS threshold,
      CAST(SUM(n_total) OVER w AS BIGINT) AS n_at_or_above,
      ROUND(CAST(SUM(n_pos) OVER w AS DOUBLE) / CAST(SUM(n_total) OVER w AS DOUBLE), 6)
        AS p_positive
    FROM hist
    WINDOW w AS (ORDER BY threshold ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    """,
    description="Empirical P(label | count ≥ t) in one pass: histogram + suffix window "
    "(M9 rewrite of main_train_base.py:25-51)",
)
def m9_count_rate_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("order_count"),
        F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("label"),
    )
    out = count_rate_model(per_cust, count_col="order_count", label_col="label")
    return out.select(
        F.col("threshold").cast("long").alias("threshold"),
        F.col("n_at_or_above").cast("long").alias("n_at_or_above"),
        F.round("p_positive", 6).alias("p_positive"),
    )


# --- A7: target / risk encoding -----------------------------------------------------------------

@register(
    "a7_target_encode",
    oracle="""
    WITH stats AS (
      SELECT COUNT(*) AS n_all,
             SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS n_pos
      FROM orders
    ),
    risk AS (
      SELECT o_orderpriority,
        SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
          / CAST((SELECT n_pos FROM stats) AS DOUBLE)
        - COUNT(*) / CAST((SELECT n_all FROM stats) AS DOUBLE) AS risk
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, ROUND(risk, 6) + 0.0 AS risk,
      CAST(ROW_NUMBER() OVER (ORDER BY risk DESC, o_orderpriority ASC) AS BIGINT)
        AS risk_index
    FROM risk
    """,
    description="Category risk = P(cat|pos) − P(cat|all) + ordinal index "
    "(A7, preprocess.py:531-556)",
)
def a7_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir).withColumn(
        "label", F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    )
    out = target_encode(orders, category_col="o_orderpriority", label_col="label")
    return out.select(
        "o_orderpriority",
        (F.round("risk", 6) + 0.0).alias("risk"),
        F.col("risk_index").cast("long").alias("risk_index"),
    )


# --- A6 radius IDW across the antimeridian (r6: wrapped lon cells) ------------

# MID-latitude seam fixture (~45.4 N, lon raw 179.9..180.24 wrapping to
# the negative side): cos(lat) ~ 0.70, so idw_interpolate_radius takes
# its GRID path (the polar fixture above would fall back to exhaustive
# and never exercise the wrap) — in-radius sample-station pairs
# routinely straddle lon ±180, and a non-wrapping cell_j would silently
# drop their weight from the interpolation sums.
IDW_SEAM_LAT = "45.4 + (c_custkey % 997) / 3000.0"
IDW_SEAM_LON_RAW = "179.9 + (c_custkey % 1009) / 3000.0"
IDW_SEAM_RLAT = "45.4 + (s_suppkey % 89) / 300.0"
IDW_SEAM_RLON_RAW = "179.9 + (s_suppkey % 97) / 300.0"


@register(
    "a6_idw_seam",
    oracle=f"""
    WITH samples AS (
      SELECT c_custkey, {IDW_SEAM_LAT} AS lat, {_wrap_sql(IDW_SEAM_LON_RAW)} AS lon
      FROM customer
    ),
    stations AS (
      SELECT s_suppkey, s_acctbal, {IDW_SEAM_RLAT} AS slat,
             {_wrap_sql(IDW_SEAM_RLON_RAW)} AS slon
      FROM supplier
    ),
    pairs AS (
      SELECT c_custkey, s_acctbal, d, 1.0 / pow(d, 2.0) AS w
      FROM (
        SELECT c_custkey, s_acctbal,
          {_haversine_sql("lat", "lon", "slat", "slon")} AS d
        FROM samples CROSS JOIN stations
      ) WHERE d <= 2000.0
    )
    SELECT c_custkey,
      ROUND(
        SUM(CASE WHEN NOT isnan(s_acctbal) AND s_acctbal IS NOT NULL THEN w * s_acctbal ELSE 0.0 END)
        / SUM(CASE WHEN NOT isnan(s_acctbal) AND s_acctbal IS NOT NULL THEN w ELSE 0.0 END),
      6) AS acctbal_idw
    FROM pairs GROUP BY c_custkey
    """,
    description="Radius-truncated IDW over an ANTIMERIDIAN-straddling "
    "mid-latitude fixture (r6): the oracle's exhaustive cross join is "
    "wrap-correct by construction, so stations within 2 km ACROSS lon "
    "±180 must contribute their weight — exercising the r6 modular "
    "lon-cell wrap in idw_interpolate_radius's grid path (cos ~0.70 "
    "here, so the polar fallback does NOT absorb the case; a "
    "non-wrapping grid loses the cross-seam stations and the weighted "
    "means hash-mismatch).",
)
def a6_idw_seam(spark: SparkSession, sf_dir: str) -> DataFrame:
    from accident_prediction_montreal_spark.operators.spatial import (
        idw_interpolate_radius,
    )

    samples = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        (F.lit(45.4) + (F.col("c_custkey") % 997) / 3000.0).alias("lat"),
        _wrap_col(F.lit(179.9) + (F.col("c_custkey") % 1009) / 3000.0).alias("lon"),
    )
    stations = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey",
        F.col("s_acctbal").alias("acctbal_idw"),
        (F.lit(45.4) + (F.col("s_suppkey") % 89) / 300.0).alias("station_lat"),
        _wrap_col(F.lit(179.9) + (F.col("s_suppkey") % 97) / 300.0).alias("station_lon"),
    )
    out = idw_interpolate_radius(
        samples,
        stations,
        value_cols=["acctbal_idw"],
        radius_m=2000.0,
        sample_id="c_custkey",
        sample_coords=("lat", "lon"),
        station_coords=("station_lat", "station_lon"),
        power=2.0,
    )
    return out.select("c_custkey", F.round("acctbal_idw", 6).alias("acctbal_idw"))
