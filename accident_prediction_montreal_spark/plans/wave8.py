"""Wave-8 queries (r7): regex sequence mining over ordered event
strings, seeded Poisson-bootstrap uncertainty, and funnel
time-to-convert — the remaining sequence/statistics diagnostics.
All value-oracle-backed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.mixing import (
    lcg_uniform,
    lcg_uniform_sql,
)
from accident_prediction_montreal_spark.plans.registry import register
from accident_prediction_montreal_spark.sources.registry import load_table

_SEQ_PATTERN = "vc*p"  # view, any clicks, purchase — greedy, both engines


@register(
    "w11_regex_sequence",
    oracle=f"""
    WITH seqs AS (
      SELECT user_id,
        string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(len(seq) AS BIGINT) AS seq_len,
      CAST(len(regexp_extract_all(seq, '{_SEQ_PATTERN}')) AS BIGINT) AS n_matches
    FROM seqs ORDER BY user_id
    """,
    description="Regex sequence mining (W/A-surface, the MATCH_RECOGNIZE "
    "quantifier complement to a31's strict adjacency): each user's "
    "event-type initials concatenated in (ts, event_id) order into one "
    "string, then non-overlapping 'vc*p' matches counted — view, any "
    "number of clicks, purchase, with the Kleene star a31's fixed-lag "
    "leads cannot express. One user-keyed aggregate builds the ordered "
    "string (array_sort over (ts, event_id, initial) structs — "
    "deterministic total order, no window sort); the regex runs per "
    "user string, JVM-side. Both engines' regex dialects agree on this "
    "backreference-free pattern. Per-user strings are bounded by "
    "per-user activity, not corpus size.",
)
def w11_regex_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    rows = ev.select(
        "user_id",
        F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c")).alias(
            "r"
        ),
    )
    seq = F.concat_ws(
        "", F.transform(F.array_sort(F.collect_list("r")), lambda x: x["c"])
    )
    return (
        rows.groupBy("user_id")
        .agg(seq.alias("seq"))
        .select(
            "user_id",
            F.length("seq").cast("long").alias("seq_len"),
            F.size(F.regexp_extract_all("seq", F.lit(_SEQ_PATTERN), 0)).cast("long")
            .alias("n_matches"),
        )
        .orderBy("user_id")
    )


_B = 32  # bootstrap replicates
# Poisson(1) inverse-CDF thresholds (cumulative e^-1 * sum 1/k!),
# written as literals so both engines compare against identical doubles.
_POIS_CDF = [
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
]


def _pois_case_sql(u: str) -> str:
    cases = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"CASE {cases} ELSE 5 END"


@register(
    "m17_bootstrap_ci",
    oracle=f"""
    WITH reps AS (SELECT UNNEST(range(0, {_B})) AS replicate),
    weighted AS (
      SELECT r.replicate,
        {_pois_case_sql(lcg_uniform_sql("e.event_id * " + str(_B) + " + r.replicate", salt=13))}
          AS w,
        CAST(round(e.value * 100) AS BIGINT) AS cents
      FROM events e CROSS JOIN reps r
    )
    SELECT replicate,
      CAST(SUM(w) AS BIGINT) AS n_eff,
      ROUND(SUM(w * cents) / (100.0 * SUM(w)), 6) AS boot_mean
    FROM weighted GROUP BY replicate ORDER BY replicate
    """,
    description=f"Seeded POISSON BOOTSTRAP (M-surface uncertainty "
    f"quantification): {_B} bootstrap replicates of the global mean in "
    "ONE pass — each row draws a Poisson(1) weight per replicate from "
    "the engine-portable LCG (inverse-CDF case ladder over literal "
    "thresholds, so the oracle replays every weight exactly), and the "
    "per-replicate weighted means come out of a single "
    "map-side-combined aggregate whose shuffle carries B rows per "
    "partition. This is THE scalable bootstrap: resampling 100 TB by "
    "index is impossible, but Poissonized weights stream. Means are "
    "computed over integer cents (exact, order-independent) and "
    f"divided once at the end. The spread of the {_B} replicate means "
    "IS the standard-error estimate; the query releases the replicate "
    "table so any CI flavor can be taken downstream.",
)
def m17_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    rep = ev.select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.explode(F.sequence(F.lit(0), F.lit(_B - 1))).alias("replicate"),
    )
    u = lcg_uniform(F.col("event_id") * _B + F.col("replicate"), salt=13)
    w = F.lit(5)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < _POIS_CDF[k], k).otherwise(w)
    return (
        rep.select("replicate", w.alias("w"), "cents")
        .groupBy("replicate")
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            # try_divide: a replicate whose every Poisson weight drew 0
            # has SUM(w)=0 — plain `/` is an ANSI DIVIDE_BY_ZERO error,
            # DuckDB returns NULL (r14 events-table fuzz find on a
            # 1-row corpus; vanishingly rare at fixture size, certain
            # somewhere at fuzz size)
            F.round(
                F.try_divide(
                    F.sum(F.col("w") * F.col("cents")), 100.0 * F.sum("w")
                ),
                6,
            ).alias("boot_mean"),
        )
        .orderBy("replicate")
    )


@register(
    "a34_funnel_timing",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_completed,
      CAST(SUM(epoch_us(t2) - epoch_us(t1)) AS BIGINT) AS view_to_click_us,
      CAST(SUM(epoch_us(t3) - epoch_us(t2)) AS BIGINT) AS click_to_purchase_us
    FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)
    """,
    description="Funnel TIME-TO-CONVERT (A-surface, the duration "
    "complement to a12's stage counts): first view, first click after "
    "it, first purchase after that — three chained min-ts aggregates, "
    "each a user-keyed groupBy broadcast back onto the next stage's "
    "filter, all sharing one user_id partitioning. Total stage "
    "durations in exact integer microseconds (no float time math), "
    "summed only over users completing the whole funnel. The chained-"
    "min formulation never materializes per-user event lists and "
    "never window-sorts the raw stream.",
)
def a34_funnel_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(s1), "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(s2), "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    from accident_prediction_montreal_spark.sources.registry import epoch_us

    # event time is TIMESTAMP_NTZ engine-wide; epoch_us is the
    # NTZ-safe micros accessor (unix_micros rejects NTZ)
    us = lambda c: epoch_us(F.col(c), "timestamp_ntz")  # noqa: E731
    return (
        s1.join(s2, "user_id")
        .join(s3, "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_completed"),
            F.sum(us("t2") - us("t1")).cast("long").alias("view_to_click_us"),
            F.sum(us("t3") - us("t2")).cast("long").alias("click_to_purchase_us"),
        )
    )


_QUANTS = [0.25, 0.5, 0.75, 0.95]


@register(
    "a35_grouped_quantiles",
    oracle=f"""
    SELECT event_type,
      CAST(COUNT(*) AS BIGINT) AS n,
      {", ".join(f"ROUND(quantile_cont(value, {q}), 6) AS p{int(q * 100)}" for q in _QUANTS)}
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    description="Grouped EXACT quantile summary (A-surface statistics "
    "family): p25/p50/p75/p95 of value per event_type via the exact "
    "interpolating percentile aggregate — verified bit-compatible with "
    "DuckDB's quantile_cont (both type-7 linear interpolation; the "
    "oracle is a value check, not a tolerance). One aggregate, one "
    "shuffle keyed by the (small) group domain. The exact form is the "
    "oracle-grade twin of the approx_percentile invariant query: use "
    "this when the group cardinality is bounded, the sketch when it "
    "is not.",
)
def a35_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    arr = "array(" + ", ".join(f"{q}D" for q in _QUANTS) + ")"
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr(f"percentile(value, {arr})").alias("__qs"),
        )
        .select(
            "event_type",
            "n",
            *[
                F.round(F.element_at("__qs", i + 1), 6).alias(f"p{int(q * 100)}")
                for i, q in enumerate(_QUANTS)
            ],
        )
        .orderBy("event_type")
    )


@register(
    "a36_cusum_changepoint",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS DOUBLE) AS cnt
      FROM events GROUP BY 1
    ),
    mu AS (SELECT AVG(cnt) AS mu FROM hourly),
    cusum AS (
      SELECT h, SUM(cnt - mu) OVER (ORDER BY h
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      FROM hourly CROSS JOIN mu
    )
    SELECT h AS peak_hour, ROUND(s, 6) AS peak_s,
      CAST((SELECT COUNT(*) FROM hourly) AS BIGINT) AS n_hours
    FROM cusum ORDER BY ROUND(abs(s), 6) DESC, h LIMIT 1
    """,
    description="CUSUM changepoint detection (A-surface time-series "
    "family, beside autocorrelation/seasonal anomalies): cumulative "
    "sum of hourly-count deviations from the global mean, peak |S_t| "
    "locates the level shift. Same reduce-then-window shape as "
    "a30_autocorr — the aggregate collapses the data to one row per "
    "hour BEFORE the global-order cumulative window, so the single-"
    "partition stage is bounded by the time span, never the data "
    "volume; the mean is a 1-row broadcast. Rounded-|S| ordering with "
    "an hour tie-break pins the argmax deterministically.",
)
def a36_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    from pyspark.sql import Window as W

    # mu and n_hours as UNBOUNDED windows over the same 720-row series
    # the cumulative window already sorts: separate 1-row aggregates
    # would make `hourly` a 3-consumer frame and replay the scan +
    # aggregate per branch (measured 3 hash exchanges); this form has
    # exactly one.
    whole = W.partitionBy()
    w = W.orderBy("h").rowsBetween(W.unboundedPreceding, W.currentRow)
    cusum = hourly.select(
        "h",
        F.sum(F.col("cnt") - F.avg("cnt").over(whole)).over(w).alias("s"),
        F.count(F.lit(1)).over(whole).cast("long").alias("n_hours"),
    )
    return (
        cusum.select(
            F.col("h").alias("peak_hour"),
            F.round("s", 6).alias("peak_s"),
            "n_hours",
        )
        .orderBy(F.round(F.abs(F.col("peak_s")), 6).desc(), "peak_hour")
        .limit(1)
    )
