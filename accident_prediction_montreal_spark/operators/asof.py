"""As-of (temporal) join — SURVEY.md §2 J9, absent from the reference
("events testdata enables adding range-join later"); a first-class
operator here because training pipelines constantly need
"latest state at or before event time" semantics.

Implementation is the sort-based union trick, not a range join:
  1. tag right rows 0 and left rows 1, union on (by, ts, tag, tie);
  2. one window per key carries the last non-null right payload forward
     (last_value IGNORE NULLS, unbounded preceding → current);
  3. keep left rows; optionally null out matches older than a tolerance.

Cost: ONE shuffle+sort on the key — no per-row range scan, no interval
explosion, skew handled by AQE like any window. Equal timestamps match
(right sorts before left at the same ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.sources.registry import epoch_us


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, the most recent right row (same ``by`` keys,
    right.ts ≤ left.ts, within ``tolerance_seconds`` if given).

    ``direction="forward"`` mirrors the semantics: the EARLIEST right
    row at or after left.ts (right.ts ≥ left.ts), the "next state"
    join — same one-shuffle union trick, with the carry running
    backward (first non-null over [current, unbounded following]) and
    the equal-timestamp tie flipped so a right row at exactly left.ts
    still matches.

    Returns all left columns plus ``{v}{suffix}`` for each value column
    and ``{ts_col}{suffix}`` (the matched right timestamp) — null when no
    right row qualifies.

    Determinism contract: the right side must be unique per (by, ts) —
    pre-dedup with a window if it isn't (equal-timestamp right rows have
    no defined winner otherwise).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    value_cols = value_cols or [
        c for c in right.columns if c not in by and c != ts_col
    ]
    rts = f"{ts_col}{suffix}"
    # Event time may be TIMESTAMP or TIMESTAMP_NTZ (the testdata contract
    # is NTZ for parquet-pushdown reasons); epoch_us handles both — but
    # the flavors must MATCH: unionByName would coerce a mixed pair to
    # TIMESTAMP while the tolerance math below still used the pre-union
    # dtypes, skewing the staleness check by the session-TZ offset.
    # Fail loudly instead of silently mis-nulling carried values.
    r_ts_dtype = dict(right.dtypes)[ts_col]
    l_ts_dtype = dict(left.dtypes)[ts_col]
    if l_ts_dtype != r_ts_dtype:
        raise ValueError(
            f"asof_join requires matching event-time types on {ts_col!r}: "
            f"left={l_ts_dtype}, right={r_ts_dtype} — cast one side first"
        )

    r_side, l_side = (1, 0) if direction == "forward" else (0, 1)
    # The ENTIRE right payload (matched ts + every value column) rides in
    # ONE struct, so the ignorenulls carry picks a single right row
    # wholesale. Carrying each column independently would, when a right
    # value column is NULL on the matched row, silently substitute that
    # column's value from a *different* (farther) right row — pandas
    # merge_asof returns the matched row's NULL, and so do we.
    carried = [rts] + [f"{c}{suffix}" for c in value_cols]
    right_tagged = right.select(
        *by,
        F.col(ts_col),
        F.lit(r_side).alias("__side"),
        epoch_us(F.col(ts_col), r_ts_dtype).alias("__tie"),
        F.struct(
            F.col(ts_col).alias(rts),
            *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        ).alias("__pay"),
    )
    # Null literal for the left side comes from the schema OBJECT, not the
    # dtypes() DDL string — the string embeds value-column NAMES, and a name
    # containing DDL metacharacters (space, comma, ':', '<') would make the
    # cast unparseable.
    pay_dtype = right_tagged.schema["__pay"].dataType
    left_cols = left.columns
    left_tagged = left.select(
        "*",
        F.lit(l_side).alias("__side"),
        epoch_us(F.col(ts_col), l_ts_dtype).alias("__tie"),
        F.lit(None).cast(pay_dtype).alias("__pay"),
    )
    allrows = left_tagged.unionByName(right_tagged, allowMissingColumns=True)

    base = Window.partitionBy(*by).orderBy(
        F.col(ts_col).asc(), F.col("__side").asc(), F.col("__tie").asc()
    )
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    if direction == "nearest":
        # Pandas merge_asof(direction="nearest") semantics: the closer of
        # the latest-at-or-before and earliest-after right rows, ties to
        # the backward side. BOTH carries run over the SAME (ts, side,
        # tie) sort — right rows sort before left at equal ts, so the
        # forward frame [current, following] structurally excludes the
        # equal-ts right row, which is fine: backward matches it at gap
        # 0 and wins any tie. One shuffle, two window passes sharing the
        # sort (Spark reuses the partitioning+ordering between them).
        out = (
            allrows.withColumn(
                "__b", F.last("__pay", ignorenulls=True).over(wb)
            )
            .withColumn("__f", F.first("__pay", ignorenulls=True).over(wf))
            .filter(F.col("__side") == F.lit(l_side))
        )
        gb = epoch_us(F.col(ts_col), l_ts_dtype) - epoch_us(
            F.col("__b")[rts], r_ts_dtype
        )
        gf = epoch_us(F.col("__f")[rts], r_ts_dtype) - epoch_us(
            F.col(ts_col), l_ts_dtype
        )
        choose_b = F.col("__b").isNotNull() & (
            F.col("__f").isNull() | (gb <= gf)
        )
        out = out.withColumn(
            "__m", F.when(choose_b, F.col("__b")).otherwise(F.col("__f"))
        )
        if tolerance_seconds is not None:
            gap = F.when(choose_b, gb).otherwise(gf)
            out = out.withColumn(
                "__m",
                F.when(
                    F.coalesce(gap > tolerance_seconds * 1_000_000, F.lit(False)),
                    F.lit(None).cast(pay_dtype),
                ).otherwise(F.col("__m")),
            )
        return out.select(
            *left_cols, *[F.col("__m")[c].alias(c) for c in carried]
        )

    carry = (
        F.last("__pay", ignorenulls=True).over(wb)
        if direction == "backward"
        else F.first("__pay", ignorenulls=True).over(wf)
    )
    out = allrows.withColumn("__m", carry).filter(
        F.col("__side") == F.lit(l_side)
    )

    if tolerance_seconds is not None:
        gap = (
            epoch_us(F.col(ts_col), l_ts_dtype)
            - epoch_us(F.col("__m")[rts], r_ts_dtype)
            if direction == "backward"
            else epoch_us(F.col("__m")[rts], r_ts_dtype)
            - epoch_us(F.col(ts_col), l_ts_dtype)
        )
        out = out.withColumn(
            "__m",
            F.when(
                F.coalesce(gap > tolerance_seconds * 1_000_000, F.lit(False)),
                F.lit(None).cast(pay_dtype),
            ).otherwise(F.col("__m")),
        )

    return out.select(*left_cols, *[F.col("__m")[c].alias(c) for c in carried])
