"""SCD2 (slowly-changing-dimension type 2) temporal dimension join.

Absent from the reference (its weather/station dims are static snapshots,
src/weather.py), but every production feature pipeline joins facts to
versioned dimensions: each key carries [valid_from, valid_to) validity
windows and a fact row must pick up the version covering its event time.

Two physical strategies, one semantics:

* ``broadcast`` — dims are usually small: broadcast hash join on the key
  with the BETWEEN predicate evaluated post-probe. One pass, no shuffle
  of the fact side at all.
* ``asof`` — for LARGE dimension histories (e.g. per-user state with
  millions of versions): because SCD2 windows are non-overlapping per
  key, "the version covering ts" == "the latest version with
  valid_from <= ts, provided its valid_to is still open" — exactly the
  one-shuffle sort-union as-of join (operators/asof.py), followed by a
  null-out where the matched window has already closed (a coverage
  gap). No interval explosion, no range scan.

Determinism: windows must be non-overlapping per key (the SCD2
invariant); rows in gaps or before the first version get NULL values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.asof import asof_join


def scd2_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    value_cols: list[str] | None = None,
    suffix: str = "_dim",
    strategy: str = "broadcast",
) -> DataFrame:
    """All fact columns plus ``{v}{suffix}`` for each dim value column —
    NULL when no version covers the fact's event time. ``valid_to`` may
    be NULL for the open current version (half-open [from, to))."""
    value_cols = value_cols or [
        c for c in dim.columns if c not in (key, valid_from, valid_to)
    ]
    if strategy == "broadcast":
        d = dim.select(
            F.col(key).alias("__k"),
            valid_from,
            valid_to,
            *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        )
        cond = (
            (facts[key] == d["__k"])
            & (facts[ts_col] >= d[valid_from])
            & (d[valid_to].isNull() | (facts[ts_col] < d[valid_to]))
        )
        return facts.join(F.broadcast(d), cond, "left").drop(
            "__k", valid_from, valid_to
        )
    if strategy != "asof":
        raise ValueError("strategy must be 'broadcast' or 'asof'")
    # as-of path: right side keyed on valid_from AS the event-time column
    # (same name + dtype as the fact ts, per asof_join's contract).
    # valid_to's NULL (open current version) becomes a far-future
    # sentinel BEFORE the join: the as-of carry is last_value IGNORE
    # NULLS, so a NULL value column would be silently replaced by the
    # PREVIOUS version's valid_to and wrongly close the open window.
    ts_dtype = dict(facts.dtypes)[ts_col]
    far_future = F.lit("9999-12-31 00:00:00").cast(ts_dtype)
    right = dim.select(
        key,
        F.col(valid_from).cast(ts_dtype).alias(ts_col),
        F.coalesce(F.col(valid_to).cast(ts_dtype), far_future).alias("__vto"),
        *value_cols,
    )
    joined = asof_join(
        facts,
        right,
        by=[key],
        ts_col=ts_col,
        value_cols=["__vto", *value_cols],
        suffix=suffix,
        direction="backward",
    )
    vto = F.col(f"__vto{suffix}")
    covered = F.col(f"{ts_col}{suffix}").isNotNull() & (
        vto.isNull() | (F.col(ts_col) < vto)
    )
    out = joined
    for c in value_cols:
        out = out.withColumn(
            f"{c}{suffix}", F.when(covered, F.col(f"{c}{suffix}"))
        )
    return out.drop(f"__vto{suffix}", f"{ts_col}{suffix}")
