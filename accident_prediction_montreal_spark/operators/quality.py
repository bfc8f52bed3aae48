"""One-pass data-quality expectation suites (Deequ-style, X-surface).

The reference trusts its scraped inputs after ad-hoc dropna/fillna
(preprocess.py uses per-column fixups); a production 100-TB ingest
gates every batch behind declared EXPECTATIONS — completeness, bounds,
set membership, uniqueness, pattern conformance — evaluated in ONE
aggregate pass (the Deequ/"unit tests for data" model, Schelter et al.,
VLDB 2018).

Scale shape: every check compiles to an aggregate expression over the
same scan, so N checks cost one job, one pass, zero joins; the result
is a tiny (check, ok, measure) table. ``distinctness`` uses
count_distinct which Spark plans as a partial-distinct expand on the
same pass — still one shuffle. Nothing here is per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Check:
    """A named expectation: a measure expression + a pass predicate."""

    def __init__(self, name: str, measure: Column, ok: Column):
        self.name = name
        self.measure = measure.cast("double").alias(f"__m_{name}")
        self.ok = ok.cast("long").alias(f"__ok_{name}")


def completeness(col: str, at_least: float) -> Check:
    frac = F.count(col) / F.count(F.lit(1))
    return Check(f"completeness_{col}", frac, frac >= at_least)


def uniqueness(col: str) -> Check:
    ratio = F.count_distinct(F.col(col)) / F.count(F.lit(1))
    return Check(f"uniqueness_{col}", ratio, ratio == 1.0)


def _count_if(cond: Column) -> Column:
    # SUM(CASE WHEN c THEN 1 ELSE 0 END), NOT sum(c::long): a NULL
    # predicate row (e.g. a bounds check over a NULL value) must count
    # as not-violating/not-matching, exactly like the oracle's CASE —
    # the cast form returns NULL when EVERY row's predicate is NULL
    # (ok became NULL==0 = NULL; found by the r14 events-table fuzz on
    # an all-NULL `value` column, the same class as the r13 quality-
    # cascade stage counts).
    return F.sum(F.when(cond, 1).otherwise(0))


def bounded(col: str, lo: float, hi: float) -> Check:
    viol = _count_if((F.col(col) < lo) | (F.col(col) > hi))
    return Check(f"bounded_{col}", viol, viol == 0)


def in_set(col: str, allowed: list[str]) -> Check:
    viol = _count_if(~F.col(col).isin(allowed))
    return Check(f"in_set_{col}", viol, viol == 0)


def matches(col: str, pattern: str, at_least: float) -> Check:
    frac = _count_if(F.col(col).rlike(pattern)) / F.count(F.lit(1))
    return Check(f"matches_{col}", frac, frac >= at_least)


def min_fraction(name: str, cond: Column, at_least: float) -> Check:
    frac = _count_if(cond) / F.count(F.lit(1))
    return Check(name, frac, frac >= at_least)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check in one aggregate pass; return the long-form
    verification report (chk, ok, measure) ordered by check name.

    The single-row aggregate is unpivoted with ``stack`` (the one-scan
    Expand operator) — no per-check jobs, no union of N aggregates.
    """
    one = df.agg(*[c.measure for c in checks], *[c.ok for c in checks])
    n = len(checks)
    cells = ", ".join(
        f"'{c.name}', `__ok_{c.name}`, `__m_{c.name}`" for c in checks
    )
    return (
        one.select(
            F.expr(f"stack({n}, {cells}) AS (chk, ok, measure)")
        )
        .select("chk", F.col("ok").cast("long"), F.round("measure", 6).alias("measure"))
        .orderBy("chk")
    )
