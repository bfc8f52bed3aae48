"""Exact (decimal) aggregation helpers for oracle-grade determinism.

Floating-point sums are order-dependent: with hundreds of shuffle
partitions, ``SUM(double)`` differs in the last ulps from run to run and
from engine to engine. For money-like columns the engine aggregates in
``DECIMAL(38, 6)`` — exact, associative, identical in Spark and any
ANSI-SQL oracle — and casts the finished aggregate back to double.
Spark's decimal arithmetic stays in Tungsten codegen, so the cost is a
wider register, not a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(38,6)"


def dsum(value: Column | str) -> Column:
    """Order-independent SUM: decimal-exact internally, double out."""
    value = F.col(value) if isinstance(value, str) else value
    return F.sum(value.cast(_DEC)).cast("double")


def davg(value: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum / count, double out."""
    value = F.col(value) if isinstance(value, str) else value
    return (F.sum(value.cast(_DEC)).cast("double") / F.count(value)).cast("double")
