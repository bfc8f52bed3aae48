"""Skew-handling join: explicit key salting.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime; explicit salting remains necessary when a single hot
key dominates a SHUFFLE-side aggregation or when the skewed side feeds
a window. Pattern: append salt ∈ [0, s) to the big side's key, replicate
the small side s×, join on (key, salt).

At 100 TB this is the difference between one straggler task holding a
hot key's entire partition and s tasks sharing it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` (skewed) with ``small`` on ``key`` using salting.

    The big side gets a deterministic per-row salt (hash of all columns,
    not rand() — reproducible plans); the small side is exploded into all
    salt values. Result equals ``big.join(small, key, how)`` for inner
    and left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_buckets))
    big_s = big.withColumn("__salt", salt.cast("int"))
    small_s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")
