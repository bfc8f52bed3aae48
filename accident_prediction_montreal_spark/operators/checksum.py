"""Order-insensitive multiset checksums — O(1)-row equality contracts.

The trilogy queries (llm_index_maintenance, llm_embedding_refresh)
carry a CONTRACT stage: the incrementally-maintained artifact must
equal the from-scratch rebuild exactly. r11 verified that with
symmetric anti-joins / a full-outer element-wise compare — correct,
but each check is a corpus-width exchange, and the check itself is
run-the-operator-every-time code. Multiset equality needs none of
that: fold each side to ONE row of commutative aggregates over a
per-row hash and compare the rows.

Checksum = (count, bit_xor(h), sum(h as decimal(38,0))) with
h = xxhash64(cols...). All three aggregates are commutative and
associative → map-side partial aggregation, one 1-row exchange, no
join. xor alone misses even-multiplicity swaps (a row duplicated on
one side and dropped on the other cancels), sum alone wraps on
crafted pairs; count + xor + sum together make an accidental
collision need a simultaneous xor- and sum-preserving multiset edit —
not a property a real divergence (one differing row) can have, and
the planted-divergence property test pins it.

The decimal(38,0) sum never overflows under ANSI mode: |xxhash64| <
2^63 ≈ 9.2e18, so even 1e15 rows stay < 1e34 << 1e38.

At 100 TB the cost is exactly one pass over each side (the rebuild
pass IS the contract's price — it's what the maintained path exists
to avoid paying per batch); the comparison itself moves 2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def multiset_checksum(df: DataFrame, cols: list[str]) -> DataFrame:
    """One row (cnt, hxor, hsum) summarizing ``df[cols]`` as a multiset.

    Row order and partitioning never affect the result; two frames are
    multiset-equal iff their checksum rows match (up to the hash
    guarantees documented in the module docstring). Empty input yields
    (0, NULL, NULL) — compare null-safely.
    """
    h = F.xxhash64(*[F.col(c) for c in cols])
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.bit_xor(h).alias("hxor"),
        F.sum(h.cast("decimal(38,0)")).alias("hsum"),
    )


def checksum_equal_fact(
    a: DataFrame, b: DataFrame, cols: list[str], facet: str
) -> DataFrame:
    """1-row (facet, n) frame: n = 1 iff a[cols] == b[cols] as multisets.

    The two 1-row checksums cross-join (a 2-row movement, not a
    corpus-width exchange) and compare null-safely so empty == empty.
    """
    ca = multiset_checksum(a, cols).alias("a")
    cb = multiset_checksum(b, cols).alias("b")
    same = (
        F.col("a.cnt").eqNullSafe(F.col("b.cnt"))
        & F.col("a.hxor").eqNullSafe(F.col("b.hxor"))
        & F.col("a.hsum").eqNullSafe(F.col("b.hsum"))
    )
    return ca.crossJoin(cb).select(
        F.lit(facet).alias("facet"), same.cast("long").alias("n")
    )
