"""Distributed Bloom-filter semi-join prefilter (J-surface extension).

Spark's own runtime bloom pushdown (InjectRuntimeFilter) only fires on
its internal heuristics; this operator makes the pattern explicit and
portable: build a Bloom bitmap OVER THE CLUSTER from the build side's
keys (never collected to the driver), broadcast the tiny bitmap table,
and prefilter the probe side with k bit-tests before the exact join.

Why it matters at 100 TB: a semi-join whose build side is 10^9 keys
cannot broadcast the keys (tens of GB), so the probe side must shuffle
in full. The Bloom bitmap is m/8 bytes REGARDLESS of build cardinality
(2^20 bits = 128 KiB here), broadcasts everywhere, and rejects the
overwhelming majority of probe rows map-side — the exact join that
follows (still required: Bloom has false positives, never false
negatives) shuffles only the survivors.

Construction is pure DataFrame algebra: position = xxhash64(seed_i,
key) mod m for k seeds; bitmap = groupBy(position >> 6) bit_or(1 <<
(position & 63)) — a 16k-row bigint table. Probe tests are k broadcast
equi-joins on the bucket id plus bitwise ANDs, all JVM-side codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_bitmap(build: DataFrame, key_col: str, num_bits: int, k: int) -> DataFrame:
    """(bucket, bits): the Bloom filter as a 64-bit-word table of at
    most ``num_bits/64`` rows. ``num_bits`` must be a power of two."""
    assert num_bits & (num_bits - 1) == 0, "num_bits must be a power of two"
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.lit(i), F.col(key_col)), F.lit(num_bits))
                for i in range(k)
            ]
        )
    ).alias("pos")
    return (
        build.select(pos)
        .select(
            F.shiftright("pos", 6).alias("bucket"),
            # shiftleft's python wrapper only takes a literal shift;
            # the SQL form accepts a column for both operands
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos & 63 AS INT))").alias("__bit"),
        )
        .groupBy("bucket")
        .agg(F.bit_or("__bit").alias("bits"))
    )


def bloom_prefilter(
    probe: DataFrame, key_col: str, bitmap: DataFrame, num_bits: int, k: int
) -> DataFrame:
    """Probe rows whose key passes every one of the k Bloom bit-tests.

    Superset guarantee: every probe row whose key IS in the build set
    passes (no false negatives); a fraction (1-e^(-kn/m))^k of the rest
    leaks through and must be removed by the exact join downstream.
    """
    out = probe
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.lit(i), F.col(key_col)), F.lit(num_bits))
        bm = bitmap.select(
            F.col("bucket").alias(f"__bk{i}"), F.col("bits").alias(f"__bits{i}")
        )
        out = out.withColumn(f"__pos{i}", pos).join(
            F.broadcast(bm),
            F.shiftright(f"__pos{i}", 6) == F.col(f"__bk{i}"),
            "left",
        )
    passes = [
        F.col(f"__bits{i}").isNotNull()
        & (
            F.col(f"__bits{i}").bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__pos{i} & 63 AS INT))")
            )
            != 0
        )
        for i in range(k)
    ]
    cond = passes[0]
    for p in passes[1:]:
        cond = cond & p
    drop = [c for i in range(k) for c in (f"__pos{i}", f"__bk{i}", f"__bits{i}")]
    return out.filter(cond).drop(*drop)


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    num_bits: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Exact semi-join with a Bloom prefilter on the probe side."""
    bm = bloom_bitmap(build, build_key, num_bits, k)
    pre = bloom_prefilter(probe, probe_key, bm, num_bits, k)
    keys = build.select(F.col(build_key).alias(probe_key)).distinct()
    return pre.join(keys, on=probe_key, how="left_semi")
