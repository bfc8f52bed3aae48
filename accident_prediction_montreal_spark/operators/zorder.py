"""Z-order (Morton curve) data layout for multi-dimensional pruning
(X-surface extension).

Partitioning a 100-TB table by ONE column prunes one predicate;
queries that filter two dimensions (partkey AND suppkey, lat AND lon)
still scan everything. Interleaving the bits of both quantized
dimensions into one Morton value and range-clustering files by it
makes every file a small rectangle in (a, b) space — so parquet
footer min/max stats on the ORIGINAL columns become selective and the
reader skips files for ANY conjunctive rectangle predicate. This is
the standard lakehouse OPTIMIZE ZORDER BY layout, expressed as plain
DataFrame ops: no new writer, just repartitionByRange on the z-value.

All bit-spreading is JVM-side integer algebra (shifts/masks inside
whole-stage codegen) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` of non-negative ints a and b:
    result bit 2i = bit i of a, bit 2i+1 = bit i of b."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(1), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    num_files: int = 16,
    bits: int = 16,
) -> None:
    """Cluster ``df`` into ``num_files`` parquet files along the Morton
    curve of (col_a, col_b). Quantization keeps the low ``bits`` of
    each column's rank proxy (the raw int here; rank-quantile at skew).
    """
    mask = (1 << bits) - 1
    z = zvalue(
        F.col(col_a).cast("long").bitwiseAND(mask),
        F.col(col_b).cast("long").bitwiseAND(mask),
        bits,
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
