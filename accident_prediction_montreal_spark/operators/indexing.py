"""Global row numbering at scale (X-surface).

The naive global index — ``row_number() OVER (ORDER BY ...)`` with no
partition clause — funnels the entire dataset through ONE task (Spark
plans a single-partition window sort), the canonical driver-shaped
bottleneck at 100 TB. The two-phase form here is the distributed
classic (RDD ``zipWithIndex``'s design, re-expressed DataFrame-first):

  1. range-shuffle by the order key (contiguous key ranges land on
     increasing partition ids) and sort within partitions;
  2. number rows locally with a zero-shuffle Arrow pass (mapInPandas
     carries a running counter across the partition's batches);
  3. one tiny per-partition count aggregate (reads the SAME exchange —
     Catalyst reuses it) rolls into exclusive prefix offsets, broadcast
     back, and ``global = offset[pid] + local``.

Total cost: ONE data-sized shuffle (the range repartition), one
O(n_partitions)-row offsets window, one broadcast join. The offsets
cumulative sum runs on ≤ n_partitions rows, so its single-partition
window is metadata-sized, not data-sized.

Correctness needs a TOTAL order key: ties spanning a range-partition
boundary would make the assignment boundary-dependent. Callers pass a
key that is unique (or unique-ified with a tie-break column).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def global_row_index(
    df: DataFrame,
    order_cols: list[str],
    num_partitions: int = 32,
    index_col: str = "global_idx",
) -> DataFrame:
    """Append ``index_col``: the row's 0-based rank under ``order_cols``,
    computed without a single-partition global sort."""
    ranged = df.repartitionByRange(num_partitions, *order_cols).sortWithinPartitions(
        *order_cols
    ).withColumn("__pid", F.spark_partition_id())

    # fresh StructType: .add() mutates in place, and df.schema can hand
    # back the DataFrame's own cached instance.
    out_schema = T.StructType(
        list(ranged.schema.fields) + [T.StructField("__rn", T.LongType())]
    )

    def number_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["__rn"] = range(seen, seen + len(pdf))
            seen += len(pdf)
            yield pdf

    local = ranged.mapInPandas(number_partition, schema=out_schema)

    counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # n_partitions rows: the single-partition window is metadata-sized.
    w = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__cnt").over(w), F.lit(0)).alias("__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(index_col, (F.col("__off") + F.col("__rn")).cast("long"))
        .drop("__pid", "__rn", "__off")
    )
