"""Sequence packing: assign documents to fixed-capacity token bins.

The pre-training batch-assembly step: documents are concatenated in a
deterministic order and wrapped every ``capacity`` tokens; a document
belongs to the bin where it starts. Packing is per shard (here the
``source`` column) — the cumulative sum inside a shard is the
inherently sequential part, so sharding is what scales: each shard's
running sum is an independent window partition, and 100 TB of text
packs as thousands of parallel shards rather than one global ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from accident_prediction_montreal_spark.operators.text import token_count


def pack_sequences(
    df: DataFrame,
    capacity: int,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(shard, id, n_tokens, seq_bin): concat-and-wrap bin assignment.

    seq_bin = floor(tokens_before_this_doc / capacity) within the shard,
    ordered by ``id_col`` — deterministic, one shuffle (the shard
    window).
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    n = token_count(F.col(text_col))
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(F.col(shard_col).alias("shard"), F.col(id_col), n.alias("n_tokens"))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn(
            "seq_bin",
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / capacity).cast("long"),
        )
    )
