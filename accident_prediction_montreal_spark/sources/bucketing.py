"""Bucketed tables: shuffle-free repeated joins (the 100-TB co-location
lever — SURVEY.md §4 names bucketing as the join strategy the reference
never used).

``write_bucketed`` saves a managed table bucketed (and sorted) by the
join key; two tables bucketed the same way join with ZERO Exchange —
verified by plan inspection in tests. Worth it when a big⋈big join on a
stable key recurs (fact-to-fact joins, repeated backfills); the price is
a one-time clustered write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """``path`` makes the table external (data at the given location);
    otherwise it is managed under spark.sql.warehouse.dir (a static
    conf — set it at session build, not per-write)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
