"""File sources and sinks beyond the parquet registry (SURVEY.md §2
S1, S3, S10).

The reference reads its accident CSV with header-only inference (all
strings) and casts column-by-column afterwards
(reference accidents_montreal.py:72-74 + preprocess.py:49-53).
``read_csv`` instead applies the declared schema AT THE SCAN — wrong
rows fail fast (or are quarantined via PERMISSIVE + corrupt-record
column), and the reader never materializes an all-string intermediate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    mode: str = "FAILFAST",
    **options: str,
) -> DataFrame:
    """Schema-enforced CSV scan.

    mode: FAILFAST (default — malformed input is an error), PERMISSIVE
    (nulls + optional corrupt-record column) or DROPMALFORMED.
    """
    return (
        spark.read.schema(schema)
        .options(header=str(header).lower(), mode=mode, **options)
        .csv(path)
    )


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet sink; ``partition_by`` date/key columns so downstream
    filters prune directories (the at-scale default for fact tables)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def to_pandas_csv(df: DataFrame, path: str, index: bool = False) -> None:
    """Driver-side result sink (reference random_forest.py:220-221 +
    export_results.py:45-46): results tables only — never fact data."""
    df.toPandas().to_csv(path, index=index)


def compact_partitions(
    df: DataFrame,
    out_dir: str,
    partition_col: str,
    max_records_per_file: int,
) -> None:
    """Small-files compaction — the 100-TB housekeeping op (S3 sink
    hygiene): streaming sinks and over-parallel writers leave hundreds
    of tiny files per partition directory, and at scale the NameNode/
    listing cost and per-file scan overhead dominate reads.

    One shuffle on the partition column co-locates each partition's rows
    in a single writer task (dynamic partition writers sort by the
    partition column within the task, so each directory is written by
    one sequential stream), and ``maxRecordsPerFile`` rolls files at a
    deterministic size — the output layout is exactly
    ``ceil(partition_rows / max_records_per_file)`` files per
    partition, independent of input layout. That determinism is what
    lets an oracle value-check the file COUNT, not just the data.
    """
    (
        df.repartition(F.col(partition_col))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(partition_col)
        .parquet(out_dir)
    )
