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
