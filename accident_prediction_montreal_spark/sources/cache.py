"""Parquet materialization cache.

The reference hand-rolls a compute-or-reload pattern at nine sites
(reference accidents_montreal.py:63-69, road_network.py:37-40, weather.py
:89-92, preprocess.py:60-63 …): if a Parquet directory exists, reload it;
otherwise compute, write, reload. This module formalizes that pattern as
a single helper with explicit overwrite/invalidate semantics.

Cutting lineage through a Parquet materialization is also the 100-TB
lever the reference discovered empirically: it bounds recomputation,
gives downstream stages a freshly-statistics'd columnar scan, and lets a
failed job resume mid-pipeline.
"""

from __future__ import annotations

import shutil
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def parquet_cache(
    spark: SparkSession,
    path: str,
    compute: Callable[[], DataFrame],
    overwrite: bool = False,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Return the DataFrame at ``path``, computing and writing it if absent.

    ``partition_by`` writes date/key-partitioned Parquet so downstream
    filters prune whole directories (partition pruning — the scan-level
    analogue of the reference's month-sharded backfill,
    main_gen_match.py:20-75).
    """
    target = Path(path)
    success = target / "_SUCCESS"
    if overwrite and target.exists():
        shutil.rmtree(target)
    if not success.exists():
        writer = compute().write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(target))
    return spark.read.parquet(str(target))
