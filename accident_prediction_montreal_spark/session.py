"""SparkSession factory.

Replaces the reference's ``utils.py:18-44`` session builder (Kryo, RDD
compression, XGBoost classpath) with a Spark 3.x/4.x-idiomatic config:
AQE on, Arrow on, UTC timezone pinned so timestamp semantics match the
DuckDB oracle, shuffle partitions sized to the local core count instead
of the 2.x default of 200.

On a real cluster the same factory applies — only ``master`` and the
memory knobs change; shuffle partitioning is left to AQE coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "accident_prediction_montreal_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Defaults are sized for the test environment (single-JVM ``local[N]``)
    but every setting is cluster-safe: AQE re-plans shuffles at runtime,
    coalesces small partitions and splits skewed ones, so the static
    ``spark.sql.shuffle.partitions`` is only an upper bound.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # ANSI off: x/0 → NULL (matches DuckDB and the SQL oracle), not an error.
        .config("spark.sql.ansi.enabled", "false")
        # Read INT64 TIMESTAMP(NANOS) parquet (events.ts) as long; the
        # loader converts to micros — Spark has no native nanos type.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.rdd.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
