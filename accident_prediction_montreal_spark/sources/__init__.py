from accident_prediction_montreal_spark.sources.registry import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)
from accident_prediction_montreal_spark.sources.cache import parquet_cache

__all__ = ["TABLES", "load_table", "load_tables", "register_views", "parquet_cache"]
