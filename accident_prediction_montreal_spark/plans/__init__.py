"""Query plans: the engine's declared operator inventory (SURVEY.md §2).

Importing this package populates the registry with every implemented
query: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle string computing the
same result (same column names, same canonicalization).
"""

from accident_prediction_montreal_spark.plans.registry import REGISTRY, QuerySpec

# Populate the registry.
from accident_prediction_montreal_spark.plans import relational  # noqa: F401,E402
from accident_prediction_montreal_spark.plans import relational_extra  # noqa: F401,E402
from accident_prediction_montreal_spark.plans import composite  # noqa: F401,E402
from accident_prediction_montreal_spark.plans import llm_ops  # noqa: F401,E402

__all__ = ["REGISTRY", "QuerySpec"]
