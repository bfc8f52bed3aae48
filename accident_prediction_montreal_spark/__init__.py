"""accident_prediction_montreal_spark — a PySpark-native analytics engine.

A brand-new engine exposing, as first-class tested operators, the query and
data-processing capabilities of the reference application
``big-data-lab-team/accident-prediction-montreal`` (surveyed in SURVEY.md),
plus the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing, streaming) the reference lacks.

Everything is built on the public Apache Spark 3.x/4.x DataFrame API:
declarative logical plans, Catalyst optimization, whole-stage codegen.
Python UDFs appear only where the built-in operators genuinely cannot
express the semantics, and then only as Arrow-batched pandas UDFs.
"""

from accident_prediction_montreal_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
