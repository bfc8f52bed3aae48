"""ClassWeighter — custom Transformer (SURVEY.md §2 M3).

Adds a per-row weight column from a per-class weight list, the
balanced-random-forest trick of reference src/class_weighter.py:7-43.
``balanced_weights`` computes the canonical n/(2·n_class) weighting.
"""

from __future__ import annotations

from pyspark.ml import Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import HasLabelCol, HasWeightCol
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class HasClassWeight(Params):
    classWeight = Param(
        Params._dummy(),
        "classWeight",
        "Weight to give to each class, indexed by label.",
        typeConverter=TypeConverters.toListFloat,
    )

    def __init__(self):
        super().__init__()

    def getClassWeight(self) -> list[float]:
        return self.getOrDefault(self.classWeight)

    def setClassWeight(self, value: list[float]):
        return self._set(classWeight=value)


class ClassWeighter(Transformer, HasWeightCol, HasLabelCol, HasClassWeight):
    def __init__(self, classWeight: list[float] | None = None, labelCol: str = "label", weightCol: str = "weight"):
        super().__init__()
        self._setDefault(weightCol="weight")
        self._set(labelCol=labelCol, weightCol=weightCol)
        if classWeight is not None:
            self._set(classWeight=[float(w) for w in classWeight])

    def _transform(self, dataset: DataFrame) -> DataFrame:
        w0, w1 = self.getClassWeight()
        return dataset.withColumn(
            self.getWeightCol(),
            F.when(F.col(self.getLabelCol()) == 0.0, F.lit(w0)).otherwise(F.lit(w1)),
        )


def balanced_weights(dataset: DataFrame, label_col: str = "label") -> list[float]:
    """Canonical balanced class weights: n / (2 · n_class) per class."""
    label = F.col(label_col)
    row = dataset.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(label == 0.0, 1)).alias("n0"),
        F.count(F.when(label == 1.0, 1)).alias("n1"),
    ).first()
    return [row["n"] / (2.0 * row["n0"]), row["n"] / (2.0 * row["n1"])]
