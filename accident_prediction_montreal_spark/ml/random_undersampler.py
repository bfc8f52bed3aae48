"""RandomUnderSampler — custom Estimator/Model pair (SURVEY.md §2 M2).

Same capability as reference src/random_undersampler.py:7-101: fit
computes the negative/positive ratio and seeded-samples the set of
negative-example indexes to drop; transform removes them. Differences
(idiomatic, SURVEY.md §7.1): the removal is a first-class ``left_anti``
join instead of left_outer + isnull + sentinel column, and the params
use keyword constructors.

Scale note: ``indexesToRemove`` stays a DataFrame (never collected); the
anti-join shuffles on the index key only, and Catalyst broadcast the
index side automatically when it is small.
"""

from __future__ import annotations

from pyspark.ml import Estimator, Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import HasLabelCol, HasSeed
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class HasTargetImbalanceRatio(Params):
    """Mixin: target (negatives / positives) ratio after resampling."""

    targetImbalanceRatio = Param(
        Params._dummy(),
        "targetImbalanceRatio",
        "Target imbalance ratio after transformation: negative count divided "
        "by positive count.",
        typeConverter=TypeConverters.toFloat,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(targetImbalanceRatio=1.0)

    def getTargetImbalanceRatio(self) -> float:
        return self.getOrDefault(self.targetImbalanceRatio)

    def setTargetImbalanceRatio(self, value: float):
        return self._set(targetImbalanceRatio=value)


class HasIndexCol(Params):
    """Mixin: name of the unique row-index column."""

    indexCol = Param(
        Params._dummy(),
        "indexCol",
        "index column name.",
        typeConverter=TypeConverters.toString,
    )

    def __init__(self):
        super().__init__()
        self._setDefault(indexCol="index")

    def getIndexCol(self) -> str:
        return self.getOrDefault(self.indexCol)

    def setIndexCol(self, value: str):
        return self._set(indexCol=value)


class RandomUnderSampler(Estimator, HasTargetImbalanceRatio, HasSeed, HasLabelCol, HasIndexCol):
    """Undersample the negative class down to a target imbalance ratio."""

    def __init__(
        self,
        targetImbalanceRatio: float = 1.0,
        indexCol: str = "index",
        labelCol: str = "label",
        seed: int = 42,
    ):
        super().__init__()
        self._set(
            targetImbalanceRatio=float(targetImbalanceRatio),
            indexCol=indexCol,
            labelCol=labelCol,
            seed=seed,
        )

    def _fit(self, dataset: DataFrame) -> "RandomUnderSamplerModel":
        label = F.col(self.getLabelCol())
        neg = dataset.filter(label == 0.0)
        # One pass for both class counts (the reference runs two count() jobs).
        counts = dataset.agg(
            F.count(F.when(label == 0.0, 1)).alias("n_neg"),
            F.count(F.when(label == 1.0, 1)).alias("n_pos"),
        ).first()
        current_ratio = counts["n_neg"] / counts["n_pos"]
        keep_fraction = self.getTargetImbalanceRatio() / current_ratio
        if keep_fraction >= 1.0:
            indexes_to_remove = None  # already at or below the target
        else:
            # Named args matter: sample(0.8, seed=7) binds the float to
            # withReplacement and SILENTLY DROPS the seed (the overload
            # shim reads seed from the `fraction` slot) — the call would
            # be nondeterministic. The reference has this exact bug
            # (src/random_undersampler.py:74-76).
            indexes_to_remove = neg.select(self.getIndexCol()).sample(
                withReplacement=False, fraction=1.0 - keep_fraction, seed=self.getSeed()
            )
        model = RandomUnderSamplerModel(indexes_to_remove)
        model._set(
            targetImbalanceRatio=self.getTargetImbalanceRatio(),
            indexCol=self.getIndexCol(),
        )
        return model


class RandomUnderSamplerModel(Transformer, HasTargetImbalanceRatio, HasIndexCol):
    def __init__(self, indexesToRemove: DataFrame | None):
        super().__init__()
        self.indexesToRemove = indexesToRemove

    def _transform(self, dataset: DataFrame) -> DataFrame:
        if self.indexesToRemove is None:
            return dataset
        # left_anti ≡ reference's left_outer + isnull(exists) (J4).
        return dataset.join(self.indexesToRemove, self.getIndexCol(), "left_anti")
