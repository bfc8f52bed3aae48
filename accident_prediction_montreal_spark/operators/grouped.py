"""Grouped-map pandas operators (F-family: applyInPandas).

The batch grouped-map escape hatch for semantics the built-ins can't
express: each group arrives as ONE Arrow-backed pandas DataFrame. The
z-score example here IS expressible with window functions (that's what
makes it oracle-checkable); real uses are per-group model scoring,
curve fitting, library calls. Scale rule: a group must fit in one
executor's memory — key by something bounded, never by a skewed key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def zscore_by_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """(id, z) — sample-stddev z-score of ``value_col`` within each group.

    Arrow-batched applyInPandas; single-member or zero-variance groups
    yield null z (pandas std ddof=1 semantics), matching SQL
    STDDEV_SAMP.
    """
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("z", T.DoubleType()),
        ]
    )

    def norm(pdf: "pd.DataFrame") -> "pd.DataFrame":
        v = pdf[value_col].astype("float64")
        std = v.std(ddof=1)
        # pandas emits NaN for 1-row / zero-variance groups (0/0, x/NaN),
        # and a float64 NaN survives Arrow as NaN, not NULL; STDDEV_SAMP
        # yields NULL there. Route through nullable Float64 so those rows
        # reach Spark as true nulls and hash like the SQL form.
        if std > 0.0:  # False for both 0.0 and NaN
            z = pd.array((v - v.mean()) / std, dtype="Float64")
        else:
            z = pd.array([None] * len(v), dtype="Float64")
        return pd.DataFrame({"id": pdf[id_col], "z": z})

    return (
        df.select(group_col, id_col, value_col)
        .groupBy(group_col)
        .applyInPandas(norm, schema=out_schema)
    )
