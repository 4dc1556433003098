"""Transformer composition + column contracts.

The reference chains ``ArlasTransformer`` stages through a Spark ML
Pipeline whose only real job is (a) required-column validation and (b) an
additive schema contract (``transform/ArlasTransformer.scala:27-50``,
``sql/TransformableDataFrame.scala:53-61``). In PySpark the idiomatic
equivalent is plain function composition over DataFrames — every operator
here is ``DataFrame -> DataFrame``, chained with ``pipeline`` /
``df.transform`` — so the whole chain stays ONE Catalyst logical plan
(no fit/transform machinery, no plan breaks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


class ColumnContractError(ValueError):
    """Reference analog: DataFrameException on missing required columns
    (transform/ArlasTransformer.scala:42-50)."""


def require_columns(df: DataFrame, *cols: str) -> DataFrame:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ColumnContractError(
            f"missing required columns {missing}; have {df.columns}")
    return df


def pipeline(df: DataFrame, *stages: Callable[[DataFrame], DataFrame]) -> DataFrame:
    """Compose stages left-to-right; each stage appends expressions to one
    growing logical plan (reference analog: doPipelineTransform)."""
    for s in stages:
        df = s(df)
    return df
