"""Input formatting / hygiene operators.

Reference analogs: ``tools/DataFrameFormatter.scala`` (dedup :47-49,
required columns :51-61, double casting with locale repair :63-75, column
name normalization :80-93) and ``filter/WithoutOutOfRangeLocation.scala``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arlas_proc_spark.operators.base import require_columns


def drop_duplicate_observations(df: DataFrame, id_col: str, ts_col: str) -> DataFrame:
    """Dedup on (id, timestamp) — arbitrary-1-per-key, matching the
    reference's semantics (DataFrameFormatter.scala:47-49). For the CDC
    path use the *deterministic* lww_resolve instead."""
    return df.dropDuplicates([id_col, ts_col])


def with_valid_double_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Locale repair (',' decimal → '.') + cast to double
    (DataFrameFormatter.scala:63-75). try_cast: unparseable → null, never
    a job failure (ANSI-safe)."""
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.regexp_replace(F.col(c).cast("string"), ",", ".").try_cast("double"))
    return out


_NORM_RE = re.compile(r"[^0-9a-zA-Z_]")


def with_valid_column_names(df: DataFrame) -> DataFrame:
    """Lowercase + strip special chars from column names
    (DataFrameFormatter.scala:80-93)."""
    return df.select(*[
        F.col(f"`{c}`").alias(_NORM_RE.sub("_", c.strip().lower()))
        for c in df.columns
    ])


def filter_in_range(df: DataFrame, bounds: dict[str, tuple[float, float]]) -> DataFrame:
    """Validity range filter (reference: lat/lon bounds,
    filter/WithoutOutOfRangeLocation.scala:44-54)."""
    require_columns(df, *bounds.keys())
    cond = F.lit(True)
    for c, (lo, hi) in bounds.items():
        cond = cond & F.col(c).between(lo, hi)
    return df.where(cond)


def standardize_static_columns(df: DataFrame, id_col: str,
                               cols: dict[str, object]) -> DataFrame:
    """Null-backfill 'static' per-key columns from any sibling row, with a
    default when the whole key has no value (reference:
    StaticColumnsStandardizer.scala:40-53 — ``first(ignoreNulls)`` over the
    unordered key partition). Uses ``min`` instead of ``first`` so the
    result is deterministic; by the static-column contract a key carries at
    most one distinct non-null value, where the two agree.

    ``cols``: column name → default value (None = leave null).
    """
    from pyspark.sql.window import Window
    require_columns(df, id_col, *cols.keys())
    w = Window.partitionBy(id_col)
    for c, default in cols.items():
        filled = F.coalesce(F.col(c), F.min(c).over(w))
        if default is not None:
            filled = F.coalesce(filled, F.lit(default))
        df = df.withColumn(c, filled)
    return df


def filter_on_period(df: DataFrame, ts_col: str, partition_col: str | None,
                     start=None, stop=None) -> DataFrame:
    """Time-range predicate that ALSO constrains the partition column so the
    scan prunes partitions (reference: sql/package.scala:41-66 ANDs
    ``arlas_partition >= yyyyMMdd`` with the row predicate)."""
    out = df
    if start is not None:
        cond = F.col(ts_col) >= F.lit(start)
        if partition_col:
            cond = cond & (F.col(partition_col) >=
                           F.date_format(F.timestamp_seconds(F.lit(start)), "yyyyMMdd").cast("int"))
        out = out.where(cond)
    if stop is not None:
        cond = F.col(ts_col) <= F.lit(stop)
        if partition_col:
            cond = cond & (F.col(partition_col) <=
                           F.date_format(F.timestamp_seconds(F.lit(stop)), "yyyyMMdd").cast("int"))
        out = out.where(cond)
    return out
