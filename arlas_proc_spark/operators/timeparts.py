"""Timestamp standardization + time partitioning.

Reference analogs:
- ``features/WithStandardTimestamp.scala:40-63``: parse a string timestamp
  with a declared format, two-stage fallback (explicit zone, then UTC),
  emit epoch seconds;
- ``features/WithTimePartition.scala:37-46``: int ``yyyyMMdd`` partition
  value from the epoch — the manual partition-pruning column the reference
  ANDs into every Period filter (``sql/package.scala:41-66``).

try_to_timestamp keeps the parse total (bad rows → null, never a job
failure) — ANSI-safe in Spark 4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arlas_proc_spark.operators.base import require_columns


def with_standard_timestamp(df: DataFrame, ts_col: str,
                            fmt: str = "yyyy-MM-dd'T'HH:mm:ssXXX",
                            fallback_fmt: str | None = "yyyy-MM-dd'T'HH:mm:ss",
                            out_col: str = "epoch_s") -> DataFrame:
    """String timestamp → epoch seconds with two-stage format fallback."""
    require_columns(df, ts_col)
    primary = F.try_to_timestamp(F.col(ts_col), F.lit(fmt))
    parsed = (F.coalesce(primary, F.try_to_timestamp(F.col(ts_col), F.lit(fallback_fmt)))
              if fallback_fmt else primary)
    return df.withColumn(out_col, F.unix_timestamp(parsed))


def with_time_partition(df: DataFrame, epoch_col: str,
                        out_col: str = "partition_day") -> DataFrame:
    """Epoch seconds → int yyyyMMdd partition value."""
    require_columns(df, epoch_col)
    return df.withColumn(
        out_col,
        F.date_format(F.timestamp_seconds(F.col(epoch_col)), "yyyyMMdd").cast("int"))
