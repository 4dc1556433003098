"""Resampling keyed series to fixed buckets.

Reference analog: ``features/WithFragmentSampleId.scala:41-59`` — a
cumulative duration sum over the key window assigns each row a fixed-size
bucket id so downstream summaries can collapse each bucket
(``features/MovingFragmentSampleSummarizer``). NOT a formula port: the
reference computes ``floor((sum(dur) over w - 1)/sampling) -
floor((dur-1)/sampling)`` (how many whole buckets a FRAGMENT's duration
spans, boundary row belonging to the earlier bucket); this operator
resamples POINT rows with the plain ``floor(cum/sampling)`` — a row whose
cumulative weight exactly fills a bucket OPENS the next one. The DuckDB
oracle (driver query ``resample_buckets``) pins this engine's semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arlas_proc_spark.operators.base import require_columns


def with_sample_id(df: DataFrame, id_col: str, ts_col: str,
                   sampling: float, weight_col: str | None = None,
                   out_col: str = "sample_id") -> DataFrame:
    """Bucket rows of each key by cumulative weight (default: elapsed time
    since the key's first observation). Bucket = floor(cum/sampling);
    sample_id = id#bucket."""
    require_columns(df, id_col, ts_col)
    w = Window.partitionBy(id_col).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0)
    if weight_col is None:
        first_ts = F.first(ts_col).over(w)
        cum = F.col(ts_col) - first_ts
    else:
        cum = F.sum(weight_col).over(w)
    bucket = F.floor(cum / F.lit(sampling))
    return df.withColumn(out_col,
                         F.concat_ws("#", F.col(id_col), bucket.cast("string")))
