"""Pairwise fragment construction: one row per consecutive observation pair.

Reference analog: ``fragments/FlowFragmentMapper.scala:53-186`` — for each
key ordered by timestamp, lag() pulls the previous observation and the row
becomes a "fragment" carrying start/end timestamps, duration, deltas, and
pairwise rolling stats (``rowsBetween(-1, 0)`` mean/stddev). First row per
key is dropped (no previous point — the whenPreviousPointExists guard
:57-59).

Our payload is generic measures instead of lat/lon: the caller names the
value columns; for each we emit delta + pairwise mean. One window spec =
one shuffle; everything stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arlas_proc_spark.operators.base import require_columns


def with_flow_fragments(df: DataFrame, id_col: str, ts_col: str,
                        value_cols: list[str] | None = None,
                        keep_cols: list[str] | None = None) -> DataFrame:
    """Map observations → flow fragments.

    Output columns:
      track_id         = id#tsStart_tsEnd (FlowFragmentMapper.scala:62-72)
      ts_start, ts_end = lag(ts), ts
      duration         = ts_end - ts_start
      nb_points        = 2 (literal; fragment = a pair)
      <v>_delta        = v - lag(v)
      <v>_avg          = pairwise mean over rowsBetween(-1, 0)
    """
    require_columns(df, id_col, ts_col, *(value_cols or []))
    w = Window.partitionBy(id_col).orderBy(ts_col)
    wpair = w.rowsBetween(-1, 0)
    prev_ts = F.lag(ts_col, 1).over(w)
    cols = [
        F.col(id_col),
        F.concat_ws("#", F.col(id_col),
                    F.concat_ws("_", prev_ts.cast("string"),
                                F.col(ts_col).cast("string"))).alias("track_id"),
        prev_ts.alias("ts_start"),
        F.col(ts_col).alias("ts_end"),
        (F.col(ts_col) - prev_ts).alias("duration"),
        F.lit(2).alias("nb_points"),
    ]
    for v in value_cols or []:
        cols.append((F.col(v) - F.lag(v, 1).over(w)).alias(f"{v}_delta"))
        cols.append(F.avg(v).over(wpair).alias(f"{v}_avg"))
    for k in keep_cols or []:
        cols.append(F.col(k))
    # guard: first row per key has no previous point → drop
    return df.select(*cols).where(F.col("ts_start").isNotNull())


def with_visibility_change(df: DataFrame, id_col: str, ts_col: str,
                           gap: float, out_col: str = "visibility_change") -> DataFrame:
    """Tag appear / disappear / appear_disappear around gaps
    (features/WithVisibilityChange.scala:48-69): a row 'appears' if the gap
    to the previous observation exceeds `gap` (or is first), 'disappears'
    if the gap to the next one does (or is last)."""
    require_columns(df, id_col, ts_col)
    w = Window.partitionBy(id_col).orderBy(ts_col)
    prev_ts, next_ts = F.lag(ts_col, 1).over(w), F.lead(ts_col, 1).over(w)
    appear = prev_ts.isNull() | ((F.col(ts_col) - prev_ts) > gap)
    disappear = next_ts.isNull() | ((next_ts - F.col(ts_col)) > gap)
    return df.withColumn(
        out_col,
        F.when(appear & disappear, "appear_disappear")
         .when(appear, "appear")
         .when(disappear, "disappear"))


def with_moving_state(df: DataFrame, id_col: str, ts_col: str, speed_col: str,
                      still_threshold: float, gap: float,
                      out_col: str = "moving_state") -> DataFrame:
    """Rule-based STILL/MOVE/GAP tagging (the deterministic stand-in for the
    reference's HMM path when no model is supplied; states from
    ArlasTransformerColumns.scala:223-227)."""
    require_columns(df, id_col, ts_col, speed_col)
    w = Window.partitionBy(id_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col, 1).over(w)
    return df.withColumn(
        out_col,
        F.when(prev_ts.isNotNull() & ((F.col(ts_col) - prev_ts) > gap), "GAP")
         .when(F.col(speed_col) <= still_threshold, "STILL")
         .otherwise("MOVE"))
