"""Keyed, time-ordered sessionization — the reference's core engine.

Rebuilt semantics:
- ``with_state_id`` — forward-fill session ids from boundary rows
  (``timeseries/WithStateId.scala:41-51``: set id at boundaries, then
  ``last(ignoreNulls).over(w)`` fills forward);
- ``with_state_change_boundaries`` — change-point detection
  (``timeseries/WithStateIdOnStateChangeOrUnique.scala:43-53``:
  ``lag(state) != state OR lag isNull``);
- ``with_gap_sessions`` — gap-based sessionization (new session when the
  time delta to the previous observation exceeds a threshold — the flow
  fragment GAP notion, ``fragments/FlowFragmentMapper.scala:104``);
- ``update_id_to_span`` — rewrite a session id to ``id#start_end`` once the
  span is known (``timeseries/IdUpdater.scala:41-53``).

All are single-window expressions: one hash exchange on the object id, sort
by timestamp, no Python. Consecutive operators reuse the SAME
(partitionBy id, orderBy ts) spec so Catalyst reuses the exchange — the
reference does this deliberately across ~15 files (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arlas_proc_spark.operators.base import require_columns


def _w(id_col: str, ts_col: str):
    return Window.partitionBy(id_col).orderBy(ts_col)


def with_state_change_boundaries(df: DataFrame, id_col: str, ts_col: str,
                                 state_col: str, out_col: str = "is_boundary") -> DataFrame:
    """True where a key's state differs from its previous row (or first row)."""
    require_columns(df, id_col, ts_col, state_col)
    prev = F.lag(state_col, 1).over(_w(id_col, ts_col))
    return df.withColumn(out_col, prev.isNull() | (prev != F.col(state_col)))


def with_state_id(df: DataFrame, id_col: str, ts_col: str, state_col: str,
                  out_col: str = "state_id") -> DataFrame:
    """Session id per contiguous same-state run: ``id#<start_ts>``.

    Boundary rows get a candidate id; last(ignoreNulls) forward-fills it
    across the run (the reference's exact trick, WithStateId.scala:41-51).
    """
    df = with_state_change_boundaries(df, id_col, ts_col, state_col, "_b")
    w = _w(id_col, ts_col)
    candidate = F.when(
        F.col("_b"),
        F.concat_ws("#", F.col(id_col), F.col(ts_col).cast("string")))
    return (df.withColumn("_cand", candidate)
            .withColumn(out_col, F.last("_cand", ignorenulls=True).over(w))
            .drop("_b", "_cand"))


def with_gap_sessions(df: DataFrame, id_col: str, ts_col: str,
                      gap: float, out_col: str = "session_id") -> DataFrame:
    """New session when ts - lag(ts) > gap. Expressed as a running count of
    boundary flags (cumulative sum over the key window) — no forward-fill
    string column needed, stays numeric."""
    require_columns(df, id_col, ts_col)
    w = _w(id_col, ts_col)
    prev_ts = F.lag(ts_col, 1).over(w)
    is_new = F.when(prev_ts.isNull() | ((F.col(ts_col) - prev_ts) > gap), 1).otherwise(0)
    sess_n = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(
        out_col, F.concat_ws("#", F.col(id_col), sess_n.cast("string")))


def update_id_to_span(df: DataFrame, session_col: str, id_col: str,
                      start_col: str, end_col: str) -> DataFrame:
    """Rewrite session id to ``id#tsStart_tsEnd`` using the session's full
    span — first/last over the unbounded session window
    (IdUpdater.scala:41-53; also WithDurationFromId.scala:41-48)."""
    require_columns(df, session_col, id_col, start_col, end_col)
    w = Window.partitionBy(session_col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    return df.withColumn(
        session_col,
        F.concat_ws("#", F.col(id_col),
                    F.concat_ws("_", F.min(start_col).over(w).cast("string"),
                                F.max(end_col).over(w).cast("string"))))


def with_forward_fill(df: DataFrame, id_col: str, ts_col: str, col: str,
                      out_col: str | None = None, default=None) -> DataFrame:
    """Null gap-fill from the latest preceding non-null sibling, with
    optional default (reference: StaticColumnsStandardizer.scala:40-53 uses
    first(ignoreNulls) over the whole partition; this is the ordered
    variant)."""
    w = _w(id_col, ts_col).rowsBetween(Window.unboundedPreceding, 0)
    filled: Column = F.last(col, ignorenulls=True).over(w)
    if default is not None:
        filled = F.coalesce(filled, F.lit(default))
    return df.withColumn(out_col or col, filled)
