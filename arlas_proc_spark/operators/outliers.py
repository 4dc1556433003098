"""Local outlier detection over keyed, ordered series.

Reference: ``filter/LocalOutliersRemover.scala:50-78`` — Hampel-style
filter: centered window ``rowsBetween(-k, k)``, median via
``sort_array(collect_list(col))[i]`` (:72-77), flag when the value strays
from the rolling median; ``filter/WithoutIdentifiedOutliers.scala:33-39``
then drops flagged rows; ``filter/WithOutlierPropagated.scala`` spreads the
flag to neighbors.

We keep the exact median mechanics (sorted collect_list, lower median) so
the semantics are reproducible in any SQL engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arlas_proc_spark.operators.base import require_columns


def rolling_lower_median(col: str, w) -> F.Column:
    """Lower median over a window frame: sort_array(collect_list(c))[(n+1)/2]
    (1-indexed) — the reference's median idiom, portable to any engine."""
    arr = F.sort_array(F.collect_list(F.col(col)).over(w))
    return F.element_at(arr, ((F.size(arr) + 1) / 2).cast("int"))


def with_local_outliers(df: DataFrame, id_col: str, ts_col: str, value_col: str,
                        k: int = 2, threshold: float = 3.0,
                        flag_col: str = "is_outlier") -> DataFrame:
    """Flag rows whose value deviates from the centered rolling median
    (window ±k rows) by more than ``threshold`` (absolute units)."""
    require_columns(df, id_col, ts_col, value_col)
    w = Window.partitionBy(id_col).orderBy(ts_col).rowsBetween(-k, k)
    med = rolling_lower_median(value_col, w)
    return df.withColumn("_med", med).withColumn(
        flag_col, F.abs(F.col(value_col) - F.col("_med")) > threshold).drop("_med")


def without_outliers(df: DataFrame, flag_col: str = "is_outlier") -> DataFrame:
    """filter(not(flag)).drop(flag) (WithoutIdentifiedOutliers.scala:33-39)."""
    return df.where(~F.coalesce(F.col(flag_col), F.lit(False))).drop(flag_col)


def outliers_to_store(df: DataFrame, id_col: str, ts_col: str | list[str],
                      value_col: str, flag_col: str = "is_outlier",
                      span_col: str = "neighbor_span") -> DataFrame:
    """Keep ONLY flagged rows, enriched with neighbor context — the side
    frame a pipeline WRITES to a separate store instead of silently
    dropping (reference ``filter/WithOutliersToStore.scala:40-94``: the
    outlier keeps a trail linking its previous/next neighbor locations;
    payload re-targeted here, the 'trail' is the prev→value→next span,
    null unless BOTH neighbors exist, exactly the reference's
    lag/lead-guard semantics).

    Composition contract: run BEFORE ``without_outliers`` on the same
    frame; write this result to the quarantine store, then drop.

    ``ts_col`` may be a LIST of columns when the primary timestamp is
    not unique per key (pass a tiebreaker, e.g. ["ts", "event_id"]) —
    lag/lead over a tied ordering is otherwise nondeterministic."""
    order_cols = [ts_col] if isinstance(ts_col, str) else list(ts_col)
    require_columns(df, id_col, *order_cols, value_col, flag_col)
    w = Window.partitionBy(id_col).orderBy(*order_cols)
    prev_v, next_v = F.lag(value_col).over(w), F.lead(value_col).over(w)
    prev_t = F.lag(order_cols[0]).over(w)
    next_t = F.lead(order_cols[0]).over(w)
    span = F.when(
        prev_t.isNotNull() & next_t.isNotNull(),
        F.concat(prev_v.cast("string"), F.lit(" -> "),
                 F.col(value_col).cast("string"), F.lit(" -> "),
                 next_v.cast("string")))
    return (df.withColumn(span_col, span)
            .withColumn("_prev_value", prev_v)
            .withColumn("_next_value", next_v)
            .where(F.coalesce(F.col(flag_col), F.lit(False)))
            .withColumnsRenamed({"_prev_value": "prev_value",
                                 "_next_value": "next_value"}))


def with_outlier_propagated(df: DataFrame, id_col: str, ts_col: str,
                            flag_col: str = "is_outlier", reach: int = 1) -> DataFrame:
    """Spread an outlier flag to ±reach neighbors (WithOutlierPropagated.scala:
    45-83 uses lag/lead offsets 1-3)."""
    w = Window.partitionBy(id_col).orderBy(ts_col)
    spread = F.coalesce(F.col(flag_col), F.lit(False))
    for i in range(1, reach + 1):
        spread = (spread |
                  F.coalesce(F.lag(flag_col, i).over(w), F.lit(False)) |
                  F.coalesce(F.lead(flag_col, i).over(w), F.lit(False)))
    return df.withColumn(flag_col, spread)
