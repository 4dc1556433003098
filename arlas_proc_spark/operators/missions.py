"""Mission-style run segmentation: per-key sequential scan with
data-dependent resets, as an Arrow-batched grouped-map kernel.

Reference analog: ``timeseries/WithTraversingMission.scala:81-206`` — per
object id, courses are scanned in time order; a running "mission" keeps
growing while the distance from the mission's departure point to each
course's arrival keeps increasing, and a new mission starts the moment that
distance shrinks. The state (the mission's start point) resets at every
boundary, and each boundary depends on all previous ones — NOT expressible
as window functions (the anchor is a function of the segmentation itself).

The reference implements this as a full RDD escape:
``repartition(id) → map → reduceByKey(_ ++ _) → per-key List sort + scan →
createDataFrame`` — materializing every key's entire history as JVM
``List[Map[String, Any]]`` (the explicit 10^10-row anti-pattern, SURVEY §3).

Spark-first rebuild: ``applyInPandas`` over ``groupBy(id)`` — Arrow ships
each key's rows to Python as ONE columnar batch, a numpy scan assigns run
ids, and the result streams back through Arrow. No per-row Python
serialization, no driver collect, shuffle only on the key. The operator is
payload-generic: ``measure_col`` plays the role of the geo distance — a run
continues while ``|measure - measure(run_start)|`` is non-decreasing.

Scale note: group size = rows per key at COURSE grain (dozens), not raw
event grain; the reference makes the same assumption. Keys distribute
across executors; a numpy scan on a few-thousand-row group is microseconds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from arlas_proc_spark.operators.base import require_columns


def _assign_runs(ts: np.ndarray, measure: np.ndarray, key: str) -> list[str]:
    """Sequential scan (WithTraversingMission.scala:95-140 recast): new run
    when the absolute progress from the run's first row decreases.

    NaN measures ride along in the current run WITHOUT updating the
    progress state: an unguarded NaN would poison every later comparison
    (x < NaN is always False), permanently gluing all subsequent missions
    into one."""
    run_ids: list[str] = []
    run_start_measure = 0.0
    run_start_ts = 0
    prev_progress = -np.inf
    for i in range(len(ts)):
        if i > 0 and np.isnan(measure[i]):
            run_ids.append(f"{key}#{run_start_ts}")
            continue
        progress = abs(measure[i] - run_start_measure) if i else None
        if i == 0 or progress < prev_progress:
            run_start_measure = 0.0 if np.isnan(measure[i]) else measure[i]
            run_start_ts = ts[i]
            prev_progress = 0.0
        else:
            prev_progress = progress
        run_ids.append(f"{key}#{run_start_ts}")
    return run_ids


def with_monotonic_runs(df: DataFrame, id_col: str, ts_col: str,
                        measure_col: str, out_col: str = "mission_id") -> DataFrame:
    """Assign ``id#run_start_ts`` run ids via the traversing-mission rule."""
    require_columns(df, id_col, ts_col, measure_col)
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out_col, StringType(), True)])

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        key = str(pdf[id_col].iloc[0])
        pdf[out_col] = _assign_runs(
            pdf[ts_col].to_numpy(), pdf[measure_col].to_numpy(dtype=float), key)
        return pdf

    return df.groupBy(id_col).applyInPandas(scan, schema=out_schema)


def mission_summary(df: DataFrame, id_col: str, ts_col: str, measure_col: str,
                    mission_col: str = "mission_id") -> DataFrame:
    """Run segmentation + per-mission rollup (n rows, time span, net
    measure progress) — the mission-grain output entity (SURVEY §1.1)."""
    runs = with_monotonic_runs(df, id_col, ts_col, measure_col, mission_col)
    return runs.groupBy(mission_col).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_legs"),
        F.min(ts_col).alias("ts_start"),
        F.max(ts_col).alias("ts_end"),
        F.round(F.max(measure_col) - F.min(measure_col), 6).alias("measure_span"))
