"""As-of (temporal) join — the canonical CDC-consumer query: attach to
each fact row the most recent dimension version at the fact's time
(right_ts <= left_ts, per key).

Spark has no native ASOF JOIN. A range join (l.key = r.key AND r.ts <=
l.ts) + max-per-row explodes to O(facts × versions-per-key) before the
aggregate prunes it — unusable when hot keys carry thousands of
versions. The union-and-fill formulation here is the scalable shape:

    tag lefts and rights, union them, sort within each key by (ts, tag)
    with rights first on ties, forward-fill the last right payload with
    last(ignoreNulls) over an unbounded-preceding frame, keep the lefts.

ONE shuffle (the window partition), no row multiplication, whole-stage
codegen except the window itself. At 100 TB both sides shuffle on the
join key exactly once — the same cost profile as a regular sort-merge
join — and skew behaves like any keyed window (salt upstream if one key
dominates). Reference analog: the engine's forward-fill session id
(`sessionize.py`, W7) is this same fill over a single frame;
ASOF generalizes it to two frames.

DuckDB's native ASOF JOIN (inclusive, backward) is the oracle shape —
see __spark_entry__.oracle_sql()["asof_enrich"].
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arlas_proc_spark.operators.base import require_columns


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str | None = None, *,
              right_cols: list[str] | None = None,
              direction: str = "backward",
              suffix: str = "_asof") -> DataFrame:
    """Left as-of join (inclusive): for every left row, the nearest
    right row per key — ``backward`` (default) = greatest right_ts <=
    left_ts (DuckDB ``ASOF LEFT JOIN ... ON l.ts >= r.ts``), ``forward``
    = smallest right_ts >= left_ts (``ON l.ts <= r.ts``); nulls where no
    right row qualifies. Forward is the same fill mirrored: first
    (ignoreNulls) over the FOLLOWING frame, lefts sorting before rights
    on ties so an exactly-coincident version still matches.

    ``right_cols`` defaults to every right column except the keys and
    timestamp. Attached columns are renamed with ``suffix`` on collision
    with a left column. Ties: a right row AT left_ts matches in both
    directions; several right rows sharing (key, right_ts) make the pick
    arbitrary — version feeds should keep (key, ts) unique, like any
    SCD source."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', "
                         f"got {direction!r}")
    right_ts = right_ts or left_ts
    require_columns(left, *on, left_ts)
    require_columns(right, *on, right_ts)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in set(on) | {right_ts}]
    if not right_cols:
        raise ValueError("right side has no payload columns to attach")
    out_names = {c: (c + suffix if c in left.columns else c)
                 for c in right_cols}

    r = right.select(
        *on, F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_is_left"),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("_rpay"))
    # both payloads travel as structs: unionByName needs identical
    # schemas, and structs carry arbitrary columns without name mangling
    l_ = left.select(
        *on, F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        F.struct(*[F.col(c).alias(c) for c in left.columns]).alias("_lpay"))
    r = r.withColumn("_lpay", F.lit(None).cast(l_.schema["_lpay"].dataType))
    u = l_.unionByName(r.select(*l_.columns))
    if direction == "backward":
        # rights first on ties (0 < 1): an exactly-coincident version
        # lands inside the unbounded-preceding frame
        w = (Window.partitionBy(*on).orderBy(F.col("_ats").asc(),
                                             F.col("_is_left").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        fill = F.last("_rpay", ignorenulls=True).over(w)
    else:
        # mirrored: lefts first on ties (desc: 1 before 0), nearest
        # following version via first(ignoreNulls)
        w = (Window.partitionBy(*on).orderBy(F.col("_ats").asc(),
                                             F.col("_is_left").desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        fill = F.first("_rpay", ignorenulls=True).over(w)
    filled = u.withColumn("_fill", fill)
    out = filled.where(F.col("_is_left") == 1)
    return out.select(
        *[F.col(f"_lpay.{c}").alias(c) for c in left.columns],
        *[F.col(f"_fill.{c}").alias(out_names[c]) for c in right_cols])
