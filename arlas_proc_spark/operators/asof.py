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
              suffix: str = "_asof") -> DataFrame:
    """Left as-of-backward join (inclusive): for every left row, the
    right row with the greatest right_ts <= left_ts for the same key;
    nulls where no right row precedes. Matches DuckDB ``ASOF LEFT JOIN
    ... ON l.k = r.k AND l.ts >= r.ts``.

    ``right_cols`` defaults to every right column except the keys and
    timestamp. Attached columns are renamed with ``suffix`` on collision
    with a left column. Ties: a right row AT left_ts matches (rights
    sort before lefts at equal ts); several right rows sharing (key,
    right_ts) make the pick arbitrary — version feeds should keep
    (key, ts) unique, like any SCD source."""
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
    w = (Window.partitionBy(*on).orderBy(F.col("_ats").asc(),
                                         F.col("_is_left").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = u.withColumn("_fill", F.last("_rpay", ignorenulls=True).over(w))
    out = filled.where(F.col("_is_left") == 1)
    return out.select(
        *[F.col(f"_lpay.{c}").alias(c) for c in left.columns],
        *[F.col(f"_fill.{c}").alias(out_names[c]) for c in right_cols])
