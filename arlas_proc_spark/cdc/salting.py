"""Skew defense: salting for hot-key aggregations.

The change feed is deliberately skewed (~30% of events hit one repo). Two
defenses, used in different places:

1. **Key-hash bucketing** (lake/table.py): per-key operations partition by
   the full (repo, path) key hash, so a hot *repo* spreads over all buckets
   — no salting needed because the key cardinality inside the repo is high.

2. **Salted two-phase aggregation** (this module): per-*repo* rollups
   (ingest metrics, per-repo stats) would hash-partition by repo alone and
   melt one reducer. ``salted_agg`` does groupBy(repo, salt) partial agg →
   groupBy(repo) final agg — the classic map-side-combine-by-hand for
   re-aggregable functions.

Reference anti-pattern this fixes: ``WithTraversingMission``'s
``reduceByKey(_ ++ _)`` materializing one whole hot key per task
(``timeseries/WithTraversingMission.scala:81-206``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "_salt"


def with_salt(df: DataFrame, n_salts: int = 32, from_cols: list[str] | None = None) -> DataFrame:
    """Append a salt in [0, n_salts). If ``from_cols`` given, the salt is a
    deterministic hash of those columns (so one (repo,path) never splits
    across salts and per-key ordering survives); otherwise round-robin-ish
    via monotonically_increasing_id."""
    if from_cols:
        src: Column = F.xxhash64(*[F.col(c) for c in from_cols])
    else:
        src = F.monotonically_increasing_id()
    return df.withColumn(SALT, F.pmod(src, F.lit(n_salts)))


# aggregates that re-aggregate cleanly: partial name -> (partial fn, final fn)
_REAGG = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(df: DataFrame, group_cols: list[str], aggs: dict[str, tuple[str, str]],
               n_salts: int = 32, salt_from: list[str] | None = None) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: out_name -> (fn_name in {sum,count,min,max}, input_col).
    Phase 1 groups by (group_cols, salt) — hot groups split n_salts ways;
    phase 2 re-aggregates partials by group_cols alone (tiny input).
    """
    salted = with_salt(df, n_salts, from_cols=salt_from)
    partial = salted.groupBy(*group_cols, SALT).agg(*[
        _REAGG[fn][0](c).alias(out) for out, (fn, c) in aggs.items()
    ])
    return partial.groupBy(*group_cols).agg(*[
        _REAGG[fn][1](out).alias(out) for out, (fn, _) in aggs.items()
    ])
