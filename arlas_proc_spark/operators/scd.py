"""SCD type-2 history — the other canonical CDC-consumer shape: turn an
ordered change feed into a dimension history table where every version
carries a [valid_from, valid_to) window and the open-ended latest
version is flagged current. The asof_join twin consumes exactly this
shape (fact.ts in [valid_from, valid_to)).

Pure window expressions: one hash-partitioned window per key, lead()
for the closing edge — the same cost profile as any keyed window at
100 TB. Deterministic given unique (key, ts) per version (dedupe exact
redeliveries upstream; the change feed's duplicate deliveries are
byte-identical, so a distinct() suffices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arlas_proc_spark.operators.base import require_columns


def scd2_history(df: DataFrame, keys: list[str], ts_col: str, *,
                 out_from: str = "valid_from", out_to: str = "valid_to",
                 current_col: str = "is_current") -> DataFrame:
    """Each key's versions ordered by ts_col become rows with
    ``valid_from`` = own ts, ``valid_to`` = next version's ts (null for
    the open current version), ``is_current`` = valid_to IS NULL.
    Ties on (key, ts) violate the version contract and make the window
    order arbitrary — keep (key, ts) unique upstream."""
    require_columns(df, *keys, ts_col)
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    nxt = F.lead(F.col(ts_col)).over(w)
    return (df.withColumn(out_from, F.col(ts_col))
              .withColumn(out_to, nxt)
              .withColumn(current_col, nxt.isNull()))
