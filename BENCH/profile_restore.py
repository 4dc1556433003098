"""RESTORE cost vs table size: the commit is metadata-only (old
per-bucket manifests carried forward by content-addressed reference),
so wall time must be CONSTANT in row count — the property that makes
"undo the bad deploy" a seconds-grade operation on a 100-TB table,
where Delta/Iceberg's equivalent is likewise a metadata swap and any
data-copying undo would be hours.

Builds tables at two sizes (SMALL/LARGE rows, same bucket count), takes
a restore point, merges an "incident" batch on top, then measures
``restore(v_good)`` + re-restore forward, min-of-R interleaved across
sizes. Also sanity-checks the restored row count each time.

Run: python BENCH/profile_restore.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from arlas_proc_spark.config import build_session  # noqa: E402
from arlas_proc_spark.lake.table import LakeTable  # noqa: E402

SMALL = 1_000_000
LARGE = 16_000_000
B = 32
REPS = 3

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("seq", T.LongType(), True),
    T.StructField("content", T.StringType(), True),
])


def _build(spark, tmp, n_rows):
    t = LakeTable.create(spark, os.path.join(tmp, f"t{n_rows}"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=B)
    batch = (spark.range(n_rows)
             .select((F.col("id") % 500).cast("string").alias("repo"),
                     F.col("id").cast("string").alias("path"),
                     F.lit(1).cast("long").alias("seq"),
                     F.sha1(F.col("id").cast("string")).alias("content"),
                     F.lit("insert").alias("op")))
    t.merge_batch(batch, "base")
    v_good = t.snapshot()["version"]
    incident = (spark.range(n_rows // 100)
                .select((F.col("id") % 500).cast("string").alias("repo"),
                        F.col("id").cast("string").alias("path"),
                        F.lit(2).cast("long").alias("seq"),
                        F.lit(None).cast("string").alias("content"),
                        F.lit("delete").alias("op")))
    t.merge_batch(incident, "incident")
    return t, v_good


def main() -> None:
    spark = build_session(app_name="profile_restore", master="local[8]",
                          shuffle_partitions=B)
    tmp = tempfile.mkdtemp(prefix="restore_")
    tables = {n: _build(spark, tmp, n) for n in (SMALL, LARGE)}
    walls = {n: [] for n in tables}
    for _ in range(REPS):
        for n, (t, v_good) in tables.items():
            v_bad = t.snapshot()["version"]
            t0 = time.time()
            t.restore(v_good)
            walls[n].append(time.time() - t0)
            assert t.count_rows() == n
            t.restore(v_bad)  # forward again for the next rep
    out = {f"restore_wall_s_{n}": round(min(w), 3)
           for n, w in walls.items()}
    out["size_ratio"] = LARGE / SMALL
    out["wall_ratio"] = round(min(walls[LARGE]) / min(walls[SMALL]), 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
