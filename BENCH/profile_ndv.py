"""NDV A/B: metadata-only ``LakeTable.ndv()`` (HLL sketch sidecars) vs
the scan it replaces (exact ``countDistinct`` over the table).

Builds one table with ``sketch_cols`` enabled, folds N_ROWS rows in
N_BATCHES cow merges (so sketches accumulate per commit, with rewritten
buckets' stale sketches left behind for the liveness join to ignore —
the realistic maintenance state), then measures, interleaved min-of-R:

- ndv() wall: reads ONLY the stats/ sidecars + manifest file list
  (O(live files x sketch cols) metadata rows)
- scan wall: countDistinct over a full table read (what a planner
  without stats must pay)
- estimate accuracy vs the exact counts (lgK=12 HLL: ~1.6% typical)

At 100 TB the gap is structural, not a constant: the scan is O(table
bytes) while ndv() is O(file count) metadata — the same reason Iceberg
puts theta sketches in puffin files instead of re-scanning.

Run: python BENCH/profile_ndv.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from arlas_proc_spark.config import build_session  # noqa: E402
from arlas_proc_spark.lake.table import LakeTable  # noqa: E402

N_ROWS = 16_000_000
N_BATCHES = 8
B = 32
REPS = 3

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("seq", T.LongType(), True),
    T.StructField("lang", T.StringType(), True),
])


def main() -> None:
    spark = build_session(app_name="profile_ndv", master="local[8]",
                          shuffle_partitions=B)
    tmp = tempfile.mkdtemp(prefix="ndv_")
    t = LakeTable.create(spark, os.path.join(tmp, "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=B,
                         sketch_cols=["commit", "lang"])
    per = N_ROWS // N_BATCHES
    for i in range(N_BATCHES):
        batch = (spark.range(i * per, (i + 1) * per)
                 .select((F.col("id") % 5000).cast("string").alias("repo"),
                         F.concat(F.lit("p"), (F.col("id") % 3_200_000)
                                  .cast("string")).alias("path"),
                         F.concat(F.lit("c"), F.col("id").cast("string"))
                         .alias("commit"),
                         F.col("id").alias("seq"),
                         (F.col("id") % 37).cast("string").alias("lang"),
                         F.lit("insert").alias("op")))
        t.merge_batch(batch, i)

    def _ndv():
        return t.ndv(["commit", "lang"])

    def _scan():
        r = (t.read().agg(
            F.countDistinct("commit").alias("commit"),
            F.countDistinct("lang").alias("lang")).collect()[0])
        return {"commit": r["commit"], "lang": r["lang"]}

    walls = {"ndv": [], "scan": []}
    est = exact = None
    for _ in range(REPS):
        for name, fn in (("ndv", _ndv), ("scan", _scan)):
            t0 = time.time()
            out = fn()
            walls[name].append(time.time() - t0)
            if name == "ndv":
                est = out
            else:
                exact = out
    live = est["commit"]["live_files"]
    print(f"table: {N_ROWS} rows, {N_BATCHES} cow merges, {B} buckets, "
          f"{live} live files (all covered: "
          f"{all(v['covered_files'] == v['live_files'] for v in est.values())})")
    for c in ("commit", "lang"):
        err = abs(est[c]["ndv"] - exact[c]) / max(exact[c], 1)
        print(f"  {c}: ndv()={est[c]['ndv']} exact={exact[c]} "
              f"rel_err={err:.4f}")
    nd, sc = min(walls["ndv"]), min(walls["scan"])
    print(f"wall (min of {REPS}, interleaved): ndv {nd:.3f}s  "
          f"scan {sc:.3f}s  speedup {sc / nd:.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
