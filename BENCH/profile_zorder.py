"""Z-order vs linear clustering: file-level pruning on the SECOND
cluster column (the dimension lexicographic sort cannot serve).

Protocol: a 2-D uniform grid (x, y) of ``--rows`` rows lands in one
table per mode; a full re-layout (rebucket, same count) clusters on
(x, y) linear vs zorder with ``--file-rows`` rows per file; then an
x-only AND a y-only range filter (each selecting ~1/8 of the rows) run
through ``read(filters=...)`` and we report files scanned + rows + wall
per dimension.

Expectation at any scale: linear prunes the FIRST cluster column only —
the y filter scans EVERY file (each file spans the full y range);
zorder scans a small fraction on BOTH dimensions (the z-curve spends
one extra leading bit on whichever column leads a round, so the two
dimensions' ratios differ ~2×, neither degenerates). The absolute wall
is noise-bound at profile sizes — the IO ratio is the result, as with
profile_lookup.py.

Run: python BENCH/profile_zorder.py [--rows 100000] [--file-rows 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from arlas_proc_spark.config import build_session  # noqa: E402
from arlas_proc_spark.lake.table import LakeTable  # noqa: E402

SCHEMA = T.StructType([
    T.StructField("k", T.LongType(), False),
    T.StructField("seq", T.LongType(), True),
    T.StructField("x", T.LongType(), True),
    T.StructField("y", T.LongType(), True),
])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--file-rows", type=int, default=4096)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()
    side = int(args.rows ** 0.5)
    spark = build_session(master=f"local[{args.cpus}]",
                          shuffle_partitions=args.cpus)
    base = tempfile.mkdtemp(prefix="zorder_prof_")
    grid = (spark.range(side * side)
            .select(F.col("id").alias("k"), F.col("id").alias("seq"),
                    (F.col("id") % side).alias("x"),
                    (F.col("id") / side).cast("long").alias("y"),
                    F.lit("insert").alias("op")))
    lo, hi = side // 2, side // 2 + side // 8
    out: dict = {"rows": side * side, "grid_side": side,
                 "file_rows": args.file_rows,
                 "band_filter": [lo, hi], "modes": {}}
    for mode in ("linear", "zorder"):
        t = LakeTable.create(spark, os.path.join(base, mode), SCHEMA,
                             ["k"], "seq", n_buckets=4)
        t.append_batch(grid, 0)
        t0 = time.time()
        t.rebucket(4, cluster_by=["x", "y"], cluster_mode=mode,
                   target_rows_per_file=args.file_rows)
        layout_s = time.time() - t0
        total = sum(len(fs) for fs in t.snapshot()["buckets"].values())
        m = {"files_total": total, "layout_s": round(layout_s, 3)}
        for dim in ("x", "y"):
            t0 = time.time()
            hit = t.read(filters=[(dim, ">=", lo), (dim, "<", hi)])
            n = hit.count()
            m[dim] = {"files_scanned": len(hit.inputFiles()),
                      "rows_hit": n, "scan_s": round(time.time() - t0, 3)}
            assert n == (hi - lo) * side
        out["modes"][mode] = m
    for dim in ("x", "y"):
        lin = out["modes"]["linear"][dim]["files_scanned"]
        zo = out["modes"]["zorder"][dim]["files_scanned"]
        out[f"scan_io_ratio_{dim}"] = round(lin / max(zo, 1), 2)
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
