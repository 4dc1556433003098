"""spark-submit child for the standalone-cluster scaling run: replay a
deterministic change feed through the full engine (LWW compact → Arrow
sha256 → bucketed snapshot MERGE) on whatever cluster the submitter
provides, print one RESULT line.

Submitted as:
    spark-submit --master spark://127.0.0.1:7077 \
        --py-files /tmp/arlas_proc_spark.zip \
        BENCH/cluster_replay_child.py <n_events> <reps> <buckets> <slices>

The package import works on the driver via the repo path and on the
executors via --py-files (the north rule's deployment mode).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

from arlas_proc_spark.cdc.engine import CdcEngine  # noqa: E402
from arlas_proc_spark.sources.changefeed import changefeed_df  # noqa: E402


def main() -> None:
    n_events, reps = int(sys.argv[1]), int(sys.argv[2])
    n_buckets, slices = int(sys.argv[3]), int(sys.argv[4])
    GEN = dict(n_repos=200, files_per_repo=2000)  # ~400k keys
    spark = SparkSession.builder.appName("cluster-scale").getOrCreate()
    sc = spark.sparkContext
    # shuffle partitions track the granted cores (a multiple of the
    # bucket count keeps the shuffle-once write alignment)
    cores = int(sc.getConf().get("spark.cores.max", "8"))
    spark.conf.set("spark.sql.shuffle.partitions",
                   str(max(n_buckets, cores)))
    root = tempfile.mkdtemp(prefix="clusterscale_")

    def replay(tag: str, n: int):
        eng = CdcEngine(spark, f"{root}/{tag}", n_buckets=n_buckets,
                        collect_metrics=False)
        feed = changefeed_df(spark, n, parallelism=slices, **GEN)
        t0 = time.time()
        eng.replay(feed)
        return time.time() - t0, eng

    replay("warm", 200_000)  # compile codegen/JIT/Arrow paths untimed

    # the actual executor fleet that served the job (driver excluded)
    try:
        n_execs = sc._jsc.sc().getExecutorMemoryStatus().size() - 1
    except Exception:
        n_execs = -1

    best, rows = 1e18, None
    for r in range(reps):
        dt, eng = replay(f"t{r}", n_events)
        best = min(best, dt)
        rows = eng.state().count()
    shutil.rmtree(root, ignore_errors=True)
    print("RESULT " + json.dumps({
        "cores_max": cores, "n_executors": n_execs,
        "wall_s": round(best, 2),
        "events_per_sec": round(n_events / best, 1), "rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
