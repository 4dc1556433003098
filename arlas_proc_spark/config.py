"""SparkSession factory tuned for the CDC engine.

Defaults follow the public Spark performance guidance: AQE on, Arrow on,
shuffle partitions sized to cores (not the 200 default), UTC session tz.

Note: ``getOrCreate`` returns any ALREADY-RUNNING session unchanged —
master, driver memory, and shuffle width from a prior ``build_session``
win (standard Spark semantics). One JVM per parallelism level; the bench
scripts spawn a fresh process per level for exactly this reason.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "arlas_proc_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    # in local[N], shuffle width = cores is the right default
    n_threads = cpus if master == "local[*]" else _master_threads(master, cpus)
    shuffle_partitions = shuffle_partitions or max(n_threads, 4)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # no-data micro-batches exist only to advance the watermark for
        # state eviction; the ingest's dedup emits rows immediately and the
        # merge's LWW never depends on eviction, so the extra empty batch
        # (measured 1.3-4 s: a state-store scan + an empty-ledger snapshot
        # commit per drain) buys nothing here
        .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
        # state-store full snapshots are expensive relative to deltas at
        # micro-batch cadence; take them an order of magnitude less often
        .config("spark.sql.streaming.stateStore.minDeltasForSnapshot", "30")
        .config("spark.ui.enabled", "false")
        # local mode = driver-only: the heap must hold every concurrent
        # task's agg/sort state, so size it to the host, not the default 1g
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _master_threads(master: str, default: int) -> int:
    if master.startswith("local[") and master.endswith("]"):
        inner = master[6:-1]
        if inner == "*":
            return os.cpu_count() or default
        try:
            return int(inner)
        except ValueError:
            return default
    return default
