"""Incremental-rebucket cost profile: is a migration step O(step), and
does ingest latency stay flat while a migration is in progress?

Protocol: one table, N_ROWS uniform keys, 32 buckets. Measure
(a) a full one-shot rebucket(64) on a clone — the monolithic baseline;
(b) begin_rebucket(64) + 8 steps of migrate_buckets(4) — per-step wall;
(c) an identical cow merge batch BEFORE the migration, MID-migration,
    and AFTER finalize — ingest latency must not regress mid-flight.

Run: python BENCH/profile_rebucket.py [n_rows]
"""

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from arlas_proc_spark.config import build_session
from arlas_proc_spark.lake.table import LakeTable

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
BASE = "/tmp/profile_rebucket"


def make(spark, path, rows):
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("seq", T.LongType(), True),
        T.StructField("val", T.StringType(), True),
    ])
    t = LakeTable.create(spark, path, schema, ["k"], "seq", n_buckets=32)
    df = (spark.range(rows).select(
        F.col("id").alias("k"), F.col("id").alias("seq"),
        F.sha1(F.col("id").cast("string")).alias("val"),
        F.lit("insert").alias("op")))
    t.merge_batch(df, 0, assume_all_buckets=True)
    return t


def merge_probe(spark, t, bid, seq0):
    df = (spark.range(N_ROWS // 20).select(
        (F.col("id") * 17 % N_ROWS).alias("k"),
        (F.col("id") + seq0).alias("seq"),
        F.sha1((F.col("id") + seq0).cast("string")).alias("val"),
        F.lit("insert").alias("op")))
    t0 = time.time()
    t.merge_batch(df, bid)
    return time.time() - t0


def main():
    shutil.rmtree(BASE, ignore_errors=True)
    spark = build_session(app_name="profile-rebucket")
    print(f"rows={N_ROWS}  32 -> 64 buckets")

    t = make(spark, f"{BASE}/a", N_ROWS)
    pre = merge_probe(spark, t, "probe-pre", 10 * N_ROWS)

    t.begin_rebucket(64)
    steps = []
    mid = None
    while True:
        t0 = time.time()
        m = t.migrate_buckets(4)
        steps.append(time.time() - t0)
        if len(steps) == 4:
            mid = merge_probe(spark, t, "probe-mid", 20 * N_ROWS)
        if m.get("done"):
            break
    # keep P a multiple of the NEW bucket count for the post probe —
    # the shuffle-once alignment rule (merge_batch docstring) is about
    # session config, not a migration cost; conflating them here would
    # misattribute ~1.5x
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    post = merge_probe(spark, t, "probe-post", 30 * N_ROWS)

    # one-shot comparison LAST: its 2M-row rewrite pollutes session/GC
    # state and would inflate the step measurements above
    clone = make(spark, f"{BASE}/b", N_ROWS)
    t0 = time.time()
    clone.rebucket(64)
    oneshot = time.time() - t0

    a = sorted((r.k, r.seq) for r in t.read().select("k", "seq").collect())
    b = sorted((r.k, r.seq) for r in
               clone.read().select("k", "seq").collect())
    # clone lacks the probe merges; compare counts + spec instead
    assert t.snapshot()["n_buckets"] == 64
    assert clone.snapshot()["n_buckets"] == 64
    assert len(b) == N_ROWS and len(a) >= N_ROWS

    print(f"one-shot rebucket(64):        {oneshot:7.2f}s")
    print(f"incremental steps (4/32 ea):  "
          f"{' '.join(f'{s:.2f}' for s in steps)}")
    print(f"  sum={sum(steps):.2f}s  max={max(steps):.2f}s  "
          f"(per-step vs one-shot: {max(steps) / oneshot:.2f}x)")
    print(f"cow merge probe (N/20 keys): pre={pre:.2f}s  "
          f"mid-migration={mid:.2f}s  post-finalize={post:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
