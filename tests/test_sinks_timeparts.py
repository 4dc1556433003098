"""Sinks, timestamp standardization, and lake compaction."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import types as T

from arlas_proc_spark.lake.table import LakeTable
from arlas_proc_spark.operators.timeparts import (
    with_standard_timestamp,
    with_time_partition,
)
from arlas_proc_spark.sources.sinks import (
    ColumnOverwriteError,
    with_columns_nested,
    with_keyed_doc_id,
    write_csv,
    write_partitioned_parquet,
)


def test_standard_timestamp_with_fallback(spark):
    df = spark.createDataFrame(
        [("2024-01-02T03:04:05+00:00",), ("2024-01-02T03:04:05",), ("garbage",)],
        ["ts"])
    got = [r.epoch_s for r in with_standard_timestamp(df, "ts").collect()]
    assert got[0] == got[1] == 1704164645
    assert got[2] is None  # unparseable → null, never a job failure


def test_time_partition(spark):
    df = spark.createDataFrame([(1704164645,)], ["epoch_s"])
    assert with_time_partition(df, "epoch_s").collect()[0].partition_day == 20240102


def test_keyed_doc_id(spark):
    df = spark.createDataFrame([("obj1", 42)], ["id", "ts"])
    assert with_keyed_doc_id(df, "id", "ts").collect()[0].doc_id == "obj1#42"


def test_with_columns_nested(spark):
    df = spark.createDataFrame([(1, "a", 2.0)], ["x", "y", "z"])
    out = with_columns_nested(df, {"doc": {"meta": {"name": "y"}, "val": "z"}})
    r = out.collect()[0]
    assert r.doc.meta.name == "a" and r.doc.val == 2.0
    with pytest.raises(ColumnOverwriteError):
        with_columns_nested(df, {"x": {"a": "y"}})


def test_write_csv_stringifies_arrays(spark, tmp_path):
    df = spark.createDataFrame([(1, ["a", "b"])], ["id", "tags"])
    write_csv(df, str(tmp_path / "out"), single_file=True)
    files = glob.glob(str(tmp_path / "out" / "*.csv"))
    assert len(files) == 1
    body = open(files[0]).read()
    assert "[a,b]" in body


def test_write_partitioned_parquet(spark, tmp_path):
    df = spark.createDataFrame([(1, 20240101), (2, 20240102)], ["id", "day"])
    write_partitioned_parquet(df, str(tmp_path / "p"), "day", mode="overwrite")
    assert glob.glob(str(tmp_path / "p" / "day=20240101" / "*.parquet"))
    back = spark.read.parquet(str(tmp_path / "p"))
    assert back.count() == 2


SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("seq", T.LongType(), True),
    T.StructField("content", T.StringType(), True),
])


def test_compaction_merges_files_and_gcs_tombstones(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=2)

    def batch(rows):
        return spark.createDataFrame(
            rows, "seq long, op string, repo string, path string, commit string, content string"
        ).select("repo", "path", "commit", "seq", "content", "op")

    # many tiny merges: copy-on-write REPLACES each touched bucket's file
    # list every time, so fragmentation never accumulates across merges —
    # each bucket holds at most shuffle_partitions/n_buckets files (the
    # merge join's output partitions; the shuffle-once write trades the
    # old one-file-per-bucket repartition for one fewer payload shuffle)
    for i in range(6):
        t.merge_batch(batch([(i, "insert", "r", f"f{i}", f"c{i}", f"v{i}")]), i)
    t.merge_batch(batch([(100, "delete", "r", "f0", "cd", None)]), 6)
    state_before = {(r.repo, r.path): r.seq for r in t.read().collect()}
    snap = t.snapshot()
    per_bucket_cap = 4 // 2  # conftest shuffle_partitions=4, n_buckets=2
    assert all(len(fs) <= per_bucket_cap for fs in snap["buckets"].values())

    # force a rewrite of every non-empty bucket to exercise tombstone GC
    m = t.compact(max_files_per_bucket=0, tombstone_horizon_seq=100)
    assert m["compacted_buckets"] >= 1
    snap2 = t.snapshot()
    assert all(len(fs) <= 1 for fs in snap2["buckets"].values() if fs)
    # content unchanged
    assert {(r.repo, r.path): r.seq for r in t.read().collect()} == state_before
    # tombstone at seq 100 was GC'd
    tomb = t.read(with_tombstones=True).where("_tombstone").count()
    assert tomb == 0
    # and a stale insert BELOW the horizon arriving later is ignorable only
    # by watermark contract; above-horizon LWW still works
    t.merge_batch(batch([(101, "insert", "r", "f9", "c9", "v9")]), 7)
    assert t.read().where("path='f9'").count() == 1

def test_write_routed_dynamic_targets(spark, tmp_path):
    """S6 dynamic routed sink: rows land in per-route-value targets via
    ONE partitioned write (the reference's 'my_index_{}' pattern,
    WritableDataFrame.scala:98-107); the route column is excluded from
    the payload."""
    import glob

    from arlas_proc_spark.sources.sinks import write_routed
    df = spark.createDataFrame(
        [(1, "2024-01", "a"), (2, "2024-01", "b"), (3, "2024-02", "c")],
        "id long, month string, v string")
    out = write_routed(df, str(tmp_path / "idx_{}"), "month")
    assert set(out) == {"2024-01", "2024-02"}
    jan = spark.read.parquet(str(tmp_path / "idx_2024-01"))
    assert jan.count() == 2 and "_route" not in jan.columns
    assert spark.read.parquet(str(tmp_path / "idx_2024-02")).count() == 1
    # overwrite semantics per target
    write_routed(df.where("id = 3"), str(tmp_path / "idx_{}"), "month")
    assert spark.read.parquet(str(tmp_path / "idx_2024-02")).count() == 1
    assert glob.glob(str(tmp_path / "idx_2024-01"))  # untouched target kept
    import pytest as _p
    with _p.raises(ValueError, match="must contain"):
        write_routed(df, str(tmp_path / "flat"), "month")
