"""Snapshot tags (Iceberg tag refs): pin a version by name; tagged
manifests and their data files survive expire_snapshots until the tag
drops — the freeze mechanism for released table/corpus versions."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from arlas_proc_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("seq", T.LongType(), True),
    T.StructField("content", T.StringType(), True),
])


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "seq long, op string, repo string, path string, commit string, "
        "content string",
    ).select("repo", "path", "commit", "seq", "content", "op")


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=2)
    t.merge_batch(_batch(spark, [
        (1, "insert", "rA", "a.py", "c1", "v1")]), 0)       # v1
    return t


def test_tag_read_drop(spark, table):
    t = table
    assert t.set_tag("release-1") == {"tag": "release-1", "version": 1}
    t.merge_batch(_batch(spark, [
        (2, "update", "rA", "a.py", "c2", "v2")]), 1)
    assert [r.content for r in t.read_tag("release-1").collect()] == ["v1"]
    assert [r.content for r in t.read().collect()] == ["v2"]
    assert t.tags() == {"release-1": 1}
    # tag with filters composes with the skipping read path
    assert t.read_tag("release-1", filters=[("seq", ">=", 2)]).count() == 0
    assert t.drop_tag("release-1")["dropped"]
    with pytest.raises(ValueError, match="does not exist"):
        t.read_tag("release-1")
    with pytest.raises(ValueError, match="does not exist"):
        t.drop_tag("release-1")


def test_tag_requires_committed_version(table):
    with pytest.raises(ValueError, match="not found"):
        table.set_tag("nope", version=99)


def test_tagged_snapshot_survives_gc_until_dropped(spark, table):
    t = table
    t.set_tag("pin")                                         # pins v1
    t.overwrite(_batch(spark, [
        (5, "insert", "rB", "b.py", "c5", "new")]).drop("op"), "ow")
    for i in range(2, 5):
        t.merge_batch(_batch(spark, [
            (10 * i, "update", "rB", "b.py", f"c{i}", f"w{i}")]), i)
    t.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
    # the pinned v1 manifest AND its data files are intact
    assert [r.content for r in t.read_tag("pin").collect()] == ["v1"]
    t.drop_tag("pin")
    t.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
    with pytest.raises(ValueError, match="not found"):
        t.read_version(1)
