"""Write-audit-publish (Iceberg WAP): merge_batch(wap_id=...) stages a
fully-built snapshot without moving CURRENT; read_wap audits it;
publish_wap atomically promotes it (CAS against the staged parent);
abandon_wap drops it and GC reclaims its files. Exactly-once composes:
an unpublished batch id stays unledgered, so conflict → re-merge never
double-applies."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from arlas_proc_spark.lake.table import ConcurrentCommitError, LakeTable

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("seq", T.LongType(), True),
    T.StructField("content", T.StringType(), True),
])


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, op string, repo string, path string, content string"
    ).select("repo", "path", "seq", "content", "op")


def _make(spark, tmp_path, **kw):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=4, **kw)
    t.merge_batch(_batch(spark, [
        (i, "insert", f"r{i % 3}", f"f{i}.py", f"v{i}") for i in range(12)
    ]), 0)
    return t


def test_stage_audit_publish(spark, tmp_path):
    t = _make(spark, tmp_path)
    v0 = t.snapshot()["version"]
    m = t.merge_batch(_batch(spark, [
        (100, "insert", "r9", "new.py", "x"),
        (101, "delete", "r0", "f0.py", None)]), 1, wap_id="audit-1")
    assert m["staged_wap"] == "audit-1"
    # readers still see the pre-merge state
    assert t.snapshot()["version"] == v0
    assert t.read().count() == 12
    # the audit sees the staged state
    staged = t.read_wap("audit-1")
    assert staged.count() == 12  # +1 insert, -1 delete
    assert staged.where("repo = 'r9'").count() == 1
    assert t.wap_ids() == ["audit-1"]
    pub = t.publish_wap("audit-1")
    assert pub["published_version"] == v0 + 1
    assert t.snapshot()["version"] == v0 + 1
    assert t.read().where("repo = 'r9'").count() == 1
    assert t.read().where("path = 'f0.py'").count() == 0
    assert t.wap_ids() == []
    # the published batch id is ledgered: a replay is a no-op
    again = t.merge_batch(_batch(spark, [
        (100, "insert", "r9", "new.py", "x")]), 1)
    assert again["skipped"]


def test_unpublished_batch_id_stays_unledgered(spark, tmp_path):
    """Staging alone must NOT ledger the batch id — only publish makes
    it visible, so abandon → re-merge applies exactly once."""
    t = _make(spark, tmp_path)
    t.merge_batch(_batch(spark, [(100, "insert", "r9", "new.py", "x")]),
                  1, wap_id="w")
    t.abandon_wap("w")
    assert t.wap_ids() == []
    redo = t.merge_batch(_batch(spark, [
        (100, "insert", "r9", "new.py", "x")]), 1)
    assert not redo.get("skipped")
    assert t.read().where("repo = 'r9'").count() == 1


def test_publish_refuses_after_intervening_commit(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.merge_batch(_batch(spark, [(100, "insert", "r9", "a.py", "x")]),
                  1, wap_id="w")
    # another writer lands a commit in between
    t.merge_batch(_batch(spark, [(200, "insert", "r8", "b.py", "y")]), 2)
    with pytest.raises(ConcurrentCommitError, match="abandon_wap"):
        t.publish_wap("w")
    t.abandon_wap("w")
    redo = t.merge_batch(_batch(spark, [
        (100, "insert", "r9", "a.py", "x")]), 1)
    assert not redo.get("skipped")
    assert t.read().where("repo in ('r8','r9')").count() == 2


def test_gc_spares_staged_files_until_abandoned(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.merge_batch(_batch(spark, [(100, "insert", "r9", "a.py", "x")]),
                  1, wap_id="w")
    staged_files = {
        e["file"] for b in t._load_wap("w")["manifest_list"].values()
        if b.get("manifest")
        for e in __import__("json").load(
            open(os.path.join(t.meta_dir, b["manifest"])))["entries"]}
    assert staged_files
    t.expire_snapshots(keep_last=1, orphan_grace_s=0)
    for f in staged_files:
        assert os.path.exists(os.path.join(t.data_dir, f)), f
    # audit still works after GC
    assert t.read_wap("w").where("repo = 'r9'").count() == 1
    t.abandon_wap("w")
    t.expire_snapshots(keep_last=1, orphan_grace_s=0)
    committed = {e["file"] for b, fs in t.snapshot()["buckets"].items()
                 for e in fs}
    for f in staged_files - committed:
        assert not os.path.exists(os.path.join(t.data_dir, f)), f


def test_staging_same_id_twice_refused(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.merge_batch(_batch(spark, [(100, "insert", "r9", "a.py", "x")]),
                  1, wap_id="w")
    with pytest.raises(ConcurrentCommitError, match="already staged"):
        t.merge_batch(_batch(spark, [(101, "insert", "r9", "b.py", "y")]),
                      2, wap_id="w")
    with pytest.raises(ValueError):
        t.merge_batch(_batch(spark, [(1, "insert", "r", "c.py", "z")]),
                      3, wap_id="bad/slash")
    with pytest.raises(ValueError):
        t.read_wap("never-staged")
    with pytest.raises(ValueError):
        t.abandon_wap("never-staged")


def test_changefeed_rides_publish(spark, tmp_path):
    """On a changefeed table the staged change files become servable
    exactly when the snapshot publishes."""
    t = _make(spark, tmp_path, changefeed=True)
    v0 = t.snapshot()["version"]
    t.merge_batch(_batch(spark, [(100, "insert", "r9", "a.py", "x")]),
                  1, wap_id="w")
    t.publish_wap("w")
    ch = t.read_change_log(v0, v0 + 1)
    rows = [(r.repo, r.path, r.change_type) for r in ch.collect()]
    assert rows == [("r9", "a.py", "insert")]


def test_crashed_stage_leaves_no_truncated_wap_file(spark, tmp_path):
    """_stage_wap writes tmp-then-link: a writer crash mid-write leaves
    only an orphan tmp (never a truncated wap-<id>.json), so GC keeps
    running, the id is restageable, and the aged tmp is swept."""
    import os
    t = _make(spark, tmp_path)
    # simulate the crash window: a half-written stage tmp on disk
    dead = os.path.join(t.meta_dir, "wap-audit1.json.tmp-deadbeef")
    with open(dead, "w") as f:
        f.write('{"version": 3, "buck')  # truncated JSON
    assert "audit1" not in t.wap_ids()  # tmp never lists as staged
    # GC neither crashes on it nor treats it as a reference...
    t.expire_snapshots(keep_last=2)
    assert os.path.exists(dead)  # ...and spares it within the grace
    # the id stages fine despite the orphan tmp
    t.merge_batch(_batch(spark, [(100, "insert", "r9", "n.py", "x")]),
                  "b-wap", wap_id="audit1")
    t.publish_wap("audit1")
    assert t.lookup(repo="r9", path="n.py").count() == 1
    # an EXPIRED orphan tmp is swept
    os.utime(dead, (1, 1))
    t.expire_snapshots(keep_last=2)
    assert not os.path.exists(dead)
