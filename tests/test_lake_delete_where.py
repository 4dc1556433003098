"""Predicate deletes (retention / GDPR erasure): delete_where tombstones
every live row matching a condition in one exactly-once merge commit,
ranked so at-least-once re-delivery of the victim's own event stays
dead while any genuinely later WAL event revives the key."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from arlas_proc_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("seq", T.LongType(), True),
    T.StructField("commit", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

NC_SCHEMA = T.StructType([f for f in SCHEMA.fields if f.name != "commit"])


def _batch(spark, rows, commit=True):
    cols = "seq long, op string, repo string, path string, " + \
        ("commit string, " if commit else "") + "lang string"
    keep = ["repo", "path", "seq"] + (["commit"] if commit else []) + \
        ["lang", "op"]
    return spark.createDataFrame(rows, cols).select(*keep)


def _make(spark, tmp_path, commit=True, name="t", **kw):
    t = LakeTable.create(spark, str(tmp_path / name),
                         SCHEMA if commit else NC_SCHEMA,
                         ["repo", "path"], "seq", n_buckets=4, **kw)
    rows = [(i, "insert", f"r{i % 3}", f"f{i}.py") +
            ((f"c{i}",) if commit else ()) +
            ("python" if i % 2 == 0 else "go",)
            for i in range(12)]
    t.merge_batch(_batch(spark, rows, commit), 0)
    return t


def test_delete_where_predicate(spark, tmp_path):
    t = _make(spark, tmp_path)
    m = t.delete_where("lang = 'go'", "gdpr-1")
    assert m["rows_deleted"] == 6
    assert t.read().count() == 6
    assert t.read().where("lang = 'go'").count() == 0
    # idempotent by batch id
    m2 = t.delete_where("lang = 'go'", "gdpr-1")
    assert m2.get("skipped")


def test_redelivered_victim_event_stays_dead(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.delete_where("repo = 'r0'", "gdpr-1")
    # at-least-once WAL re-delivers the victim's own final event
    # (same seq, same commit) in a NEW batch — must lose to the
    # tombstone's bumped commit rank
    t.merge_batch(_batch(spark, [
        (0, "insert", "r0", "f0.py", "c0", "python")]), "redeliver")
    assert t.read().where("path = 'f0.py'").count() == 0


def test_later_event_revives(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.delete_where("repo = 'r0'", "gdpr-1")
    t.merge_batch(_batch(spark, [
        (100, "insert", "r0", "f0.py", "c100", "rust")]), "later")
    got = t.read().where("path = 'f0.py'").collect()
    assert [(r.seq, r.lang) for r in got] == [(100, "rust")]


def test_no_commit_column_uses_seq_bump(spark, tmp_path):
    t = _make(spark, tmp_path, commit=False)
    t.delete_where("repo = 'r1'", "ret-1")
    assert t.read().where("repo = 'r1'").count() == 0
    # re-delivery at the victim's seq loses to seq+1
    t.merge_batch(_batch(spark, [
        (1, "insert", "r1", "f1.py", "go")], commit=False), "redeliver")
    assert t.read().where("path = 'f1.py'").count() == 0
    # seq+2 revives
    t.merge_batch(_batch(spark, [
        (3, "insert", "r1", "f1.py", "go")], commit=False), "later")
    assert t.read().where("path = 'f1.py'").count() == 1


def test_filters_prune_and_condition_applies(spark, tmp_path):
    t = _make(spark, tmp_path)
    m = t.delete_where("seq >= 10", "ret-2", filters=[("seq", ">=", 10)])
    assert m["rows_deleted"] == 2
    assert t.read().count() == 10


def test_delete_where_changefeed(spark, tmp_path):
    t = _make(spark, tmp_path, changefeed=True)
    t.delete_where("lang = 'go'", "gdpr-1")
    v = t.snapshot()["version"]
    ch = t.read_changes(v - 1, v).collect()
    assert sorted(r.change_type for r in ch) == ["delete"] * 6
    # pre-image rows carry the victims' real values
    assert {r.lang for r in ch} == {"go"}


def test_delete_where_nothing_matches(spark, tmp_path):
    t = _make(spark, tmp_path)
    m = t.delete_where("lang = 'haskell'", "noop-1")
    assert m["rows_deleted"] == 0
    assert t.read().count() == 12
