"""RESTORE (lake/table.py restore): one metadata-only commit returning
the table to a retained snapshot's exact state — history preserved,
ledger restored so undone batches can re-apply, changefeed gap stamped."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from arlas_proc_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType(), False),
    T.StructField("seq", T.LongType(), True),
    T.StructField("v", T.StringType(), True),
])


def _batch(spark, rows):
    return spark.createDataFrame(rows,
                                 "k long, seq long, v string, op string")


def _state(t, **kw):
    return {(r.k): (r.seq, r.v) for r in t.read(**kw).collect()}


def _mk(spark, path, **kw):
    t = LakeTable.create(spark, path, SCHEMA, ["k"], "seq",
                         n_buckets=2, **kw)
    t.merge_batch(_batch(spark, [(1, 1, "a", "insert"),
                                 (2, 1, "b", "insert")]), "good")
    return t


def test_restore_by_version_round_trips(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v_good = t.snapshot()["version"]
    good = _state(t)
    t.merge_batch(_batch(spark, [(1, 2, "BAD", "insert"),
                                 (2, 2, None, "delete"),
                                 (3, 2, "BAD", "insert")]), "bad")
    assert _state(t) != good
    r = t.restore(v_good)
    assert r["restored_to"] == v_good and r["version"] > v_good + 1
    assert _state(t) == good
    # history preserved: the undone version still reads
    bad_v = v_good + 1
    assert 3 in {row.k for row in t.read_version(bad_v).collect()}
    # restore "forward" to the bad version is the same operation
    t.restore(bad_v)
    assert 3 in {row.k for row in t.read().collect()}


def test_restore_by_timestamp(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v_good = t.snapshot()["version"]
    ts = t.snapshot_at(v_good)["committed_at"]
    good = _state(t)
    t.merge_batch(_batch(spark, [(9, 2, "x", "insert")]), "later")
    t.restore(timestamp=ts)
    assert _state(t) == good
    with pytest.raises(ValueError, match="exactly one"):
        t.restore(v_good, timestamp=ts)
    with pytest.raises(ValueError, match="exactly one"):
        t.restore()


def test_restore_to_current_is_noop(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v = t.snapshot()["version"]
    assert t.restore(v)["noop"] is True
    assert t.snapshot()["version"] == v


def test_restore_reopens_ledger_for_undone_batches(spark, tmp_path):
    """The restored ledger predates the undone batch, so a producer
    re-sending it re-applies instead of silently no-opping against a
    ledger entry whose data is gone."""
    t = _mk(spark, str(tmp_path / "t"))
    v_good = t.snapshot()["version"]
    bad = _batch(spark, [(3, 2, "redo", "insert")])
    t.merge_batch(bad, "redo-batch")
    assert 3 in {r.k for r in t.read().collect()}
    t.restore(v_good)
    assert 3 not in {r.k for r in t.read().collect()}
    m = t.merge_batch(bad, "redo-batch")   # same id, re-applies
    assert not m.get("skipped")
    assert 3 in {r.k for r in t.read().collect()}


def test_restore_keeps_current_tags_and_survives_gc(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    v_good = t.snapshot()["version"]
    t.merge_batch(_batch(spark, [(5, 2, "y", "insert")]), "b2")
    t.set_tag("pre-restore")
    t.restore(v_good)
    assert "pre-restore" in t.tags()        # refs survive the restore
    # aggressive expiry: the restored CURRENT still reads its files
    t.expire_snapshots(keep_last=1)
    assert _state(t) == {1: (1, "a"), 2: (1, "b")}
    # the tag still pins its version through GC
    assert 5 in {r.k for r in t.read_tag("pre-restore").collect()}


def test_restore_to_expired_version_refuses(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge_batch(_batch(spark, [(5, 2, "y", "insert")]), "b2")
    t.expire_snapshots(keep_last=1)
    with pytest.raises(ValueError, match="expired|not found"):
        t.restore(0)


def test_restore_stamps_changefeed_gap(spark, tmp_path):
    """The restore's state jump has no change file: read_change_log
    snapshot-diffs it, raw-file tailers refuse until re-seeded."""
    from arlas_proc_spark.streaming.consume import ChangeFeedConsumer
    t = _mk(spark, str(tmp_path / "t"), changefeed=True)
    v_good = t.snapshot()["version"]
    t.merge_batch(_batch(spark, [(1, 2, "z", "insert")]), "b2")
    t.restore(v_good)
    snap = t.snapshot()
    assert snap["log_gap_version"] == snap["version"]
    with pytest.raises(ValueError, match="log-less"):
        ChangeFeedConsumer(spark, t, lambda df, bid: None)
    # the served feed (snapshot-diff fallback) still converges: folding
    # each key's LAST transition (the restore step diffs z back to a as
    # an update) replays to the restored state
    rows = t.read_change_log(0, with_version=True).collect()
    last = {}
    for r in sorted(rows, key=lambda r: r._change_version):
        last[r.k] = (r.v, r.change_type)
    assert last == {1: ("a", "update_postimage"), 2: ("b", "insert")}
