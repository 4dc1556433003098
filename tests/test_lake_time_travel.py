"""TIMESTAMP-AS-OF time travel (lake/table.py version_as_of /
read_as_of): every commit stamps ``committed_at``; resolution picks the
last version at or before the asked moment, clamping skewed stamps
monotone at read time."""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import types as T

import arlas_proc_spark.lake.table as table_mod
from arlas_proc_spark.lake.table import LakeTable, _to_epoch

SCHEMA = T.StructType([
    T.StructField("k", T.LongType(), False),
    T.StructField("seq", T.LongType(), True),
    T.StructField("v", T.StringType(), True),
])


def _batch(spark, rows):
    return spark.createDataFrame(rows,
                                 "k long, seq long, v string, op string")


def _mk(spark, path):
    t = LakeTable.create(spark, path, SCHEMA, ["k"], "seq", n_buckets=2)
    t.merge_batch(_batch(spark, [(1, 1, "a", "insert")]), "b1")
    t.merge_batch(_batch(spark, [(1, 2, "b", "insert"),
                                 (2, 2, "c", "insert")]), "b2")
    return t


def _stamp(t, v):
    return t.snapshot_at(v)["committed_at"]


def test_read_as_of_resolves_between_commits(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    cur = t.snapshot()["version"]
    t1 = _stamp(t, cur - 1)
    # exactly at the b1 commit: b1's state (<= is inclusive)
    assert t.version_as_of(t1) == cur - 1
    assert {(r.k, r.v) for r in t.read_as_of(t1).collect()} == {(1, "a")}
    # any moment at/after the last commit: current state
    assert t.version_as_of(_stamp(t, cur) + 3600) == cur
    assert {(r.k, r.v) for r in t.read_as_of(_stamp(t, cur)).collect()} \
        == {(1, "b"), (2, "c")}
    # before the first retained commit: refused, never rounded up
    with pytest.raises(ValueError, match="at or before"):
        t.version_as_of(_stamp(t, 0) - 3600)


def test_version_as_of_clamps_skewed_clock(spark, tmp_path, monkeypatch):
    """A stepped clock can stamp a LATER version with an EARLIER time.
    Resolution must clamp stamps monotone by version — the skewed commit
    is treated as happening at its predecessor's time, so no moment ever
    resolves to a version whose successor 'happened earlier'."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["k"],
                         "seq", n_buckets=2)
    t.merge_batch(_batch(spark, [(1, 1, "a", "insert")]), "b1")
    v1 = t.snapshot()["version"]
    t1 = _stamp(t, v1)
    real_time = table_mod.time.time
    monkeypatch.setattr(table_mod.time, "time", lambda: t1 - 50.0)
    t.merge_batch(_batch(spark, [(2, 2, "c", "insert")]), "b2")
    monkeypatch.setattr(table_mod.time, "time", real_time)
    v2 = t.snapshot()["version"]
    assert _stamp(t, v2) < t1          # the skew really landed on disk
    # between the skewed raw stamp and t1: v2 must NOT resolve (its
    # effective time is clamped up to t1) — and since every honest
    # stamp is also later, the moment predates the whole table
    with pytest.raises(ValueError, match="at or before"):
        t.version_as_of(t1 - 10)
    # at t1: the clamp makes v1 and v2 simultaneous; the LAST wins —
    # "as of t1" state must include everything stamped at/before it
    assert t.version_as_of(t1) == v2
    assert t.version_as_of(real_time() + 60) == v2


def test_unstamped_versions_are_skipped(spark, tmp_path):
    """Snapshots written before this feature carry no stamp: they are
    not addressable by time (skipped), and a table with ONLY unstamped
    versions refuses rather than guessing."""
    t = _mk(spark, str(tmp_path / "t"))
    cur = t.snapshot()["version"]
    p0 = os.path.join(str(tmp_path / "t"), "meta",
                      f"v{cur - 1:010d}.json")
    with open(p0) as f:
        raw = json.load(f)
    del raw["committed_at"]
    with open(p0, "w") as f:
        json.dump(raw, f)
    # resolution skips the unstamped v and lands on a stamped neighbor
    assert t.version_as_of(_stamp(t, cur)) == cur
    for v in range(cur + 1):
        p = os.path.join(str(tmp_path / "t"), "meta", f"v{v:010d}.json")
        with open(p) as f:
            raw = json.load(f)
        raw.pop("committed_at", None)
        with open(p, "w") as f:
            json.dump(raw, f)
    with pytest.raises(ValueError, match="predates commit stamps"):
        t.version_as_of(1e18)


def test_snapshots_df_carries_commit_stamps(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    rows = {r.version: r.committed_at
            for r in t.snapshots_df().collect()}
    assert all(ca is not None and ca > 0 for ca in rows.values())
    assert rows[max(rows)] >= rows[min(rows)]


def test_to_epoch_forms_agree():
    iso = "2026-03-01T12:00:00+00:00"
    aware = datetime(2026, 3, 1, 12, 0, 0, tzinfo=timezone.utc)
    naive = datetime(2026, 3, 1, 12, 0, 0)
    epoch = aware.timestamp()
    assert _to_epoch(iso) == epoch
    assert _to_epoch(aware) == epoch
    assert _to_epoch(naive) == epoch          # naive reads as UTC
    assert _to_epoch("2026-03-01T12:00:00") == epoch
    assert _to_epoch(epoch) == epoch
    with pytest.raises(TypeError, match="epoch seconds"):
        _to_epoch(["not", "a", "time"])
