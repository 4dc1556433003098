"""Incremental bucket-count migration (begin_rebucket / migrate_buckets):
Iceberg partition-spec evolution done progressively. The router sends
each key to its old bucket until that bucket crosses the migration
frontier, then to its transitional new-spec id; merges/appends/compacts
during the migration stay correct because a key's state lives in
exactly one routed bucket at all times. The last step finalizes in the
same commit (ids shift down, n_buckets flips, router disarms).

Oracle pattern: a TWIN table receives the same batches without ever
migrating — full-frame equality after every interleaving."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from arlas_proc_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("seq", T.LongType(), True),
    T.StructField("val", T.StringType(), True),
])

KEYS = ["repo", "path"]


def _batch(spark, rows):
    return spark.createDataFrame(
        [r + ("insert",) if len(r) == 4 else r for r in rows],
        "repo string, path string, seq long, val string, op string")


def _rows(i0, i1, seq, tag, op="insert"):
    return [(f"r{i % 7}", f"f{i}.py", seq + i, f"{tag}{i}", op)
            for i in range(i0, i1)]


def _state(t):
    return sorted((r.repo, r.path, r.seq, r.val)
                  for r in t.read().collect())


def _twin(spark, tmp_path, n_buckets=8, **kw):
    a = LakeTable.create(spark, str(tmp_path / "a"), SCHEMA, KEYS,
                         "seq", n_buckets=n_buckets, **kw)
    b = LakeTable.create(spark, str(tmp_path / "b"), SCHEMA, KEYS,
                         "seq", n_buckets=n_buckets, **kw)
    return a, b


def test_full_migration_preserves_state_and_flips_spec(spark, tmp_path):
    t, twin = _twin(spark, tmp_path)
    for x in (t, twin):
        x.merge_batch(_batch(spark, _rows(0, 60, 0, "v")), 0)
    t.begin_rebucket(5)
    assert t.snapshot()["rebucket"] == {"to_n": 5, "frontier": 0}
    while True:
        m = t.migrate_buckets(3)
        if m.get("done"):
            break
    snap = t.snapshot()
    assert snap["n_buckets"] == 5 and "rebucket" not in snap
    assert set(snap["buckets"]) <= {str(i) for i in range(5)}
    assert _state(t) == _state(twin)
    # post-finalize merges route by the new spec
    for x in (t, twin):
        x.merge_batch(_batch(spark, _rows(0, 10, 1000, "w")), 1)
    assert _state(t) == _state(twin)


def test_merges_during_migration_converge(spark, tmp_path):
    """The core claim: cow merges interleave with migration steps —
    updates to migrated keys, updates to unmigrated keys, brand-new
    keys, deletes — and the final state matches the never-migrated
    twin exactly."""
    t, twin = _twin(spark, tmp_path)
    for x in (t, twin):
        x.merge_batch(_batch(spark, _rows(0, 80, 0, "v")), 0)
    t.begin_rebucket(3)
    t.migrate_buckets(3)                      # frontier 3/8
    b1 = _batch(spark, _rows(0, 40, 500, "u")          # updates both sides
                + _rows(200, 210, 500, "new")          # new keys
                + _rows(10, 20, 600, "x", op="delete"))
    for x in (t, twin):
        x.merge_batch(b1, 1)
    assert _state(t) == _state(twin)
    t.migrate_buckets(2)                      # frontier 5/8
    b2 = _batch(spark, _rows(30, 90, 900, "z"))
    for x in (t, twin):
        x.merge_batch(b2, 2)
    assert _state(t) == _state(twin)
    t.migrate_buckets(99)                     # drain + finalize
    assert t.snapshot()["n_buckets"] == 3
    assert _state(t) == _state(twin)


def test_appends_mor_during_migration_converge(spark, tmp_path):
    t, twin = _twin(spark, tmp_path)
    for x in (t, twin):
        x.append_batch(_batch(spark, _rows(0, 50, 0, "v")), 0)
    t.begin_rebucket(4)
    t.migrate_buckets(4)                      # frontier 4/8 (mor resolved)
    b = _batch(spark, _rows(20, 70, 300, "w")
               + _rows(5, 10, 300, "d", op="delete"))
    for x in (t, twin):
        x.append_batch(b, 1)
    assert _state(t) == _state(twin)
    t.migrate_buckets(4)                      # finalize
    assert _state(t) == _state(twin)
    # compaction after the dance folds generations identically
    for x in (t, twin):
        x.compact(max_files_per_bucket=1)
    assert _state(t) == _state(twin)
    assert t.snapshot()["mor_buckets"] == []


def test_compact_mid_migration_respects_router(spark, tmp_path):
    """A compaction running mid-migration must keep transitional rows in
    their transitional buckets — the plain-spec expression would route
    them back into (deleted) old buckets and lose them."""
    t, twin = _twin(spark, tmp_path)
    for x in (t, twin):
        x.append_batch(_batch(spark, _rows(0, 50, 0, "v")), 0)
        x.append_batch(_batch(spark, _rows(0, 50, 100, "w")), 1)
    t.begin_rebucket(4)
    t.migrate_buckets(5)                      # frontier 5/8
    for x in (t, twin):
        x.compact(max_files_per_bucket=1)
    assert _state(t) == _state(twin)
    t.migrate_buckets(9)
    assert _state(t) == _state(twin)


def test_caller_touched_sets_recomputed_mid_migration(spark, tmp_path):
    """CdcEngine/IVM pass touched_buckets computed with the PLAIN
    old-spec transform; mid-migration the merge must ignore them and
    recompute routed ids — honoring a stale set would drop the staged
    transitional files from the manifest (data loss)."""
    from arlas_proc_spark.lake.table import bucket_expr, _BUCKET
    t, twin = _twin(spark, tmp_path)
    for x in (t, twin):
        x.merge_batch(_batch(spark, _rows(0, 60, 0, "v")), 0)
    t.begin_rebucket(3)
    t.migrate_buckets(4)                      # frontier 4/8
    b = _batch(spark, _rows(0, 60, 500, "u"))
    stale = [r[0] for r in
             b.select(bucket_expr(KEYS, 8).alias(_BUCKET))
             .distinct().collect()]           # what the engine would pass
    t.merge_batch(b, 1, touched_buckets=stale)
    twin.merge_batch(b, 1)
    assert _state(t) == _state(twin)
    t.migrate_buckets(9)
    assert _state(t) == _state(twin)


def test_lookup_routes_through_frontier(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS,
                         "seq", n_buckets=8)
    t.merge_batch(_batch(spark, _rows(0, 60, 0, "v")), 0)
    t.begin_rebucket(5)
    t.migrate_buckets(4)                      # frontier 4/8
    # every key must be found, whichever side of the frontier it is on
    for i in range(0, 60, 7):
        got = t.lookup(repo=f"r{i % 7}", path=f"f{i}.py").collect()
        assert len(got) == 1 and got[0].val == f"v{i}", i
    t.migrate_buckets(8)
    for i in range(0, 60, 11):
        got = t.lookup(repo=f"r{i % 7}", path=f"f{i}.py").collect()
        assert len(got) == 1 and got[0].val == f"v{i}", i


def test_step_idempotence_and_metrics(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS,
                         "seq", n_buckets=6)
    t.merge_batch(_batch(spark, _rows(0, 30, 0, "v")), 0)
    t.begin_rebucket(3)
    m = t.migrate_buckets(2, batch_id="step-1")
    assert m["migrated_buckets"] == 2 and m["frontier"] == 2
    v = t.snapshot()["version"]
    m2 = t.migrate_buckets(2, batch_id="step-1")   # replay
    assert m2.get("skipped") is True
    assert t.snapshot()["version"] == v
    assert t.snapshot()["rebucket"]["frontier"] == 2
    # replaying the FINALIZING step after completion is also a no-op,
    # not a "no rebucket in progress" error (a CLI retry lands here)
    t.migrate_buckets(99, batch_id="step-2")
    assert "rebucket" not in t.snapshot()
    m3 = t.migrate_buckets(99, batch_id="step-2")
    assert m3.get("skipped") is True


def test_validations_and_cancellation_paths(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS,
                         "seq", n_buckets=4)
    t.merge_batch(_batch(spark, _rows(0, 20, 0, "v")), 0)
    with pytest.raises(ValueError, match="no rebucket in progress"):
        t.migrate_buckets()
    with pytest.raises(ValueError, match="already has 4 buckets"):
        t.begin_rebucket(4)
    t.begin_rebucket(8)
    with pytest.raises(ValueError, match="already in progress"):
        t.begin_rebucket(16)
    # a full one-shot rebucket supersedes the migration entirely
    t.migrate_buckets(1)
    t.rebucket(8)
    snap = t.snapshot()
    assert "rebucket" not in snap and snap["n_buckets"] == 8
    assert len(_state(t)) == 20
    # overwrite also disarms (full replace under the plain spec)
    t.begin_rebucket(2)
    t.migrate_buckets(1)
    t.overwrite(_batch(spark, _rows(0, 5, 50, "o")).drop("op"), "ow-1")
    snap = t.snapshot()
    assert "rebucket" not in snap and snap["n_buckets"] == 8
    assert len(_state(t)) == 5


def test_changefeed_quiet_across_steps_loud_across_merges(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS,
                         "seq", n_buckets=6, changefeed=True)
    t.merge_batch(_batch(spark, _rows(0, 30, 0, "v")), 0)
    t.begin_rebucket(3)
    v0 = t.snapshot()["version"]
    t.migrate_buckets(3)
    # a migration step is a physical move, not a logical change
    assert t.read_changes(v0, t.snapshot()["version"]).count() == 0
    t.merge_batch(_batch(spark, _rows(0, 5, 700, "u")), 1)
    ch = t.read_changes(v0, t.snapshot()["version"])
    assert {r.change_type for r in ch.collect()} == {"update_postimage"}
    assert ch.count() == 5
    t.migrate_buckets(5)
    ch = t.read_change_log(0, t.snapshot()["version"])
    assert ch.where("change_type = 'insert'").count() == 30


def test_streaming_loop_drives_armed_migration(spark, tmp_path):
    """StreamingIngest(migrate_per_batch=k): an armed rebucket advances
    inside the ingest loop itself — the production shape for
    re-partitioning a live table — and the drained state matches a
    never-migrated ingest of the same WAL."""
    from arlas_proc_spark.sources import write_changefeed_batches
    from arlas_proc_spark.streaming import StreamingIngest

    wal = str(tmp_path / "wal")
    write_changefeed_batches(spark, wal, 3000, n_batches=6)

    ing = StreamingIngest(spark, str(tmp_path / "t"), n_buckets=8,
                          migrate_per_batch=2)
    # first drain creates the table; arm the migration, then feed the
    # rest through the SAME loop — steps fire after each micro-batch
    ing.run_to_completion(wal, str(tmp_path / "ck"),
                          max_files_per_trigger=2)
    ing.engine.table.begin_rebucket(5)
    write_changefeed_batches(spark, wal, 6000, n_batches=12)
    ing2 = StreamingIngest(spark, str(tmp_path / "t"), n_buckets=8,
                           migrate_per_batch=2)
    ing2.run_to_completion(wal, str(tmp_path / "ck"),
                           max_files_per_trigger=2)
    snap = ing2.engine.table.snapshot()
    # 6+ new micro-batches x 2 buckets/step drains all 8 old buckets
    assert snap["n_buckets"] == 5 and "rebucket" not in snap

    oracle = StreamingIngest(spark, str(tmp_path / "o"), n_buckets=8)
    oracle.run_to_completion(wal, str(tmp_path / "cko"),
                             max_files_per_trigger=4)
    a = sorted((r.repo, r.path, r.seq) for r in ing2.state().collect())
    b = sorted((r.repo, r.path, r.seq) for r in oracle.state().collect())
    assert a == b and len(a) > 0


def test_metadata_counts_exact_mid_migration(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS,
                         "seq", n_buckets=8)
    t.merge_batch(_batch(spark, _rows(0, 64, 0, "v")), 0)
    t.begin_rebucket(4)
    t.migrate_buckets(3)
    assert t.count_rows() == 64
    stats = t.bucket_stats()
    assert sum(s["rows"] for s in stats) == 64
    ids = {s["bucket"] for s in stats}
    assert all(3 <= b < 8 or 8 <= b < 12 for b in ids), ids


def test_time_travel_spans_the_migration(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS,
                         "seq", n_buckets=6)
    t.merge_batch(_batch(spark, _rows(0, 30, 0, "v")), 0)
    v_pre = t.snapshot()["version"]
    pre = _state(t)
    t.begin_rebucket(3)
    t.migrate_buckets(2)
    v_mid = t.snapshot()["version"]
    t.merge_batch(_batch(spark, _rows(0, 10, 500, "u")), 1)
    t.migrate_buckets(9)
    assert sorted((r.repo, r.path, r.seq, r.val) for r in
                  t.read_version(v_pre).collect()) == pre
    assert sorted((r.repo, r.path, r.seq, r.val) for r in
                  t.read_version(v_mid).collect()) == pre
