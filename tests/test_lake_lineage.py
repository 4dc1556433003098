"""Row lineage (Iceberg v3): create(row_lineage=True) gives every row a
STABLE _row_id for its whole life — assigned lazily per file
(first_row_id + position, from a monotone next_row_id counter in the
snapshot), materialized on rewrite, preserved across cow updates,
deletes (the tombstone keeps it), revivals, deletion-vector merges,
compaction and rebucketing — plus _last_updated_version, the commit
that last CHANGED the row (idempotent re-applies don't move it).
Exposed by read(with_row_ids=True); invisible to normal reads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arlas_proc_spark.lake.table import LakeTable

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
                         ["repo", "path"], "seq", n_buckets=4,
                         row_lineage=True, **kw)
    t.merge_batch(_batch(spark, [
        (i, "insert", f"r{i % 3}", f"f{i}.py", f"v{i}") for i in range(12)
    ]), 0)
    return t


def _lin(t, **kw):
    return {(r.repo, r.path): (r._row_id, r._last_updated_version)
            for r in t.read(with_row_ids=True, **kw).collect()}


def test_ids_unique_dense_and_countered(spark, tmp_path):
    t = _make(spark, tmp_path)
    m = _lin(t)
    ids = [rid for rid, _ in m.values()]
    assert sorted(ids) == list(range(12))  # first commit: dense from 0
    assert all(luv == 1 for _, luv in m.values())
    assert t.snapshot()["next_row_id"] == 12
    # lineage columns never leak into normal reads
    assert "_row_id" not in t.read().columns
    assert "_row_id" not in {f.name for f in t.schema.fields}


def test_id_stable_and_luv_moves_only_on_change(spark, tmp_path):
    t = _make(spark, tmp_path)
    before = _lin(t)
    t.merge_batch(_batch(spark, [
        (100, "update", "r0", "f0.py", "new")]), 1)
    # idempotent redelivery of the SAME event under a new batch id:
    # winner ties to the batch but nothing moved -> luv must not move
    t.merge_batch(_batch(spark, [
        (100, "update", "r0", "f0.py", "new")]), 2)
    after = _lin(t)
    for k, (rid, luv) in after.items():
        assert rid == before[k][0], k  # identity survives the rewrite
        assert luv == (2 if k == ("r0", "f0.py") else 1), (k, luv)
    # next_row_id advanced by the rewritten files' rows (sparse ranges —
    # Iceberg's documented behavior), never re-issuing a live id
    assert t.snapshot()["next_row_id"] > 12


def test_delete_tombstone_and_revival_keep_identity(spark, tmp_path):
    t = _make(spark, tmp_path)
    rid0 = _lin(t)[("r0", "f0.py")][0]
    t.merge_batch(_batch(spark, [(100, "delete", "r0", "f0.py", None)]), 1)
    tomb = _lin(t, with_tombstones=True)
    assert tomb[("r0", "f0.py")] == (rid0, 2)
    assert ("r0", "f0.py") not in _lin(t)
    t.merge_batch(_batch(spark, [(200, "insert", "r0", "f0.py", "back")]), 2)
    assert _lin(t)[("r0", "f0.py")] == (rid0, 3)  # same row, revived


def test_compact_and_rebucket_preserve_lineage(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.merge_batch(_batch(spark, [
        (100 + i, "update", f"r{i % 3}", f"f{i}.py", f"u{i}")
        for i in range(6)]), 1)
    pre = _lin(t)
    t.compact(max_files_per_bucket=0)
    assert _lin(t) == pre
    t.rebucket(3)
    assert _lin(t) == pre
    # incremental rebucket too
    t.begin_rebucket(5)
    while not t.migrate_buckets(2).get("done"):
        pass
    assert _lin(t) == pre


def test_dv_merge_preserves_lineage(spark, tmp_path):
    t = _make(spark, tmp_path)
    before = _lin(t)
    t.merge_batch(_batch(spark, [
        (100, "update", "r0", "f0.py", "dv0"),
        (101, "insert", "r9", "new.py", "n")]), 1, dv=True)
    after = _lin(t)
    assert after[("r0", "f0.py")] == (before[("r0", "f0.py")][0], 2)
    assert after[("r9", "new.py")][1] == 2
    new_id = after[("r9", "new.py")][0]
    assert new_id not in {rid for rid, _ in before.values()}
    for k in before:
        if k != ("r0", "f0.py"):
            assert after[k] == before[k], k
    # folding the dv masks keeps everything
    t.compact(dv_dead_ratio=0.0001)
    assert _lin(t) == after


def test_unsupported_combinations_fail_loudly(spark, tmp_path):
    t = _make(spark, tmp_path)
    with pytest.raises(ValueError, match="merge-on-read"):
        t.append_batch(_batch(spark, [(500, "insert", "r9", "x.py", "x")]),
                       9)
    with pytest.raises(ValueError, match="reserved row-lineage"):
        t.merge_batch(
            t.read(with_row_ids=True).limit(1)
            .withColumn("op", F.lit("insert")), 10)
    # with_row_ids on a plain table refuses
    plain = LakeTable.create(spark, str(tmp_path / "p"), SCHEMA,
                             ["repo", "path"], "seq", n_buckets=2)
    with pytest.raises(ValueError, match="row_lineage"):
        plain.read(with_row_ids=True)


def test_overwrite_resets_identity(spark, tmp_path):
    t = _make(spark, tmp_path)
    nxt = t.snapshot()["next_row_id"]
    state = t.read()
    t.overwrite(state, "reload")
    m = _lin(t)
    assert len(m) == 12
    assert all(rid >= nxt for rid, _ in m.values())  # all-new rows
    v = t.snapshot()["version"]
    assert all(luv == v for _, luv in m.values())


def test_lineage_rides_branches(spark, tmp_path):
    t = _make(spark, tmp_path)
    before = _lin(t)
    t.create_branch("b")
    t.merge_batch(_batch(spark, [
        (100, "update", "r0", "f0.py", "branched")]), 1, branch="b")
    t.fast_forward("b")
    after = _lin(t)
    assert after[("r0", "f0.py")][0] == before[("r0", "f0.py")][0]
    assert after[("r0", "f0.py")][1] == t.snapshot()["version"]


def test_time_travel_sees_historic_lineage(spark, tmp_path):
    t = _make(spark, tmp_path)
    v1 = t.snapshot()["version"]
    snap1 = t.snapshot_at(v1)
    t.merge_batch(_batch(spark, [
        (100, "update", "r0", "f0.py", "new")]), 1)
    old = {(r.repo, r.path): (r._row_id, r._last_updated_version)
           for r in t.read(snapshot=snap1, with_row_ids=True).collect()}
    assert old[("r0", "f0.py")][1] == 1  # the historic stamp, not 2


def test_multi_commit_squash_clamps_branch_local_stamps(spark, tmp_path):
    """ADVICE r5 (high): a multi-commit branch squash publishes at
    parent+1, but files written by chain commits 2..k carry materialized
    _LUV stamps at branch-local versions parent+2..parent+k — without the
    squash-time clamp those stamps exceed the table version and alias
    unrelated FUTURE main commits for incremental consumers filtering on
    _last_updated_version."""
    t = _make(spark, tmp_path)
    before = _lin(t)
    parent = t.snapshot()["version"]
    t.create_branch("b")
    t.merge_batch(_batch(spark, [
        (100, "update", "r0", "f0.py", "c1")]), 1, branch="b")
    t.merge_batch(_batch(spark, [
        (101, "update", "r1", "f1.py", "c2"),
        (102, "insert", "r9", "new.py", "n")]), 2, branch="b")
    t.merge_batch(_batch(spark, [
        (103, "update", "r2", "f2.py", "c3")]), 3, branch="b")
    res = t.fast_forward("b")
    pub = res["published_version"]
    assert pub == parent + 1
    after = _lin(t)
    # no stamp may exceed the table version (the bug's signature)
    assert max(luv for _, luv in after.values()) <= pub
    # every row the branch touched — in ANY chain commit — stamps at the
    # published version; untouched rows keep their pre-fork stamp
    touched = {("r0", "f0.py"), ("r1", "f1.py"), ("r2", "f2.py"),
               ("r9", "new.py")}
    for k, (rid, luv) in after.items():
        assert luv == (pub if k in touched else before[k][1]), (k, luv)
        if k in before:
            assert rid == before[k][0], k  # identity still rides through
    # the NEXT main commit's stamp (parent+2 — a number the branch used
    # internally) must select exactly its own rows, none of the branch's
    t.merge_batch(_batch(spark, [
        (200, "update", "r0", "f3.py", "main")]), 9)
    v2 = t.snapshot()["version"]
    incr = {(r.repo, r.path)
            for r in t.read(with_row_ids=True)
            .where(F.col("_last_updated_version") == v2).collect()}
    assert incr == {("r0", "f3.py")}
    # compaction materializes the clamped values (tag dropped with the
    # rewrite) — stamps must not change
    expect = _lin(t)
    t.compact(max_files_per_bucket=0)
    assert _lin(t) == expect


def test_restore_keeps_row_id_counter_monotone(spark, tmp_path):
    """ADVICE r5 (medium): restore() must carry next_row_id FORWARD
    (Iceberg v3 keeps it monotone in table metadata) — rolling it back
    re-issues _row_id ranges already assigned by the undone-but-retained
    versions, so two different rows would share a 'stable' id."""
    t = _make(spark, tmp_path)
    v1 = t.snapshot()["version"]
    t.merge_batch(_batch(spark, [
        (100 + i, "insert", "rx", f"g{i}.py", "x") for i in range(5)]), 1)
    burned = t.snapshot()["next_row_id"]
    undone = _lin(t)
    t.restore(version=v1)
    assert t.snapshot()["next_row_id"] >= burned
    t.merge_batch(_batch(spark, [
        (300, "insert", "ry", "h.py", "y")]), 2)
    new_id = _lin(t)[("ry", "h.py")][0]
    # the undone rows are STILL readable via time travel — the new row's
    # id must not collide with any id they hold
    assert new_id not in {rid for rid, _ in undone.values()}


def test_create_refuses_reserved_lineage_columns(spark, tmp_path):
    """ADVICE r5 (low): create(row_lineage=True) refuses a user schema
    already holding _row_id/_last_updated_version (same clash guard
    read() applies to the dv position columns)."""
    bad = T.StructType(list(SCHEMA.fields) +
                       [T.StructField("_row_id", T.LongType(), True)])
    with pytest.raises(ValueError, match="reserved row-lineage"):
        LakeTable.create(spark, str(tmp_path / "bad"), bad,
                         ["repo", "path"], "seq", row_lineage=True)
    # without lineage the name is just a column — allowed
    LakeTable.create(spark, str(tmp_path / "ok"), bad,
                     ["repo", "path"], "seq")


def test_multi_commit_squash_clamp_with_dv_branch_merges(spark, tmp_path):
    """The clamp × deletion vectors: dv merges on the branch write ONLY
    the changed rows to new files (clamped at squash) while untouched
    pre-fork files gain mask refs but keep their materialized stamps
    (file name unchanged → not clamped). Stamps must still land exactly
    as the published-version rule says."""
    t = _make(spark, tmp_path)
    before = _lin(t)
    parent = t.snapshot()["version"]
    t.create_branch("b")
    t.merge_batch(_batch(spark, [
        (100, "update", "r0", "f0.py", "c1")]), 1, branch="b", dv=True)
    t.merge_batch(_batch(spark, [
        (101, "update", "r1", "f1.py", "c2")]), 2, branch="b", dv=True)
    res = t.fast_forward("b")
    pub = res["published_version"]
    assert pub == parent + 1
    after = _lin(t)
    assert max(luv for _, luv in after.values()) <= pub
    touched = {("r0", "f0.py"), ("r1", "f1.py")}
    for k, (rid, luv) in after.items():
        assert luv == (pub if k in touched else before[k][1]), (k, luv)
        assert rid == before[k][0], k
    # folding the masks (compaction) materializes the clamped stamps
    expect = _lin(t)
    t.compact(dv_dead_ratio=0.0001)
    assert _lin(t) == expect
