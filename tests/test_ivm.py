"""Incremental materialized-view maintenance (lake/ivm.py): refresh-equals-
recompute, update pre-images in the change feed, group retraction to zero,
idempotent redelivery, crash-between-commit-and-cursor convergence."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import types as T

from arlas_proc_spark.lake.ivm import IncrementalAggView
from arlas_proc_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("seq", T.LongType(), True),
    T.StructField("content", T.StringType(), True),
])


def _ev(seq, op, repo, path, commit, content):
    return (seq, op, repo, path, commit, content)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, op string, repo string, path string, commit string,"
        " content string"
    ).select("repo", "path", "commit", "seq", "content", "op")


def _snap(view):
    return {tuple(r[c] for c in view.group_cols):
            (r[view.count_col], *[r[m] for m in view.measures])
            for r in view.df().collect()}


def _truth(view):
    return {tuple(r[c] for c in view.group_cols):
            (r[view.count_col], *[r[m] for m in view.measures])
            for r in view.recompute_df().collect()}


@pytest.fixture()
def src(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                            ["repo", "path"], "seq", n_buckets=4)


def _mk_view(spark, tmp_path, src, **kw):
    return IncrementalAggView(
        spark, str(tmp_path / "view"), src, ["repo"],
        {"sum_len": "length(content)"}, **kw)


def test_refresh_equals_recompute_across_batches(spark, tmp_path, src):
    view = _mk_view(spark, tmp_path, src, n_buckets=4)
    src.merge_batch(_batch(spark, [
        _ev(1, "insert", "r1", "a.py", "c1", "xx"),
        _ev(2, "insert", "r1", "b.py", "c2", "yyy"),
        _ev(3, "insert", "r2", "a.py", "c3", "z"),
    ]), 0)
    assert view.refresh()["source_version"] == 1
    assert _snap(view) == {("r1",): (2, 5.0), ("r2",): (1, 1.0)}

    # update (retraction: -2 +6), delete, insert — folded incrementally
    src.merge_batch(_batch(spark, [
        _ev(4, "update", "r1", "a.py", "c4", "xxxxxx"),
        _ev(5, "delete", "r2", "a.py", "c5", None),
        _ev(6, "insert", "r3", "n.py", "c6", "abcd"),
    ]), 1)
    # two source commits folded by ONE refresh (cursor skips versions)
    src.merge_batch(_batch(spark, [
        _ev(7, "insert", "r1", "c.py", "c7", "pq"),
    ]), 2)
    out = view.refresh()
    assert out["source_version"] == 3 and out["groups_touched"] == 3
    got = _snap(view)
    assert got == {("r1",): (3, 11.0), ("r3",): (1, 4.0)}
    assert got == _truth(view)


def test_group_retracts_to_zero_is_deleted(spark, tmp_path, src):
    view = _mk_view(spark, tmp_path, src, n_buckets=4)
    src.merge_batch(_batch(spark, [
        _ev(1, "insert", "r1", "a.py", "c1", "xx"),
    ]), 0)
    view.refresh()
    src.merge_batch(_batch(spark, [
        _ev(2, "delete", "r1", "a.py", "c2", None),
    ]), 1)
    view.refresh()
    assert _snap(view) == {} == _truth(view)
    # and the group can come back
    src.merge_batch(_batch(spark, [
        _ev(3, "insert", "r1", "b.py", "c3", "abc"),
    ]), 2)
    view.refresh()
    assert _snap(view) == {("r1",): (1, 3.0)}


def test_refresh_is_idempotent_and_cursor_crash_safe(spark, tmp_path, src):
    view = _mk_view(spark, tmp_path, src, n_buckets=4)
    src.merge_batch(_batch(spark, [
        _ev(1, "insert", "r1", "a.py", "c1", "xx"),
    ]), 0)
    view.refresh()
    assert view.refresh() == {"skipped": True, "source_version": 1}

    src.merge_batch(_batch(spark, [
        _ev(2, "update", "r1", "a.py", "c2", "xxxx"),
    ]), 1)
    view.refresh()
    before = _snap(view)
    # crash between merge commit and cursor write: rewind the cursor only;
    # the replayed refresh must ledger-skip the merge and re-advance
    with open(view.cursor_path, "w") as f:
        json.dump({"version": 1}, f)
    out = view.refresh()
    assert out.get("skipped") is True or out["source_version"] == 2
    assert view.cursor() == 2
    assert _snap(view) == before == _truth(view)


def test_update_preimages_in_change_feed(spark, tmp_path, src):
    src.merge_batch(_batch(spark, [
        _ev(1, "insert", "r1", "a.py", "c1", "old"),
        _ev(2, "insert", "r1", "b.py", "c2", "keep"),
    ]), 0)
    src.merge_batch(_batch(spark, [
        _ev(3, "update", "r1", "a.py", "c3", "new!"),
        _ev(4, "delete", "r1", "b.py", "c4", None),
        _ev(5, "insert", "r1", "c.py", "c5", "ins"),
    ]), 1)
    ch = src.read_changes(1, 2, include_update_preimages=True)
    got = {(r.path, r.change_type): r.content for r in ch.collect()}
    assert got == {
        ("a.py", "update_preimage"): "old",
        ("a.py", "update_postimage"): "new!",
        ("b.py", "delete"): "keep",
        ("c.py", "insert"): "ins",
    }
    # default stays the three-type feed
    assert set(r.change_type for r in src.read_changes(1, 2).collect()) == \
        {"update_postimage", "delete", "insert"}


def test_view_survives_reopen_and_new_measure_schema_guard(spark, tmp_path,
                                                           src):
    view = _mk_view(spark, tmp_path, src, n_buckets=4)
    src.merge_batch(_batch(spark, [
        _ev(1, "insert", "r1", "a.py", "c1", "xy"),
    ]), 0)
    view.refresh()
    # reopen from disk: state + cursor persist
    again = _mk_view(spark, tmp_path, src)
    assert again.cursor() == 1
    assert _snap(again) == {("r1",): (1, 2.0)}
    with pytest.raises(ValueError, match="group column"):
        IncrementalAggView(spark, str(tmp_path / "v2"), src, ["nope"], {})


def test_mor_source_change_feed_drives_view(spark, tmp_path, src):
    """The view is agnostic to the source's write mode: merge-on-read
    appends resolve to per-snapshot LWW winners inside read_changes."""
    view = _mk_view(spark, tmp_path, src, n_buckets=4)
    src.append_batch(_batch(spark, [
        _ev(1, "insert", "r1", "a.py", "c1", "aa"),
        _ev(2, "insert", "r2", "b.py", "c2", "bbb"),
    ]), 0)
    view.refresh()
    src.append_batch(_batch(spark, [
        _ev(3, "update", "r1", "a.py", "c3", "aaaa"),
        _ev(4, "delete", "r2", "b.py", "c4", None),
    ]), 1)
    view.refresh()
    assert _snap(view) == {("r1",): (1, 4.0)} == _truth(view)


def test_view_over_changefeed_table_uses_emitted_log(spark, tmp_path):
    """With a changefeed=True source, refresh folds the merge-emitted
    per-commit files (net-zero pairs included) to the same state as the
    snapshot-diff fallback and the full recompute."""
    src = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                           ["repo", "path"], "seq", n_buckets=4,
                           changefeed=True)
    view = _mk_view(spark, tmp_path, src, n_buckets=4)
    src.merge_batch(_batch(spark, [
        _ev(1, "insert", "r1", "a.py", "c1", "xx"),
        _ev(2, "insert", "r2", "b.py", "c2", "yyy"),
    ]), 0)
    view.refresh()
    # two commits folded at once: a.py changes twice -> the per-commit log
    # emits BOTH transitions; additive folding must still net out
    src.merge_batch(_batch(spark, [
        _ev(3, "update", "r1", "a.py", "c3", "xxxx"),
    ]), 1)
    src.merge_batch(_batch(spark, [
        _ev(4, "update", "r1", "a.py", "c4", "xxxxxx"),
        _ev(5, "delete", "r2", "b.py", "c5", None),
    ]), 2)
    log = src.read_change_log(1, 3, include_update_preimages=True)
    # v2: a.py pre+post; v3: a.py pre+post, b.py delete preimage
    assert log.count() == 5
    view.refresh()
    assert _snap(view) == {("r1",): (1, 6.0)} == _truth(view)


def test_derived_measures_projected_at_read_time(spark, tmp_path, src):
    """avg = sum/count is a read-time projection over additive state —
    identical between the incremental view and the recompute, and
    changeable without touching stored state."""
    view = IncrementalAggView(
        spark, str(tmp_path / "view"), src, ["repo"],
        {"sum_len": "length(content)"},
        derived={"avg_len": "sum_len / n_rows"}, n_buckets=4)
    src.merge_batch(_batch(spark, [
        _ev(1, "insert", "r1", "a.py", "c1", "xx"),
        _ev(2, "insert", "r1", "b.py", "c2", "xxxxxx"),
    ]), 0)
    view.refresh()
    got = {r.repo: r.avg_len for r in view.df().collect()}
    truth = {r.repo: r.avg_len for r in view.recompute_df().collect()}
    assert got == truth == {"r1": 4.0}


def test_no_double_fold_after_crash_with_intervening_commit(spark, tmp_path,
                                                            src):
    """The r2 ADVICE exactly-once hole: a crash between the refresh merge
    and the side-cursor write, followed by ANOTHER source commit before
    the next refresh, used to re-fold the already-applied window under a
    fresh batch id (src-{v'} is not ledger-skipped) — double-counting
    additive state. The cursor now rides the merge commit itself as a
    snapshot property, so the re-derived window starts AFTER the applied
    one no matter what the side file says."""
    view = _mk_view(spark, tmp_path, src, n_buckets=4)
    src.merge_batch(_batch(spark, [
        _ev(1, "insert", "r1", "a.py", "c1", "xx"),
    ]), 0)                                                     # src v1
    view.refresh()
    src.merge_batch(_batch(spark, [
        _ev(2, "insert", "r1", "b.py", "c2", "yyy"),
    ]), 1)                                                     # src v2
    view.refresh()                                             # folds (1,2]
    # crash window: merge committed, side cursor never written
    if os.path.exists(view.cursor_path):
        os.remove(view.cursor_path)
    assert view.cursor() == 2  # authoritative record survives the crash
    src.merge_batch(_batch(spark, [
        _ev(3, "insert", "r2", "c.py", "c3", "zzzz"),
    ]), 2)                                                     # src v3
    out = view.refresh()
    assert out["source_version"] == 3
    assert _snap(view) == _truth(view) == {("r1",): (2, 5.0),
                                           ("r2",): (1, 4.0)}
