"""Sparse-update (patch) merges: merge_batch(patch_cols=[...]) treats a
null batch value as "unchanged" — Iceberg ``MERGE … UPDATE SET col`` /
Debezium partial events. The in-batch fold is event-level: per key the
merged value is the latest non-null by (seq, commit) among the batch's
events, falling back to the stored value; an in-batch delete or a
stored tombstone resets inheritance. Reference analog: the engine's
full-row upsert (src/main/scala/io/arlas/data/sql/WritableDataFrame
.scala:83-86) has no sparse form — this is the column-level MERGE
real CDC feeds need."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from arlas_proc_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("seq", T.LongType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("content", T.StringType(), True),
])


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "seq long, op string, repo string, path string, lang string, "
        "content string"
    ).select("repo", "path", "seq", "lang", "content", "op")


def _make(spark, tmp_path, name="t", **kw):
    return LakeTable.create(spark, str(tmp_path / name), SCHEMA,
                            ["repo", "path"], "seq", n_buckets=4, **kw)


def _state(t):
    return {(r.repo, r.path): (r.seq, r.lang, r.content)
            for r in t.read().collect()}


def test_null_patch_inherits_stored_value(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.merge_batch(_batch(spark, [
        (1, "insert", "r", "a.py", "python", "v1")]), 0)
    t.merge_batch(_batch(spark, [
        (2, "update", "r", "a.py", None, "v2")]), 1, patch_cols=["lang"])
    assert _state(t) == {("r", "a.py"): (2, "python", "v2")}
    # non-patch columns still replace: content went null-insensitive only
    # for lang; a null CONTENT would overwrite (full-row LWW)
    t.merge_batch(_batch(spark, [
        (3, "update", "r", "a.py", None, None)]), 2, patch_cols=["lang"])
    assert _state(t) == {("r", "a.py"): (3, "python", None)}


def test_non_null_patch_overwrites(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.merge_batch(_batch(spark, [
        (1, "insert", "r", "a.py", "python", "v1")]), 0)
    t.merge_batch(_batch(spark, [
        (2, "update", "r", "a.py", "cython", None)]), 1, patch_cols=["lang"])
    assert _state(t)[("r", "a.py")] == (2, "cython", None)


def test_in_batch_fold_is_event_level(spark, tmp_path):
    """The winner row's null must NOT mask an older in-batch non-null:
    the fold takes the latest non-null by seq, not the winner's value."""
    t = _make(spark, tmp_path)
    t.merge_batch(_batch(spark, [
        (1, "insert", "r", "a.py", "python", "v1"),
        (2, "update", "r", "a.py", "go", "v2"),
        (3, "update", "r", "a.py", None, "v3"),
    ]), 0, patch_cols=["lang"])
    assert _state(t) == {("r", "a.py"): (3, "go", "v3")}


def test_in_batch_delete_resets_inheritance(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.merge_batch(_batch(spark, [
        (1, "insert", "r", "a.py", "python", "v1")]), 0)
    # pre-delete non-null ('go') must not leak through the delete, and
    # neither may the stored pre-batch value ('python')
    t.merge_batch(_batch(spark, [
        (2, "update", "r", "a.py", "go", "v2"),
        (3, "delete", "r", "a.py", None, None),
        (4, "insert", "r", "a.py", None, "v4"),
    ]), 1, patch_cols=["lang"])
    assert _state(t) == {("r", "a.py"): (4, None, "v4")}


def test_post_delete_non_null_survives_fold(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.merge_batch(_batch(spark, [
        (1, "update", "r", "a.py", "go", "v1"),
        (2, "delete", "r", "a.py", None, None),
        (3, "insert", "r", "a.py", "rust", "v3"),
        (4, "update", "r", "a.py", None, "v4"),
    ]), 0, patch_cols=["lang"])
    assert _state(t) == {("r", "a.py"): (4, "rust", "v4")}


def test_stored_tombstone_blocks_inheritance(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.merge_batch(_batch(spark, [
        (1, "insert", "r", "a.py", "python", "v1")]), 0)
    t.merge_batch(_batch(spark, [
        (2, "delete", "r", "a.py", None, None)]), 1)
    # revival in a LATER batch starts fresh — no leak from before the
    # tombstone
    t.merge_batch(_batch(spark, [
        (3, "insert", "r", "a.py", None, "v3")]), 2, patch_cols=["lang"])
    assert _state(t) == {("r", "a.py"): (3, None, "v3")}


def test_multi_batch_equals_single_batch_in_order(spark, tmp_path):
    """Per-key in-order splits converge to the single-batch fold."""
    events = [
        (1, "insert", "r", "a.py", "python", "v1"),
        (2, "update", "r", "a.py", None, "v2"),
        (3, "update", "r", "a.py", "go", None),
        (4, "delete", "r", "a.py", None, None),
        (5, "insert", "r", "a.py", None, "v5"),
        (6, "update", "r", "a.py", "rust", None),
        (7, "update", "r", "a.py", None, "v7"),
        (1, "insert", "s", "b.py", "java", "w1"),
        (2, "update", "s", "b.py", None, None),
    ]
    one = _make(spark, tmp_path, "one")
    one.merge_batch(_batch(spark, events), 0, patch_cols=["lang"])
    for cut1, cut2 in [(3, 6), (1, 5), (4, 5), (2, 8)]:
        name = f"split_{cut1}_{cut2}"
        t = _make(spark, tmp_path, name)
        for i, part in enumerate(
                (events[:cut1], events[cut1:cut2], events[cut2:])):
            if part:
                t.merge_batch(_batch(spark, part), i, patch_cols=["lang"])
        assert _state(t) == _state(one), name
    assert _state(one) == {("r", "a.py"): (7, "rust", "v7"),
                           ("s", "b.py"): (2, "java", None)}


def test_patch_replays_idempotently(spark, tmp_path):
    t = _make(spark, tmp_path)
    b = [(1, "insert", "r", "a.py", "python", "v1"),
         (2, "update", "r", "a.py", None, "v2")]
    t.merge_batch(_batch(spark, b), 0, patch_cols=["lang"])
    t.merge_batch(_batch(spark, b), 0, patch_cols=["lang"])  # ledger skip
    assert _state(t) == {("r", "a.py"): (2, "python", "v2")}


def test_change_feed_post_image_is_patched(spark, tmp_path):
    t = _make(spark, tmp_path, changefeed=True)
    t.merge_batch(_batch(spark, [
        (1, "insert", "r", "a.py", "python", "v1")]), 0)
    t.merge_batch(_batch(spark, [
        (2, "update", "r", "a.py", None, "v2")]), 1, patch_cols=["lang"])
    v = t.snapshot()["version"]
    ch = {r.change_type: r for r in t.read_changes(v - 1, v).collect()}
    assert ch["update_postimage"].lang == "python"
    assert ch["update_postimage"].content == "v2"


def test_patch_validation_errors(spark, tmp_path):
    t = _make(spark, tmp_path)
    b = _batch(spark, [(1, "insert", "r", "a.py", "python", "v1")])
    with pytest.raises(ValueError, match="key/seq/commit/op"):
        t.merge_batch(b, 0, patch_cols=["repo"])
    with pytest.raises(ValueError, match="key/seq/commit/op"):
        t.merge_batch(b, 0, patch_cols=["seq"])
    with pytest.raises(ValueError, match="batch_compacted"):
        t.merge_batch(b, 0, patch_cols=["lang"], batch_compacted=True)
    with pytest.raises(ValueError, match="not present"):
        t.merge_batch(b.drop("lang"), 0, patch_cols=["lang"])
    with pytest.raises(ValueError, match="additive and patch"):
        t.merge_batch(b, 0, patch_cols=["lang"], additive_cols=["lang"])
