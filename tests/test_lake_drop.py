"""Metadata-only column drops (Iceberg ALTER TABLE … DROP COLUMN): one
snapshot commit, zero data rewritten; files written before the drop keep
the physical parquet column but the read path masks it through the
snapshot's drop log — so a later batch re-using the name evolves it in
as a BRAND-NEW column (old rows read NULL, never the old bytes: Iceberg
field-id retirement semantics). Key/seq columns refuse to drop; time
travel shows each snapshot's own columns; compaction physically removes
the bytes at maintenance cadence."""

from __future__ import annotations

import os

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


def _batch(spark, rows, cols="repo path seq commit lang".split()):
    ddl = {"repo": "string", "path": "string", "seq": "long",
           "commit": "string", "lang": "string", "language": "string"}
    schema = ", ".join(f"{c} {ddl[c]}" for c in cols) + ", op string"
    return spark.createDataFrame([r + ("insert",) for r in rows], schema)


def _make(spark, tmp_path, name="t", **kw):
    t = LakeTable.create(spark, str(tmp_path / name), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=4, **kw)
    t.merge_batch(_batch(spark, [
        (f"r{i % 3}", f"f{i}.py", i, f"c{i}", "python" if i % 2 else "go")
        for i in range(12)]), 0)
    return t


def test_drop_is_metadata_only_and_other_values_survive(spark, tmp_path):
    t = _make(spark, tmp_path)
    files_before = t.file_counts()
    m = t.drop_column("lang")
    assert m["dropped"] == "lang"
    assert t.file_counts() == files_before  # zero data rewritten
    df = t.read()
    assert "lang" not in df.columns
    got = {(r.repo, r.path): r.commit for r in df.collect()}
    assert len(got) == 12 and got[("r0", "f0.py")] == "c0"


def test_drop_validations(spark, tmp_path):
    t = _make(spark, tmp_path)
    with pytest.raises(ValueError, match="no column"):
        t.drop_column("nope")
    with pytest.raises(ValueError, match="key column"):
        t.drop_column("repo")
    with pytest.raises(ValueError, match="sequence"):
        t.drop_column("seq")


def test_time_travel_shows_column_before_drop(spark, tmp_path):
    t = _make(spark, tmp_path)
    v0 = t.snapshot()["version"]
    t.drop_column("lang")
    old = t.read_version(v0)
    assert "lang" in old.columns
    assert {r.lang for r in old.collect()} == {"python", "go"}
    assert "lang" not in t.read().columns


def test_readd_never_resurrects_old_bytes(spark, tmp_path):
    """The Iceberg field-id test: drop, then a later batch re-uses the
    name. Keys untouched since before the drop MUST read NULL — the old
    physical column is masked per-file by the drop log, not re-matched
    by name at alignment."""
    t = _make(spark, tmp_path)
    t.drop_column("lang")
    t.merge_batch(_batch(spark, [("r0", "f0.py", 100, "cx", "rust")]), 1)
    got = {(r.repo, r.path): r.lang for r in t.read().collect()}
    assert got[("r0", "f0.py")] == "rust"          # the re-added value
    assert got[("r1", "f1.py")] is None            # masked, NOT "python"
    assert got[("r0", "f3.py")] is None            # masked, NOT "python"
    assert len(got) == 12


def test_readd_on_append_mor_path(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.drop_column("lang")
    t.append_batch(_batch(spark, [("r0", "f0.py", 100, "cx", "rust")]), 1)
    got = {(r.repo, r.path): r.lang for r in t.read().collect()}
    assert got[("r0", "f0.py")] == "rust"
    assert got[("r1", "f1.py")] is None
    assert len(got) == 12


def test_drop_frees_renamed_lineage(spark, tmp_path):
    """rename lang→language, then drop language: the whole lineage is
    dead, so a batch carrying 'lang' is a legitimate NEW column again
    (the retired-name guard only protects live lineages)."""
    t = _make(spark, tmp_path)
    t.rename_column("lang", "language")
    with pytest.raises(ValueError, match="renamed-away"):
        t.merge_batch(_batch(spark, [("r9", "x.py", 1, "c", "zig")]), 1)
    t.drop_column("language")
    t.merge_batch(_batch(spark, [("r9", "x.py", 1, "c", "zig")]), 2)
    got = {(r.repo, r.path): r.lang for r in t.read().collect()}
    assert got[("r9", "x.py")] == "zig"
    assert got[("r0", "f0.py")] is None            # old epoch masked
    assert "language" not in t.read().columns


def test_rename_onto_dropped_name(spark, tmp_path):
    """drop lang, then rename commit→lang: old files hold BOTH physical
    columns; the drop masks the old lang before the rename projects
    commit onto the name — values must be the commit ones."""
    t = _make(spark, tmp_path)
    t.drop_column("lang")
    t.rename_column("commit", "lang")
    got = {(r.repo, r.path): r.lang for r in t.read().collect()}
    assert got[("r0", "f0.py")] == "c0" and got[("r1", "f1.py")] == "c1"


def test_changefeed_across_drop(spark, tmp_path):
    t = _make(spark, tmp_path, changefeed=True)
    t.drop_column("lang")                           # data-free version
    t.merge_batch(_batch(spark, [("r0", "f0.py", 100, "cx")],
                         "repo path seq commit".split()), 1)
    v = t.snapshot()["version"]
    ch = t.read_change_log(0, v).collect()
    assert all(not hasattr(r, "lang") for r in ch)  # to-version schema
    diff = t.read_changes(v - 2, v).collect()
    assert [r.change_type for r in diff] == ["update_postimage"]
    assert diff[0].path == "f0.py"


def test_compact_after_drop_physically_removes_bytes(spark, tmp_path):
    import pyarrow.parquet as pq
    t = _make(spark, tmp_path)
    t.drop_column("lang")
    # before compaction the old files still physically carry the column
    snap = t.snapshot()
    pre = [os.path.join(t.data_dir, e["file"])
           for b in snap["buckets"] for e in snap["buckets"][b]]
    assert any("lang" in pq.read_schema(p).names for p in pre)
    # second generation in every bucket so compaction has victims
    t.append_batch(_batch(spark, [
        (f"r{i % 3}", f"f{i}.py", 100 + i, f"d{i}")
        for i in range(12)], "repo path seq commit".split()), 1)
    t.compact(max_files_per_bucket=1)
    snap = t.snapshot()
    post = [os.path.join(t.data_dir, e["file"])
            for b in snap["buckets"] for e in snap["buckets"][b]]
    assert all("lang" not in pq.read_schema(p).names for p in post)
    got = {(r.repo, r.path): r.commit for r in t.read().collect()}
    assert len(got) == 12 and got[("r2", "f2.py")] == "d2"


def test_filter_on_readded_column_only_sees_new_rows(spark, tmp_path):
    """Manifest stats of pre-drop files are keyed by the old (masked)
    values; pruning with them is harmless because masked rows read NULL
    and NULL matches no filter — but the VISIBLE result must contain
    only post-re-add rows."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=2,
                         stats_cols=["lang"])
    t.merge_batch(_batch(spark, [
        (f"r{i}", f"f{i}.py", i, f"c{i}", "python") for i in range(8)]), 0)
    t.drop_column("lang")
    t.merge_batch(_batch(spark, [("r0", "f0.py", 100, "cx", "python")]), 1)
    rows = t.read(filters=[("lang", "=", "python")]).collect()
    assert {(r.repo, r.path) for r in rows} == {("r0", "f0.py")}
    assert rows[0].seq == 100


def test_add_column_explicit_ddl(spark, tmp_path):
    t = _make(spark, tmp_path)
    m = t.add_column("stars", "long")
    assert m["added"] == {"name": "stars", "type": "bigint"}
    df = t.read()
    assert {r.stars for r in df.collect()} == {None}   # old rows null
    t.merge_batch(spark.createDataFrame(
        [("r0", "f0.py", 100, "cx", "rust", 7, "insert")],
        "repo string, path string, seq long, commit string,"
        " lang string, stars long, op string"), 1)
    got = {r.path: r.stars for r in t.read().collect()}
    assert got["f0.py"] == 7 and got["f1.py"] is None
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("stars", "long")
    with pytest.raises(ValueError, match="reserved"):
        t.add_column("_hidden", "long")


def test_add_column_refuses_retired_but_allows_dropped(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rename_column("lang", "language")
    with pytest.raises(ValueError, match="renamed-away"):
        t.add_column("lang", "string")
    t.drop_column("language")
    t.add_column("lang", "string")                      # lineage freed
    assert {r.lang for r in t.read().collect()} == {None}  # no resurrect


def test_drop_after_merge_then_lww_across_epochs(spark, tmp_path):
    """A cow merge touching old files post-drop must not resurrect the
    column into the rewritten bucket files."""
    t = _make(spark, tmp_path)
    t.drop_column("lang")
    t.merge_batch(_batch(spark, [("r0", "f0.py", 100, "cx", "rust")]), 1)
    # second merge rewrites the same bucket again: epoch-0 rows pass
    # through a cow read-modify-write and must stay masked
    t.merge_batch(_batch(spark, [("r0", "f0.py", 200, "cy", "zig")]), 2)
    got = {(r.repo, r.path): (r.seq, r.lang) for r in t.read().collect()}
    assert got[("r0", "f0.py")] == (200, "zig")
    assert got[("r0", "f3.py")][1] is None
    assert len(got) == 12
