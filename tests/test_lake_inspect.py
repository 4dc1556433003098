"""Metadata inspection tables (files_df / snapshots_df) — the Iceberg
``table.files`` / ``table.snapshots`` shape: pure-metadata DataFrames
over the manifests, no data IO, consistent with the physical layout
across cow / mor / dv / clone states."""

from __future__ import annotations

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


def _mk(spark, path, **kw):
    t = LakeTable.create(spark, path, SCHEMA, ["k"], "seq",
                         n_buckets=2, **kw)
    t.merge_batch(_batch(spark, [(k, 0, f"v{k}", "insert")
                                 for k in range(10)]), "b1")
    return t


def test_files_df_matches_manifest(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    f = t.files_df()
    rows = f.collect()
    snap = t.snapshot()
    n_entries = sum(len(snap["buckets"][b]) for b in snap["buckets"])
    assert len(rows) == n_entries
    assert sum(r.rows for r in rows) == 10
    assert sum(r.live_rows for r in rows) == t.count_rows()
    assert all(r.bytes > 0 and not r.merge_on_read for r in rows)
    assert all(r.dv_dead == 0 and r.dv_parts == 0 for r in rows)


def test_files_df_reflects_mor_and_dv(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge_batch(_batch(spark, [(1, 9, "d1", "insert")]), "b2", dv=True)
    t.append_batch(_batch(spark, [(0, 5, "m0", "insert")]), "b3")
    f = {(r.file): r for r in t.files_df().collect()}
    assert any(r.merge_on_read for r in f.values())
    dv_rows = [r for r in f.values() if r.dv_dead > 0]
    assert len(dv_rows) == 1 and dv_rows[0].dv_parts == 1


def test_files_df_external_root_on_clone(spark, tmp_path):
    _mk(spark, str(tmp_path / "src"))
    c = LakeTable.shallow_clone(spark, str(tmp_path / "src"),
                                str(tmp_path / "clone"))
    f = c.files_df().collect()
    assert f and all(r.external_root is not None for r in f)


def test_snapshots_df_history_and_tags(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.set_tag("release", 1)
    t.merge_batch(_batch(spark, [(0, 9, "N0", "insert")]), "b2")
    s = {r.version: r for r in t.snapshots_df().collect()}
    cur = t.snapshot()["version"]
    assert set(s) >= {1, cur}
    assert s[cur].is_current
    assert sum(1 for r in s.values() if r.is_current) == 1
    assert s[1].tags == ["release"]
    assert all(r.tags == [] for v, r in s.items() if v != 1)
    assert s[cur].rows >= 10 and s[cur].files >= s[cur].mor_buckets
    assert all(r.schema_v >= 0 for r in s.values())


def test_inspection_is_metadata_only(spark, tmp_path, monkeypatch):
    """Neither inspection table may open a data file: poison the
    parquet reader and collect both."""
    t = _mk(spark, str(tmp_path / "t"))

    def _boom(*a, **kw):  # pragma: no cover - failure path
        raise AssertionError("inspection table read data files")

    from pyspark.sql.readwriter import DataFrameReader
    monkeypatch.setattr(DataFrameReader, "parquet", _boom)
    assert t.files_df().count() > 0
    assert t.snapshots_df().count() > 0


def test_snapshots_df_schema_v_tracks_evolution(spark, tmp_path):
    """schema_v must come from the snapshot's schema HISTORY (max of
    ``schemas``) — there is no top-level schema_v key, and a reader that
    guessed 0 forever would hide every evolution from the ops view."""
    t = _mk(spark, str(tmp_path / "t"))
    ev = spark.createDataFrame(
        [(1, 5, "x", "wide", "insert")],
        "k long, seq long, v string, w string, op string")
    t.merge_batch(ev, "b2")
    s = {r.version: r.schema_v for r in t.snapshots_df().collect()}
    cur = t.snapshot()["version"]
    assert s[0] == 0               # create snapshot: initial schema only
    # the widening merge bumped the history by exactly one over the
    # previous snapshot (v1 itself is already 1: _mk's string-schema
    # batch widens nullability, which counts as evolution)
    assert s[cur] == s[cur - 1] + 1 >= 2
