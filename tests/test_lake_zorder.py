"""Z-order clustering (lake/zorder.py + cluster_mode='zorder' on
compact/rebucket): Morton-interleaved layout gives file-level pruning on
EVERY cluster column, where lexicographic cluster_by only prunes on the
first; state is never affected (layout-only)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from arlas_proc_spark.lake.table import LakeTable
from arlas_proc_spark.lake.zorder import _equidepth_splits, zorder_expr

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("seq", T.LongType(), True),
    T.StructField("content", T.StringType(), True),
])


def _grid_batch(spark, n=16):
    """One row per (x, y) cell of an n×n grid: x in `commit`, y in
    `content`, both zero-padded so string order == numeric order."""
    rows = [(x * n + y, "insert", "r", f"{x}_{y}.py",
             f"{x:02d}", f"{y:02d}")
            for x in range(n) for y in range(n)]
    return spark.createDataFrame(
        rows, "seq long, op string, repo string, path string, "
              "commit string, content string"
    ).select("repo", "path", "commit", "seq", "content", "op")


def _py_zvalue(xs, cols_values, bits, k):
    """Reference Morton interleave over reference equi-depth bins."""
    out = []
    bins_per_col = []
    for i in range(k):
        splits = _equidepth_splits([v[i] for v in cols_values], 1 << bits)
        bins_per_col.append(splits)
    for v in cols_values:
        z = 0
        for i in range(k):
            b = sum(1 for s in bins_per_col[i] if s <= v[i])
            for j in range(bits):
                z |= ((b >> j) & 1) << (j * k + i)
        out.append(z)
    return out


def test_zorder_expr_matches_python_reference(spark):
    """The codegen z-value equals a pure-Python Morton reference computed
    from the same sample (sample == full data here, so deterministic)."""
    rows = [(a, f"{b:03d}") for a in [3, 17, 17, 99, 250, 1, 42]
            for b in [5, 80, 999]]
    df = spark.createDataFrame(rows, "x long, y string")
    got = [r.z for r in
           df.select("x", "y",
                     zorder_expr(df, ["x", "y"], bits=4,
                                 sample_rows=1000).alias("z"))
           .orderBy("x", "y").collect()]
    ordered = sorted(rows)
    want = _py_zvalue(None, ordered, bits=4, k=2)
    assert got == want
    # interleave actually mixes both dimensions: z is NOT monotone in x
    zs_by_x = [r.z for r in
               df.select("x", zorder_expr(df, ["x", "y"], bits=4)
                         .alias("z")).orderBy("x", "y").collect()]
    assert zs_by_x != sorted(zs_by_x)


def test_zorder_prunes_on_second_column_linear_does_not(spark, tmp_path):
    """16×16 grid, 16 files: linear cluster_by=[commit, content] makes
    each file one full-content commit stripe (a content-only filter scans
    everything); zorder tiles the grid so the SAME filter prunes most
    files. Both stay exact."""
    res = {}
    for mode in ("linear", "zorder"):
        t = LakeTable.create(spark, str(tmp_path / mode), SCHEMA,
                             ["repo", "path"], "seq", n_buckets=1)
        t.append_batch(_grid_batch(spark), 0)
        t.compact(max_files_per_bucket=1, target_rows_per_file=16,
                  cluster_by=["commit", "content"], cluster_mode=mode)
        snap = t.snapshot()
        entries = [e for fs in snap["buckets"].values() for e in fs]
        assert len(entries) == 16  # 256 rows / 16 per file
        # cluster columns joined the recorded stats either way
        assert all("commit" in e["stats"] and "content" in e["stats"]
                   for e in entries)
        hit = t.read(filters=[("content", "<=", "03")])
        got = sorted((r.commit, r.content) for r in hit.collect())
        assert got == sorted((f"{x:02d}", f"{y:02d}")
                             for x in range(16) for y in range(4))
        res[mode] = len(hit.inputFiles())
        # the FIRST cluster column prunes in both modes
        first = t.read(filters=[("commit", "<=", "03")])
        assert len(first.inputFiles()) <= 8
        assert first.count() == 64
    assert res["linear"] == 16           # no pruning on the 2nd column
    assert res["zorder"] <= 8            # z-tiles: most files pruned


def test_zorder_rebucket_full_relayout_state_identical(spark, tmp_path):
    """rebucket(same count, cluster_mode='zorder') re-layouts every
    bucket; logical state is byte-identical before/after."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=2)
    t.append_batch(_grid_batch(spark), 0)
    before = sorted((r.repo, r.path, r.seq, r.commit, r.content)
                    for r in t.read().collect())
    t.rebucket(2, cluster_by=["commit", "content"], cluster_mode="zorder",
               target_rows_per_file=16)
    after = sorted((r.repo, r.path, r.seq, r.commit, r.content)
                   for r in t.read().collect())
    assert before == after
    hit = t.read(filters=[("content", ">=", "12")])
    assert len(hit.inputFiles()) < 16
    assert hit.count() == 64


def test_zorder_null_and_constant_columns(spark, tmp_path):
    """NULLs bin to 0 (sort first); an all-constant cluster column
    contributes nothing but never breaks the rewrite."""
    rows = [(i, "insert", "r", f"f{i}.py", None if i % 3 == 0
             else f"{i:02d}", "const") for i in range(30)]
    df = spark.createDataFrame(
        rows, "seq long, op string, repo string, path string, "
              "commit string, content string"
    ).select("repo", "path", "commit", "seq", "content", "op")
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=1)
    t.append_batch(df, 0)
    t.compact(max_files_per_bucket=1, target_rows_per_file=10,
              cluster_by=["commit", "content"], cluster_mode="zorder")
    assert t.read().count() == 30
    assert t.read(filters=[("commit", ">=", "20")]).count() == \
        sum(1 for i in range(30) if i % 3 and i >= 20)


def test_bad_cluster_mode_fails_fast(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=1)
    t.append_batch(_grid_batch(spark, 4), 0)
    with pytest.raises(ValueError, match="cluster_mode"):
        t.compact(max_files_per_bucket=1, cluster_by=["commit"],
                  cluster_mode="hilbert")
