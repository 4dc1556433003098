"""Z-order clustering (lake/zorder.py + cluster_mode='zorder' on
compact/rebucket): Morton-interleaved layout gives file-level pruning on
EVERY cluster column, where lexicographic cluster_by only prunes on the
first; state is never affected (layout-only)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
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


def _py_zvalue(cols_values, bits, k):
    """Reference MSB-aligned Morton interleave over reference equi-depth
    bins: column i uses its natural width w_i = ceil(log2(bins_used)),
    round r takes each column's bit w_i-1-r, positions fill top-down."""
    parts = []
    for i in range(k):
        splits = _equidepth_splits([v[i] for v in cols_values], 1 << bits)
        if splits:
            parts.append((i, splits, len(splits).bit_length()))
    total = sum(w for _, _, w in parts)
    out = []
    for v in cols_values:
        z, pos = 0, total
        for r in range(max((w for _, _, w in parts), default=0)):
            for i, splits, w in parts:
                if r < w:
                    pos -= 1
                    b = (0 if v[i] is None
                         else sum(1 for s in splits if s <= v[i]))
                    z |= ((b >> (w - 1 - r)) & 1) << pos
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
    want = _py_zvalue(ordered, bits=4, k=2)
    assert got == want
    # interleave actually mixes both dimensions: z is NOT monotone in x
    zs_by_x = [r.z for r in
               df.select("x", zorder_expr(df, ["x", "y"], bits=4)
                         .alias("z")).orderBy("x", "y").collect()]
    assert zs_by_x != sorted(zs_by_x)


def test_zorder_expr_msb_aligned_width_mismatch(spark):
    """A 3-value column (w=2) against a 200-value column (w=8, bits=8):
    the narrow column's top bit must land in the TOP interleave round —
    z splits FIRST by the wide column's top bit, then the narrow one.
    Parity with the Python reference pins the exact bit layout."""
    rows = [(x, ["a", "mm", "zz"][x % 3]) for x in range(200)]
    df = spark.createDataFrame(rows, "x long, cat string")
    got = [r.z for r in
           df.select("x", "cat",
                     zorder_expr(df, ["x", "cat"], bits=8,
                                 sample_rows=1000).alias("z"))
           .orderBy("x", "cat").collect()]
    want = _py_zvalue(sorted(rows), bits=8, k=2)
    assert got == want
    # the narrow column still owns a HIGH bit: rows with cat='zz' (top
    # bin) and tiny x must sort above rows with cat='a' and mid-range x
    by_val = {tuple(v): z for v, z in zip(sorted(rows), want)}
    assert by_val[(2, "zz")] > by_val[(90, "a")]


def test_zorder_prunes_low_cardinality_with_wide_column(spark, tmp_path):
    """Regression for the fixed-position interleave: with cluster cols
    (4-value category, wide numeric), a category-only equality filter
    must prune files. Under the old j*k+i layout the category's 2 real
    bits sat below the numeric column's bit 2, so every file spanned all
    categories and NOTHING pruned."""
    n = 1024
    rows = [(i, "insert", "r", f"f{i}.py",
             ["go", "java", "py", "rs"][i % 4], f"{i:04d}")
            for i in range(n)]
    df = spark.createDataFrame(
        rows, "seq long, op string, repo string, path string, "
              "commit string, content string"
    ).select("repo", "path", "commit", "seq", "content", "op")
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=1)
    t.append_batch(df, 0)
    t.compact(max_files_per_bucket=1, target_rows_per_file=64,
              cluster_by=["commit", "seq"], cluster_mode="zorder")
    hit = t.read(filters=[("commit", "=", "py")])
    assert hit.count() == n // 4
    total = sum(len(fs) for fs in t.snapshot()["buckets"].values())
    assert total == n // 64
    # one of four categories → at most ~half the files contain it
    assert len(hit.inputFiles()) <= total // 2


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


def test_zorder_sample_row_uniform_under_heavy_skew(spark):
    """The split-point sample must be row-uniform, not distinct-uniform:
    a value covering 90% of rows has to show up in the sample with its
    true multiplicity (full-row hash — rows sharing the cluster value
    draw independently) AND the splitter has to re-spend the rank
    positions that collapse onto it, so the heavy value lands isolated
    in its own bin while the tail still spreads across bins."""
    df = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit(-1).cast("long"))
         .otherwise(F.col("id")).alias("a"),
        F.col("id").alias("rowid"))
    z = zorder_expr(df, ["a"], bits=3, sample_rows=2048)
    bins = {r.a: r.z for r in df.select("a", z.alias("z"))
            .distinct().collect()}
    heavy = bins[-1]
    tail = [v for k, v in bins.items() if k != -1]
    # heavy value essentially isolated: only the handful of tail values
    # below the SAMPLED successor split can leak into its bin (the
    # sample can't see values it didn't draw) — with ~20% of the tail
    # sampled that's a few values, vs ~1000 sharing the bin before
    leak = sum(1 for v in tail if v == heavy)
    assert leak <= len(tail) // 50
    assert len(set(tail)) >= 4     # tail still discriminated (8 bins max)
