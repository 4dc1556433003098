"""Manifest-level file skipping: per-file min/max stats recorded at
commit time (from the same parquet footers lineage already reads) and
used by read(filters=...) / lookup to skip whole files before Spark
plans a scan — Iceberg's manifest pruning tier, above parquet row-group
stats. Reference analog: the period filter's partition pruning
(transform/WithoutEdgingPeriod in the reference) is the same idea one
level up; here it generalizes to any tracked column."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from arlas_proc_spark.lake.table import (
    LakeTable,
    _entry_may_match,
    _normalize_filters,
    bucket_expr,
)

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("seq", T.LongType(), True),
    T.StructField("content", T.StringType(), True),
])


def _batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "seq long, op string, repo string, path string, commit string, "
        "content string",
    ).select("repo", "path", "commit", "seq", "content", "op")


def _keys_by_bucket(spark, n_buckets, want_buckets, n_keys, tag):
    """Deterministically pick n_keys (repo, path) pairs that hash into
    the given bucket set, using the WRITER'S OWN bucket expression (no
    Python murmur3 reimplementation to drift)."""
    cand = spark.createDataFrame(
        [(f"{tag}-repo{i}", f"{tag}/f{i}.py") for i in range(40 * n_keys)],
        "repo string, path string")
    rows = (cand.withColumn("b", bucket_expr(["repo", "path"], n_buckets))
            .where(expr_in("b", want_buckets)).limit(n_keys).collect())
    assert len(rows) == n_keys
    return [(r.repo, r.path) for r in rows]


def expr_in(col, values):
    from pyspark.sql import functions as F
    return F.col(col).isin(list(values))


def test_manifest_records_minmax_stats(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=2)
    t.merge_batch(_batch(spark, [
        (5, "insert", "rA", "a.py", "c1", "v1"),
        (9, "insert", "rB", "b.py", "c2", "v1"),
    ]), 0)
    snap = t.snapshot()
    assert snap["stats_cols"] == ["repo", "path", "seq"]
    entries = [e for fs in snap["buckets"].values() for e in fs]
    assert entries and all("stats" in e for e in entries)
    seq_lo = min(e["stats"]["seq"][0] for e in entries)
    seq_hi = max(e["stats"]["seq"][1] for e in entries)
    assert (seq_lo, seq_hi) == (5, 9)
    repos = {v for e in entries for v in e["stats"]["repo"]}
    assert repos <= {"rA", "rB"}


def test_cow_seq_filter_prunes_files_exact_result(spark, tmp_path):
    """Two merges over key sets engineered into DISJOINT buckets, so the
    commit files carry disjoint seq ranges; a seq filter must scan only
    the admissible files and return exactly the row-filtered result."""
    n = 4
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=n)
    old_keys = _keys_by_bucket(spark, n, {0, 1}, 6, "old")
    new_keys = _keys_by_bucket(spark, n, {2, 3}, 6, "new")
    t.merge_batch(_batch(spark, [
        (10 + i, "insert", r, p, f"c{i}", "old") for i, (r, p) in
        enumerate(old_keys)]), 0)
    t.merge_batch(_batch(spark, [
        (100 + i, "insert", r, p, f"d{i}", "new") for i, (r, p) in
        enumerate(new_keys)]), 1)

    full = t.read()
    filt = t.read(filters=[("seq", ">=", 100)])
    assert len(filt.inputFiles()) < len(full.inputFiles())
    got = {(r.repo, r.path, r.seq) for r in filt.collect()}
    want = {(r.repo, r.path, r.seq) for r in
            full.where("seq >= 100").collect()}
    assert got == want and len(got) == 6

    # equality on a key column prunes too, and the row stays exact
    r0, p0 = old_keys[0]
    one = t.read(filters=[("repo", "=", r0), ("path", "=", p0)])
    assert len(one.inputFiles()) < len(full.inputFiles())
    assert [(r.repo, r.path) for r in one.collect()] == [(r0, p0)]


def test_mor_key_filter_prunes_generations(spark, tmp_path):
    """Append-mode generations from disjoint key populations give tight
    per-file key ranges; a key filter skips foreign generations."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=2)
    t.append_batch(_batch(spark, [
        (i, "insert", f"aaa{i}", "x.py", f"c{i}", "a") for i in range(8)]), 0)
    t.append_batch(_batch(spark, [
        (50 + i, "insert", f"zzz{i}", "x.py", f"d{i}", "z")
        for i in range(8)]), 1)
    full = t.read()
    filt = t.read(filters=[("repo", "=", "zzz3")])
    assert len(filt.inputFiles()) < len(full.inputFiles())
    assert [(r.repo, r.content) for r in filt.collect()] == [("zzz3", "z")]


def test_mor_value_filter_never_prunes_generations(spark, tmp_path):
    """The unsafe case the design forbids: in a mor bucket a NON-key
    filter must not skip files, or LWW could resolve against a stale
    generation. An out-of-order late STALE generation sits alone in the
    only file a naive seq<=5 pruner would keep — the correct answer is
    empty (the winner has seq 10)."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=1)
    t.append_batch(_batch(spark, [
        (10, "insert", "r", "a.py", "c10", "winner")]), 0)
    t.append_batch(_batch(spark, [
        (5, "insert", "r", "a.py", "c05", "stale")]), 1)  # late arrival
    assert t.read(filters=[("seq", "<=", 5)]).count() == 0
    got = t.read(filters=[("seq", ">=", 6)]).collect()
    assert [(r.seq, r.content) for r in got] == [(10, "winner")]


def test_lookup_skips_files_inside_bucket(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=1)
    t.append_batch(_batch(spark, [
        (i, "insert", f"aaa{i}", "x.py", f"c{i}", "a") for i in range(4)]), 0)
    t.append_batch(_batch(spark, [
        (9, "insert", "zzz9", "x.py", "d9", "z")]), 1)
    hit = t.lookup(repo="zzz9", path="x.py")
    assert len(hit.inputFiles()) == 1  # the aaa* generation is skipped
    assert [(r.repo, r.content) for r in hit.collect()] == [("zzz9", "z")]


def test_stats_disabled_and_missing_stats_still_correct(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=2,
                         stats_cols=[])
    t.merge_batch(_batch(spark, [
        (1, "insert", "rA", "a.py", "c1", "v1"),
        (2, "insert", "rB", "b.py", "c2", "v1"),
    ]), 0)
    snap = t.snapshot()
    assert all("stats" not in e
               for fs in snap["buckets"].values() for e in fs)
    got = t.read(filters=[("seq", ">=", 2)]).collect()
    assert [(r.repo, r.seq) for r in got] == [("rB", 2)]


def test_filter_validation():
    with pytest.raises(ValueError, match="unsupported filter op"):
        _normalize_filters([("seq", "!=", 1)])
    with pytest.raises(ValueError, match="null comparison"):
        _normalize_filters([("seq", "=", None)])
    with pytest.raises(ValueError, match="non-empty list"):
        _normalize_filters([("seq", "in", [])])
    with pytest.raises(ValueError, match="col, op, value"):
        _normalize_filters(["seq >= 1"])


def test_entry_may_match_boundaries():
    e = {"stats": {"seq": [10, 20], "repo": ["bbb", "ddd"]}}
    # equality: inside / on each edge / outside
    assert _entry_may_match(e, [("seq", "=", 10)])
    assert _entry_may_match(e, [("seq", "=", 20)])
    assert not _entry_may_match(e, [("seq", "=", 9)])
    assert not _entry_may_match(e, [("seq", "=", 21)])
    # ranges: only provably-disjoint skips
    assert _entry_may_match(e, [("seq", ">", 19)])
    assert not _entry_may_match(e, [("seq", ">", 20)])
    assert _entry_may_match(e, [("seq", ">=", 20)])
    assert not _entry_may_match(e, [("seq", ">=", 21)])
    assert _entry_may_match(e, [("seq", "<", 11)])
    assert not _entry_may_match(e, [("seq", "<", 10)])
    assert _entry_may_match(e, [("seq", "<=", 10)])
    assert not _entry_may_match(e, [("seq", "<=", 9)])
    # in: kept iff any value overlaps
    assert _entry_may_match(e, [("seq", "in", [1, 15])])
    assert not _entry_may_match(e, [("seq", "in", [1, 2])])
    # strings order lexicographically; conjunction: one miss skips
    assert not _entry_may_match(e, [("repo", "=", "aaa")])
    assert not _entry_may_match(e, [("seq", "=", 15), ("repo", "=", "zzz")])
    # unknown column / no stats / type mismatch: never skip
    assert _entry_may_match(e, [("content", "=", "x")])
    assert _entry_may_match({}, [("seq", "=", 999)])
    assert _entry_may_match(e, [("seq", "=", "not-an-int")])


def test_compact_target_rows_splits_and_minmax_prunes(spark, tmp_path):
    """target_rows_per_file splits a bucket's rewrite inside the write
    task: files stay key-sorted, so each split's manifest min/max is a
    tight disjoint key range and a lookup prunes to ONE file with no
    bloom at all — and a bucket whose single file exceeds the target is
    itself a compaction victim (resplit path)."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=1)
    rows = [(i, "insert", f"r{i:03d}", "a.py", f"c{i}", "v")
            for i in range(100)]
    t.merge_batch(_batch(spark, rows), 0)
    assert len(t.read().inputFiles()) == 1
    res = t.compact(target_rows_per_file=30)
    assert res["compacted_buckets"] == 1  # rows-over-target victim
    snap = t.snapshot()
    entries = snap["buckets"]["0"]
    assert len(entries) == 4  # ceil(100 / 30)
    assert all(int(e["rows"]) <= 30 for e in entries)
    # split files carry DISJOINT key ranges (task-local sort preserved)
    ranges = sorted((e["stats"]["repo"][0], e["stats"]["repo"][1])
                    for e in entries)
    assert all(ranges[i][1] < ranges[i + 1][0] for i in range(3))
    hit = t.lookup(repo="r042", path="a.py")
    assert len(hit.inputFiles()) == 1  # min/max alone prunes the splits
    assert [r.repo for r in hit.collect()] == ["r042"]
    got = {r.repo for r in t.read().collect()}
    assert got == {f"r{i:03d}" for i in range(100)}
    # already-split table is NOT a victim again (idempotent sizing)
    assert t.compact(target_rows_per_file=30)["compacted_buckets"] == 0


def test_compact_split_idempotent_above_threshold(spark, tmp_path):
    """Regression (review finding): a bucket optimally split into MORE
    files than max_files_per_bucket must not be re-selected as a victim
    on the next run — that would rewrite it every maintenance cycle."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=1)
    t.merge_batch(_batch(spark, [
        (i, "insert", f"r{i:03d}", "a.py", f"c{i}", "v")
        for i in range(100)]), 0)
    r1 = t.compact(target_rows_per_file=10)
    assert r1["compacted_buckets"] == 1
    assert len(t.snapshot()["buckets"]["0"]) == 10  # > default threshold 4
    r2 = t.compact(target_rows_per_file=10)
    assert r2["compacted_buckets"] == 0  # idempotent: no rewrite loop
    # without a target, 10 files ARE fragmentation again
    assert t.compact()["compacted_buckets"] == 1
    with pytest.raises(ValueError, match="target_rows_per_file"):
        t.compact(target_rows_per_file=0)
    with pytest.raises(ValueError, match="target_rows_per_file"):
        t.rebucket(2, target_rows_per_file=-5)


def test_time_travel_with_filters(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=1)
    t.merge_batch(_batch(spark, [
        (1, "insert", "rA", "a.py", "c1", "v1")]), 0)
    t.merge_batch(_batch(spark, [
        (2, "update", "rA", "a.py", "c2", "v2")]), 1)
    old = t.read_version(1, filters=[("seq", "<=", 1)]).collect()
    assert [(r.seq, r.content) for r in old] == [(1, "v1")]
    assert t.read_version(2, filters=[("seq", "<=", 1)]).count() == 0


# ---------------------------------------------------------------- property
# The load-bearing invariant of the whole skipping layer: for ANY table
# history (merge/append mixes, deletes, out-of-order seqs) and ANY
# supported filter set, read(filters=...) must equal read() row-filtered.
# Hypothesis hunts the corners a fixed fixture misses: filters straddling
# file boundaries, mor generations whose pruning would be unsafe,
# all-pruned reads, 'in' lists, key+value filter conjunctions.
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_REPOS = ["ra", "rb", "rc", "rd"]


@st.composite
def histories_and_filters(draw):
    n_batches = draw(st.integers(1, 3))
    batches = []
    seq = 0
    for _ in range(n_batches):
        rows = []
        for _ in range(draw(st.integers(1, 6))):
            op = draw(st.sampled_from(["insert", "update", "delete"]))
            rows.append((draw(st.integers(0, 40)), op,
                         draw(st.sampled_from(_REPOS)),
                         draw(st.sampled_from(["a.py", "b.py"])),
                         f"c{seq}", None if op == "delete" else "v"))
            seq += 1
        batches.append((draw(st.sampled_from(["merge", "append"])), rows))
    filters = draw(st.lists(st.one_of(
        st.tuples(st.just("repo"), st.just("="), st.sampled_from(_REPOS)),
        st.tuples(st.just("repo"), st.just("in"),
                  st.lists(st.sampled_from(_REPOS), min_size=1, max_size=2)),
        st.tuples(st.just("seq"), st.sampled_from(["<", "<=", ">", ">="]),
                  st.integers(0, 40)),
    ), min_size=1, max_size=3))
    return batches, filters


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(histories_and_filters())
def test_filtered_read_equals_row_filtered_full_read(spark, tmp_path_factory,
                                                     case):
    batches, filters = case
    from arlas_proc_spark.lake.table import _filters_to_column
    t = LakeTable.create(
        spark, str(tmp_path_factory.mktemp("skip") / "t"), SCHEMA,
        ["repo", "path"], "seq", n_buckets=2, bloom_bits_per_key=8)
    for i, (mode, rows) in enumerate(batches):
        b = _batch(spark, rows)
        (t.merge_batch if mode == "merge" else t.append_batch)(b, i)
    full = t.read()
    want = {tuple(r) for r in
            full.where(_filters_to_column(filters)).collect()}
    got = {tuple(r) for r in t.read(filters=filters).collect()}
    assert got == want
