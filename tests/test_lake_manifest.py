"""Sharded manifest (per-bucket manifest files + manifest list).

The r3 layout serialized every bucket's file entries into one
whole-table JSON per commit — O(table files) driver metadata IO on every
commit. This suite pins the Iceberg manifest-list shape that replaced
it: commits write only the touched buckets' manifests, untouched
buckets carry their content-addressed manifest reference forward with
zero IO, metadata-only commits write zero manifests, and expired
versions' manifests GC.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from arlas_proc_spark.lake.table import LakeTable, _LazyBuckets

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
        rows, "seq long, op string, repo string, path string, "
              "commit string, content string"
    ).select("repo", "path", "commit", "seq", "content", "op")


def _manifests(t):
    return {f for f in os.listdir(t.meta_dir)
            if f.startswith("m-") and f.endswith(".json")}


def _raw_listing(t, version=None):
    v = version if version is not None else t.snapshot()["version"]
    with open(os.path.join(t.meta_dir, f"v{v:010d}.json")) as f:
        return json.load(f)["manifest_list"]


def _wide_table(spark, tmp_path, n_buckets=16, rows=64):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=n_buckets)
    t.merge_batch(_batch(spark, [
        _ev(i, "insert", f"r{i % 8}", f"f{i}.py", f"c{i}", f"v{i}")
        for i in range(rows)]), 0)
    return t


def test_snapshot_json_holds_list_not_entries(spark, tmp_path):
    t = _wide_table(spark, tmp_path)
    raw = _raw_listing(t)
    # the snapshot JSON carries only per-bucket references + summaries
    # (fixed-size scalars — the per-FILE entries live in the manifest)
    for ref in raw.values():
        assert set(ref) == {"manifest", "files", "rows", "bytes", "live",
                            "dead", "max_file_rows"}
        if ref["files"]:
            assert ref["manifest"] in _manifests(t)
        else:
            assert ref["manifest"] is None
    # and the lazy view reconstructs the same entries the manifests hold
    snap = t.snapshot()
    assert isinstance(snap["buckets"], _LazyBuckets)
    total = sum(len(fs) for fs in snap["buckets"].values())
    assert total == sum(ref["files"] for ref in raw.values())
    assert total > 0


def test_commit_rewrites_only_touched_bucket_manifests(spark, tmp_path):
    t = _wide_table(spark, tmp_path, n_buckets=16, rows=64)
    v1 = t.snapshot()["version"]
    list1 = _raw_listing(t, v1)
    before = _manifests(t)
    # a one-key batch touches exactly one bucket
    t.merge_batch(_batch(spark, [
        _ev(1000, "update", "r0", "f0.py", "cx", "new")]), 1)
    v2 = t.snapshot()["version"]
    list2 = _raw_listing(t, v2)
    after = _manifests(t)
    changed = [b for b in list2
               if list2[b]["manifest"] != (list1.get(b) or {}).get("manifest")]
    assert len(changed) == 1           # one bucket touched -> one new ref
    assert len(after - before) == 1    # exactly one new manifest file
    # every untouched bucket reuses its manifest file name verbatim
    for b in list2:
        if b not in changed:
            assert list2[b] == list1[b]


def test_metadata_only_commit_writes_no_manifests(spark, tmp_path):
    t = _wide_table(spark, tmp_path)
    before = _manifests(t)
    list_before = _raw_listing(t)
    t.set_tag("release")
    assert _manifests(t) == before
    assert _raw_listing(t) == list_before


def test_summaries_match_entries(spark, tmp_path):
    t = _wide_table(spark, tmp_path)
    snap = t.snapshot()
    stats = {s["bucket"]: s for s in t.bucket_stats()}
    counts = t.file_counts()
    for b in snap["buckets"]:
        fs = snap["buckets"][b]
        assert counts[b] == len(fs)
        assert stats[int(b)]["files"] == len(fs)
        assert stats[int(b)]["rows"] == sum(e["rows"] for e in fs)
        assert stats[int(b)]["bytes"] == sum(e["bytes"] for e in fs)


def test_unchanged_content_dedups_to_same_manifest(spark, tmp_path):
    """Content addressing: re-serializing an unchanged bucket (e.g. a
    bucket the merge read but did not modify) reuses the SAME manifest
    file — equal entries hash to equal names, so no duplicate files."""
    t = _wide_table(spark, tmp_path, n_buckets=4, rows=16)
    snap = t.snapshot()
    v = snap["version"]
    _ = [snap["buckets"][b] for b in snap["buckets"]]   # load + cache all
    files_before = _manifests(t)
    # every bucket is now cached, so the committer must re-serialize all
    # of them — content addressing collapses each to its existing file
    t._commit_snapshot({**snap, "version": v + 1}, expected_version=v)
    assert _manifests(t) == files_before       # zero new manifest files
    assert _raw_listing(t, v + 1) == _raw_listing(t, v)


def test_expire_gcs_orphan_manifests(spark, tmp_path):
    t = _wide_table(spark, tmp_path, n_buckets=4, rows=8)
    for i in range(1, 4):
        t.merge_batch(_batch(spark, [
            _ev(100 + i, "update", "r0", "f0.py", f"c{i}", f"g{i}")]), i)
    n_before = len(_manifests(t))
    res = t.expire_snapshots(keep_last=1, orphan_grace_s=0)
    assert res["orphan_manifests_removed"] >= 1
    after = _manifests(t)
    assert len(after) < n_before
    # every retained snapshot still fully readable
    assert t.read().count() == 8
    live = {ref["manifest"] for ref in _raw_listing(t).values()
            if ref["manifest"]}
    assert live <= after


def test_legacy_inline_snapshot_still_loads(spark, tmp_path):
    """Pre-sharding snapshots stored bucket entries inline; the loader
    accepts them and the NEXT commit shards the table."""
    t = _wide_table(spark, tmp_path, n_buckets=4, rows=8)
    snap = t.snapshot()
    inline = {**{k: v for k, v in snap.items() if k != "buckets"},
              "buckets": {b: snap["buckets"][b] for b in snap["buckets"]}}
    v = snap["version"]
    name = f"v{v:010d}.json"
    os.remove(os.path.join(t.meta_dir, name))
    with open(os.path.join(t.meta_dir, name), "w") as f:
        json.dump(inline, f)
    t2 = LakeTable(spark, t.path)
    assert t2.read().count() == 8
    assert isinstance(t2.snapshot()["buckets"], dict)
    t2.merge_batch(_batch(spark, [
        _ev(500, "update", "r0", "f0.py", "cz", "q")]), 99)
    assert "manifest_list" in json.load(
        open(os.path.join(t2.meta_dir, t2._current_name())))
    assert t2.read().count() == 8
    assert isinstance(t2.snapshot()["buckets"], _LazyBuckets)


def test_merge_loads_only_touched_bucket_manifests(spark, tmp_path):
    """The O(touched) claim, measured: a one-bucket merge must open only
    that bucket's manifest, never the other 15."""
    t = _wide_table(spark, tmp_path, n_buckets=16, rows=64)
    snap = t.snapshot()
    loaded_before = set(snap["buckets"]._cache)
    assert loaded_before == set()
    # drive the same read path merge_batch uses for its current-state scan
    row = t.lookup(repo="r0", path="f0.py")
    row.collect()
    # lookup restricted the read to one bucket -> at most one manifest load
    snap2 = t.snapshot()
    one = t.read(buckets=[3], snapshot=snap2)
    one.count()
    assert len(snap2["buckets"]._cache) <= 1


def test_py_bucket_matches_spark_hash(spark):
    """The driver-side Murmur3 replica must agree with Spark's `hash`
    expression on every supported type, including unicode, empty
    strings, non-4-aligned byte lengths (the per-byte tail), negative
    numbers, and int-vs-long width differences."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    from arlas_proc_spark.lake.table import bucket_expr, py_bucket

    strings = ["", "a", "ab", "abc", "abcd", "abcde", "répo/päth",
               "日本語テキスト", "x" * 1000, "repo_0042", "src/main.py",
               "\x00\x01", "emoji 🚀🔥", "tab\tnl\n"]
    longs = [0, 1, -1, 42, -42, 2**31 - 1, -2**31, 2**62, -2**62]
    ints = [0, 1, -1, 2**31 - 1, -2**31, 12345, -999]

    for n in (1, 7, 16, 256):
        rows = [(s, lo) for s, lo in zip(strings, longs * 2)]
        df = spark.createDataFrame(rows, T.StructType([
            T.StructField("s", T.StringType()),
            T.StructField("lo", T.LongType())]))
        got = df.select("s", "lo",
                        bucket_expr(["s", "lo"], n).alias("b")).collect()
        for r in got:
            assert py_bucket([r.s, r.lo], ["string", "long"], n) == r.b, \
                (r.s, r.lo, n)

    df = spark.createDataFrame([(i,) for i in ints], T.StructType(
        [T.StructField("i", T.IntegerType())]))
    got = df.select("i", bucket_expr(["i"], 16).alias("b")).collect()
    for r in got:
        assert py_bucket([r.i], ["integer"], 16) == r.b, r.i

    # unsupported type -> None (caller falls back), never a wrong bucket
    assert py_bucket([1.5], ["double"], 16) is None
    # null key values pass through (Spark skips nulls in hash chaining)
    df = spark.createDataFrame([("a", None)], T.StructType([
        T.StructField("s", T.StringType()),
        T.StructField("lo", T.LongType())]))
    r = df.select(bucket_expr(["s", "lo"], 16).alias("b")).collect()[0]
    assert py_bucket(["a", None], ["string", "long"], 16) == r.b


def test_lookup_launches_no_pre_read_jobs(spark, tmp_path):
    """Point lookup computes its bucket driver-side: zero Spark jobs
    before the pruned read (the read itself is lazy)."""
    t = _wide_table(spark, tmp_path, n_buckets=16, rows=64)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup() or [])
    df = t.lookup(repo="r0", path="f0.py")   # no action triggered yet
    after = len(tracker.getJobIdsForGroup() or [])
    assert after == before, "lookup launched a Spark job before the read"
    rows = df.collect()
    assert [(r.repo, r.path) for r in rows] == [("r0", "f0.py")]


# ---------------------------------------------------------------- count_rows

def test_count_rows_metadata_only_on_cow(spark, tmp_path):
    """Inserts, updates and deletes over several commits: count_rows()
    equals a real scan, with ZERO buckets falling back to Spark — the
    whole count comes from the manifest list's live-row sums."""
    t = _wide_table(spark, tmp_path, n_buckets=4, rows=32)
    t.merge_batch(_batch(spark, [
        _ev(100 + i, "update", f"r{i % 8}", f"f{i}.py", f"c{i}u", f"V{i}")
        for i in range(0, 10)]), 1)
    t.merge_batch(_batch(spark, [
        _ev(200 + i, "delete", f"r{i % 8}", f"f{i}.py", f"c{i}d", None)
        for i in range(3, 9)]), 2)
    fresh = LakeTable(spark, t.path)  # re-read everything from disk
    meta, fallback = fresh._count_rows_detail()
    assert fallback == []
    assert meta == 32 - 6
    assert fresh.count_rows() == fresh.read().count() == 26
    # the per-bucket live stat is visible operationally too
    stats = fresh.bucket_stats()
    assert sum(s["live"] for s in stats) == 26
    assert any(s["live"] < s["rows"] for s in stats)  # tombstones exist


def test_count_rows_all_tombstone_files(spark, tmp_path):
    """Deleting every key leaves files that are 100% tombstones — the
    all-true row-group stats branch — and a metadata-only count of 0."""
    t = _wide_table(spark, tmp_path, n_buckets=2, rows=8)
    t.merge_batch(_batch(spark, [
        _ev(100 + i, "delete", f"r{i % 8}", f"f{i}.py", f"c{i}d", None)
        for i in range(8)]), 1)
    meta, fallback = t._count_rows_detail()
    assert fallback == [] and meta == 0
    assert t.count_rows() == 0 == t.read().count()


def test_count_rows_mor_buckets_fall_back_until_compact(spark, tmp_path):
    """Merge-on-read generations overlap per key, so mor buckets must be
    LWW-scanned; compact() folds them and the count returns to pure
    metadata."""
    t = _wide_table(spark, tmp_path, n_buckets=2, rows=8)
    t.append_batch(_batch(spark, [
        _ev(100 + i, "update", f"r{i % 8}", f"f{i}.py", f"c{i}u", f"V{i}")
        for i in range(4)] + [
        _ev(200, "delete", "r5", "f5.py", "c5d", None)]), 1)
    meta, fallback = t._count_rows_detail()
    assert fallback == [0, 1]  # every touched bucket is mor now
    assert t.count_rows() == t.read().count() == 7
    t.compact(max_files_per_bucket=1)
    meta2, fallback2 = t._count_rows_detail()
    assert fallback2 == []
    assert meta2 == 7 == t.count_rows()


def test_count_rows_legacy_manifest_without_live_falls_back(spark, tmp_path):
    """Manifests written before the live stat existed: the affected
    bucket scans, the rest still count from metadata, total stays
    exact."""
    from arlas_proc_spark.lake.table import _manifest_body
    import hashlib
    t = _wide_table(spark, tmp_path, n_buckets=4, rows=32)
    v = t.snapshot()["version"]
    with open(os.path.join(t.meta_dir, f"v{v:010d}.json")) as f:
        raw = json.load(f)
    listing = raw["manifest_list"]
    victim = sorted(listing)[0]
    with open(os.path.join(t.meta_dir, listing[victim]["manifest"])) as f:
        entries = json.load(f)["entries"]
    for e in entries:
        e.pop("live", None)
    body = _manifest_body(entries)
    name = f"m-{hashlib.sha256(body.encode()).hexdigest()[:20]}.json"
    with open(os.path.join(t.meta_dir, name), "w") as f:
        f.write(body)
    listing[victim] = {k: v2 for k, v2 in listing[victim].items()
                       if k != "live"}
    listing[victim]["manifest"] = name
    with open(os.path.join(t.meta_dir, f"v{v:010d}.json"), "w") as f:
        json.dump(raw, f)
    fresh = LakeTable(spark, t.path)
    meta, fallback = fresh._count_rows_detail()
    assert fallback == [int(victim)]
    assert fresh.count_rows() == fresh.read().count() == 32
