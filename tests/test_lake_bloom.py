"""Per-file bloom sidecars: point lookups skip files the key cannot be
in, even when hash-mixed key RANGES make min/max stats useless. The
LSM per-SSTable bloom / Iceberg puffin pattern; built distributed at
commit time, probed driver-side from the manifest reference."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from arlas_proc_spark.lake.table import LakeTable, _bloom_size

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


def _gen(spark, keys, seq0, content):
    return _batch(spark, [
        (seq0 + i, "insert", r, "x.py", f"c{seq0 + i}", content)
        for i, r in enumerate(keys)])


# INTERLEAVED key populations: every generation's (min, max) key range
# spans the whole alphabet, so min/max stats can never tell the files
# apart — only the bloom can.
GEN_KEYS = [
    [f"r{i:02d}" for i in range(0, 30, 3)],   # r00, r03, ...
    [f"r{i:02d}" for i in range(1, 30, 3)],   # r01, r04, ...
    [f"r{i:02d}" for i in range(2, 30, 3)],   # r02, r05, ...
]


def _bloom_table(spark, tmp_path, name="t"):
    t = LakeTable.create(spark, str(tmp_path / name), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=1,
                         bloom_bits_per_key=10)
    for g, keys in enumerate(GEN_KEYS):
        t.append_batch(_gen(spark, keys, 100 * g, f"gen{g}"), g)
    return t


def test_sidecars_written_and_referenced(spark, tmp_path):
    t = _bloom_table(spark, tmp_path)
    snap = t.snapshot()
    entries = [e for fs in snap["buckets"].values() for e in fs]
    assert len(entries) == 3
    for e in entries:
        assert e["bloom"]["file"] == e["file"] + ".bloom"
        side = os.path.join(t.data_dir, e["bloom"]["file"])
        assert os.path.getsize(side) == e["bloom"]["m"] // 8
        # min/max ranges really do all overlap (the scenario under test)
        assert e["stats"]["repo"][0] <= "r02" and e["stats"]["repo"][1] >= "r27"


def test_lookup_skips_foreign_generations(spark, tmp_path):
    t = _bloom_table(spark, tmp_path)
    full_files = len(t.read().inputFiles())
    assert full_files == 3
    hit = t.lookup(repo="r04", path="x.py")  # lives in generation 1 only
    assert len(hit.inputFiles()) == 1
    assert [(r.repo, r.content) for r in hit.collect()] == [("r04", "gen1")]


def test_no_false_negatives_any_key(spark, tmp_path):
    t = _bloom_table(spark, tmp_path)
    for g, keys in enumerate(GEN_KEYS):
        for r in keys:
            got = t.lookup(repo=r, path="x.py").collect()
            assert [(x.repo, x.content) for x in got] == [(r, f"gen{g}")]


def test_absent_key_scans_nothing(spark, tmp_path):
    t = _bloom_table(spark, tmp_path)
    miss = t.lookup(repo="nope", path="nope.py")
    assert miss.count() == 0
    assert miss.inputFiles() == []  # all three files bloom-skipped


def test_lww_across_generations_unaffected(spark, tmp_path):
    """The same key updated in a LATER generation: both files pass the
    bloom, LWW picks the newer — blooms never hide a generation."""
    t = LakeTable.create(spark, str(tmp_path / "t2"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=1,
                         bloom_bits_per_key=10)
    t.append_batch(_gen(spark, ["rA", "rB"], 0, "old"), 0)
    t.append_batch(_gen(spark, ["rA"], 100, "new"), 1)
    hit = t.lookup(repo="rA", path="x.py")
    assert len(hit.inputFiles()) == 2
    assert [r.content for r in hit.collect()] == ["new"]


def test_compaction_rebuilds_blooms_and_gc_keeps_live_sidecars(spark, tmp_path):
    t = _bloom_table(spark, tmp_path)
    t.compact(max_files_per_bucket=1)
    snap = t.snapshot()
    entries = [e for fs in snap["buckets"].values() for e in fs]
    assert len(entries) == 1 and "bloom" in entries[0]
    res = t.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
    assert res["orphan_files_removed"] >= 3  # old gens + their sidecars
    live = os.path.join(t.data_dir, entries[0]["bloom"]["file"])
    assert os.path.exists(live)
    hit = t.lookup(repo="r04", path="x.py")
    assert [r.content for r in hit.collect()] == ["gen1"]
    assert t.lookup(repo="nope", path="n.py").inputFiles() == []


def test_merge_cow_writes_blooms_too(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t3"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=2,
                         bloom_bits_per_key=10)
    t.merge_batch(_gen(spark, ["rA", "rB", "rC"], 0, "v1"), 0)
    snap = t.snapshot()
    assert all("bloom" in e
               for fs in snap["buckets"].values() for e in fs)
    assert [r.content for r in t.lookup(repo="rB", path="x.py").collect()] \
        == ["v1"]


def test_disabled_by_default(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t4"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=1)
    t.append_batch(_gen(spark, ["rA"], 0, "v"), 0)
    snap = t.snapshot()
    assert all("bloom" not in e
               for fs in snap["buckets"].values() for e in fs)
    assert t.lookup(repo="rA", path="x.py").count() == 1


def test_engine_threads_bloom_option(spark, tmp_path):
    from arlas_proc_spark.cdc.engine import CdcEngine
    eng = CdcEngine(spark, str(tmp_path / "t5"), n_buckets=2,
                    write_mode="mor", bloom_bits_per_key=10)
    eng.apply_batch(_gen(spark, ["rA", "rB"], 0, "v1"), 0)
    snap = eng.table.snapshot()
    assert snap["bloom_bits_per_key"] == 10
    assert all("bloom" in e
               for fs in snap["buckets"].values() for e in fs)


INT_KEY_SCHEMA = T.StructType([
    T.StructField("kid", T.LongType(), False),
    T.StructField("seq", T.LongType(), True),
    T.StructField("content", T.StringType(), True),
])


def test_int_key_build_probe_parity(spark, tmp_path):
    """Build hashes Spark's cast-to-string ('7'), probe hashes str(7):
    they must agree or the bloom false-negatives an existing key. Also:
    a FLOAT probe value (7.0) must bypass the bloom (type-gated) and
    still return the row via the residual filter."""
    t = LakeTable.create(spark, str(tmp_path / "ti"), INT_KEY_SCHEMA,
                         ["kid"], "seq", n_buckets=1, bloom_bits_per_key=10)
    for g in range(2):
        df = spark.createDataFrame(
            [(10 * g + i, 100 * g + i, "insert", f"g{g}") for i in range(5)],
            "kid long, seq long, op string, content string")
        t.append_batch(df, g)
    hit = t.lookup(kid=13)
    assert len(hit.inputFiles()) == 1
    assert [r.content for r in hit.collect()] == ["g1"]
    assert t.lookup(kid=999).inputFiles() == []
    fl = t.read(buckets=[0], filters=[("kid", "=", 13.0)])
    assert [r.content for r in fl.collect()] == ["g1"]  # bloom bypassed


def test_lookup_null_key_returns_empty(spark, tmp_path):
    """lookup(key=None) keeps SQL null-equality semantics (empty result)
    instead of tripping the filter validator."""
    t = _bloom_table(spark, tmp_path, name="tnull")
    assert t.lookup(repo=None, path="x.py").count() == 0


def test_unrestricted_key_read_still_exact(spark, tmp_path):
    """A full-table read with key-equality filters skips the bloom tier
    (no bucket restriction → a probe per file table-wide would defeat
    the point) but must stay exact via min/max + residual."""
    t = _bloom_table(spark, tmp_path, name="tur")
    got = t.read(filters=[("repo", "=", "r04"), ("path", "=", "x.py")])
    assert [(r.repo, r.content) for r in got.collect()] == [("r04", "gen1")]


def test_bloom_size_floor_and_growth():
    m_small, k = _bloom_size(1, 10)
    assert m_small == 8192 and k == 7  # 1 KiB floor
    m_big, _ = _bloom_size(1_000_000, 10)
    assert m_big >= 10_000_000 and (m_big & (m_big - 1)) == 0
