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


def test_set_bloom_bits_adopts_on_existing_table(spark, tmp_path):
    """Enable blooms on a table created WITHOUT them: old files stay
    sidecar-less (never skipped — still exact), new commits gain
    sidecars, and the flag flip is a metadata-only versioned commit."""
    t = LakeTable.create(spark, str(tmp_path / "ta"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=1)
    t.append_batch(_gen(spark, GEN_KEYS[0], 0, "gen0"), 0)
    v_before = t.snapshot()["version"]
    assert t.set_bloom_bits(10) == {"bloom_bits_per_key": 10,
                                    "changed": True}
    assert t.snapshot()["version"] == v_before + 1  # metadata commit
    assert t.set_bloom_bits(10) == {"bloom_bits_per_key": 10,
                                    "changed": False}  # idempotent no-op
    t.append_batch(_gen(spark, GEN_KEYS[1], 100, "gen1"), 1)
    entries = {e["file"]: e for fs in t.snapshot()["buckets"].values()
               for e in fs}
    blooms = [("bloom" in e) for e in entries.values()]
    assert sorted(blooms) == [False, True]  # old file bare, new file armed
    # pre-flag file has no sidecar → never skipped → lookup stays exact
    got = t.lookup(repo="r00", path="x.py")
    assert [(r.repo, r.content) for r in got.collect()] == [("r00", "gen0")]
    # post-flag key: the bare gen0 file can't be skipped, gen1's can be
    # probed — correctness is the invariant, not the skip count
    got1 = t.lookup(repo="r01", path="x.py")
    assert [(r.repo, r.content) for r in got1.collect()] == [("r01", "gen1")]


def test_engine_adopts_bloom_flag_on_preexisting_table(spark, tmp_path):
    """CdcEngine(bloom_bits_per_key=N) against a table that already
    exists must not silently drop the request (create-only-flag trap)."""
    from arlas_proc_spark.cdc.engine import CdcEngine
    path = str(tmp_path / "te")
    eng0 = CdcEngine(spark, path, n_buckets=1, write_mode="mor")
    eng0.apply_batch(_gen(spark, ["rA"], 0, "v1"), 0)
    assert int(eng0.table.snapshot().get("bloom_bits_per_key", 0)) == 0
    eng1 = CdcEngine(spark, path, n_buckets=1, write_mode="mor",
                     bloom_bits_per_key=10)
    assert eng1.table.snapshot()["bloom_bits_per_key"] == 10
    eng1.apply_batch(_gen(spark, ["rB"], 100, "v2"), 1)
    entries = {e["file"]: e for fs in
               eng1.table.snapshot()["buckets"].values() for e in fs}
    assert any("bloom" in e for e in entries.values())
    # unspecified (0) leaves the table's own flag alone
    eng2 = CdcEngine(spark, path, n_buckets=1, write_mode="mor")
    assert eng2.table.snapshot()["bloom_bits_per_key"] == 10


def test_refused_engine_construction_does_not_adopt_bloom(spark, tmp_path):
    """A CdcEngine construction refused by validation (mor writer on a
    changefeed table) must leave the table untouched — including the
    bloom-flag adoption commit (review finding: adoption used to run
    before the snapshot-level changefeed check)."""
    import pytest
    from arlas_proc_spark.cdc.engine import CdcEngine
    path = str(tmp_path / "tcf")
    CdcEngine(spark, path, n_buckets=1, changefeed=True)
    t = LakeTable(spark, path)
    v0 = t.snapshot()["version"]
    with pytest.raises(ValueError, match="changefeed"):
        CdcEngine(spark, path, n_buckets=1, write_mode="mor",
                  bloom_bits_per_key=10)
    snap = t.snapshot()
    assert snap["version"] == v0  # no half-made metadata commit
    assert int(snap.get("bloom_bits_per_key", 0)) == 0


def test_unknown_bloom_scheme_never_skips(spark, tmp_path):
    """A sidecar stamped with a different hash scheme must degrade to
    'never skip' (probing another scheme's bitmap can false-negative =
    silent row loss). Tamper the manifest's scheme id and assert the
    file is scanned yet results stay exact."""
    import json
    t = _bloom_table(spark, tmp_path, name="ts")
    # rewrite the current manifest with a bogus scheme on every entry
    snap = t.snapshot()
    for fs in snap["buckets"].values():
        for e in fs:
            if "bloom" in e:
                e["bloom"]["h"] = "other-scheme-v9"
    # hand-write the tampered snapshot in the legacy inline-buckets
    # format (the loader supports both; json can't dump the lazy mapping)
    snap["buckets"] = {b: fs for b, fs in snap["buckets"].items()}
    mf = os.path.join(t.meta_dir, f"v{snap['version']:010d}.json")
    with open(mf, "w") as f:
        json.dump(snap, f)
    hit = t.lookup(repo="r04", path="x.py")
    assert len(hit.inputFiles()) == 3  # nothing skipped under unknown scheme
    assert [(r.repo, r.content) for r in hit.collect()] == [("r04", "gen1")]
