"""Zero-copy shallow clones (LakeTable.shallow_clone — Delta SHALLOW
CLONE): one metadata commit references the source's files in place; the
clone diverges copy-on-write per touched bucket, its GC can never reach
source bytes, and clone creation tags the source snapshot so the
source's own GC keeps every referenced file until the tag drops."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import types as T

from arlas_proc_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("seq", T.LongType(), True),
    T.StructField("val", T.StringType(), True),
])


def _batch(spark, rows, op="insert"):
    return spark.createDataFrame(
        [r + (op,) for r in rows],
        "repo string, path string, seq long, val string, op string")


def _rows(i0, i1, seq, tag):
    return [(f"r{i % 5}", f"f{i}.py", seq + i, f"{tag}{i}")
            for i in range(i0, i1)]


def _state(t):
    return sorted((r.repo, r.path, r.seq, r.val)
                  for r in t.read().collect())


def _data_files(t):
    return [p for p in glob.glob(os.path.join(t.data_dir, "**", "*"),
                                 recursive=True)
            if os.path.isfile(p) and p.endswith(".parquet")]


def _src(spark, tmp_path, **kw):
    t = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=4, **kw)
    t.merge_batch(_batch(spark, _rows(0, 40, 0, "v")), 0)
    return t


def test_clone_is_zero_copy_and_reads_equal(spark, tmp_path):
    src = _src(spark, tmp_path)
    c = LakeTable.shallow_clone(spark, src.path, str(tmp_path / "c"))
    assert _state(c) == _state(src)
    assert _data_files(c) == []               # zero bytes copied
    assert c.count_rows() == 40               # manifest stats carried
    # source snapshot is pinned by a tag
    assert any(k.startswith("clone-") for k in src.snapshot()["tags"])
    with pytest.raises(ValueError, match="already holds"):
        LakeTable.shallow_clone(spark, src.path, str(tmp_path / "c"))


def test_clone_diverges_copy_on_write_per_bucket(spark, tmp_path):
    src = _src(spark, tmp_path)
    before = _state(src)
    c = LakeTable.shallow_clone(spark, src.path, str(tmp_path / "c"))
    c.merge_batch(_batch(spark, [("r0", "f0.py", 999, "CLONE")]), 1)
    assert _state(src) == before              # source untouched
    got = {r.path: r.val for r in c.read().where("repo='r0'").collect()}
    assert got["f0.py"] == "CLONE" and got["f5.py"] == "v5"
    # only the touched bucket localized: others still reference src
    snap = c.snapshot()
    ext = [b for b in snap["buckets"]
           if any("root" in e for e in snap["buckets"][b])]
    loc = [b for b in snap["buckets"]
           if all("root" not in e for e in snap["buckets"][b])]
    assert len(loc) == 1 and len(ext) == 3


def test_ledger_carries_replay_noop(spark, tmp_path):
    src = _src(spark, tmp_path)
    c = LakeTable.shallow_clone(spark, src.path, str(tmp_path / "c"))
    # batch 0 was applied on the source pre-clone: replaying it onto
    # the clone must be the exactly-once no-op a resumed stream expects
    r = c.merge_batch(_batch(spark, _rows(0, 40, 5000, "X")), 0)
    assert r.get("skipped") is True
    assert _state(c) == _state(src)


def test_compact_localizes_then_gc_never_touches_source(spark, tmp_path):
    src = _src(spark, tmp_path)
    n_src_files = len(_data_files(src))
    c = LakeTable.shallow_clone(spark, src.path, str(tmp_path / "c"))
    c.compact(max_files_per_bucket=0)         # every bucket a victim
    snap = c.snapshot()
    assert all("root" not in e for b in snap["buckets"]
               for e in snap["buckets"][b])   # fully localized
    assert _state(c) == _state(src)
    c.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
    assert len(_data_files(src)) == n_src_files   # src bytes intact
    assert _state(c) == _state(src)


def test_source_gc_respects_clone_tag(spark, tmp_path):
    src = _src(spark, tmp_path)
    c = LakeTable.shallow_clone(spark, src.path, str(tmp_path / "c"))
    # churn the source far past the retention window
    for i in range(4):
        src.merge_batch(_batch(spark, _rows(0, 40, 100 * (i + 1), "w")),
                        i + 1)
    src.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
    assert len(_state(c)) == 40               # clone still fully readable
    assert {v for *_, v in _state(c)} == {f"v{i}" for i in range(40)}
    # dropping the tag and expiring again reclaims the pinned files —
    # the documented operator hazard, explicit instead of silent
    tag = next(k for k in src.snapshot()["tags"] if k.startswith("clone-"))
    src.drop_tag(tag)
    src.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
    assert _state(src)                        # source itself unharmed


def test_bloom_probes_cross_roots(spark, tmp_path):
    src = _src(spark, tmp_path, bloom_bits_per_key=10)
    c = LakeTable.shallow_clone(spark, src.path, str(tmp_path / "c"))
    got = c.lookup(repo="r1", path="f1.py").collect()
    assert len(got) == 1 and got[0].val == "v1"


def test_clone_of_clone_chains_roots(spark, tmp_path):
    src = _src(spark, tmp_path)
    c1 = LakeTable.shallow_clone(spark, src.path, str(tmp_path / "c1"))
    c1.merge_batch(_batch(spark, [("r0", "f0.py", 999, "C1")]), 1)
    c2 = LakeTable.shallow_clone(spark, c1.path, str(tmp_path / "c2"))
    assert _state(c2) == _state(c1)
    assert _data_files(c2) == []
    # c2's roots point at BOTH storages: src's untouched buckets and
    # c1's localized one
    assert len(c2.snapshot()["external_roots"]) == 2


def test_schema_evolution_on_clone_is_isolated(spark, tmp_path):
    src = _src(spark, tmp_path)
    c = LakeTable.shallow_clone(spark, src.path, str(tmp_path / "c"))
    c.drop_column("val")
    assert "val" not in c.read().columns
    assert "val" in src.read().columns        # source untouched
    c.add_column("score", "double")
    assert {r.score for r in c.read().collect()} == {None}


def test_mor_generations_clone_and_resolve(spark, tmp_path):
    src = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                           ["repo", "path"], "seq", n_buckets=4)
    src.append_batch(_batch(spark, _rows(0, 30, 0, "a")), 0)
    src.append_batch(_batch(spark, _rows(10, 40, 100, "b")), 1)
    c = LakeTable.shallow_clone(spark, src.path, str(tmp_path / "c"))
    assert _state(c) == _state(src)
    assert sorted(c.snapshot()["mor_buckets"], key=int) == \
        sorted(src.snapshot()["mor_buckets"], key=int)


def test_changefeed_clone_marks_log_gap(spark, tmp_path):
    src = _src(spark, tmp_path, changefeed=True)
    c = LakeTable.shallow_clone(spark, src.path, str(tmp_path / "c"))
    assert c.snapshot().get("log_gap_version") == 0
    c.merge_batch(_batch(spark, [("r0", "f0.py", 999, "u")]), 1)
    ch = c.read_changes(0, c.snapshot()["version"]).collect()
    assert {r.change_type for r in ch} == {"update_postimage"}
