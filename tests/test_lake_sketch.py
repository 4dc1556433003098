"""Per-file HLL sketch sidecars → metadata-only NDV (``LakeTable.ndv``).

The Iceberg puffin-stats pattern re-expressed with Spark's native
``hll_sketch_agg`` / ``hll_union_agg``: every commit sketches its new
files once (column-pruned read-back), and distinct-count questions are
answered by unioning the LIVE files' sketches — no table scan, ever.

The accuracy contract tested here: the unioned estimate stays within
the HLL lgK=12 error bound of the EXACT distinct count (and is exact
while cardinality sits in the sparse/coupon regime — all the small
dimension columns below), under cow rewrites, mor generations,
deletes, compaction, and rebucketing alike. Note there is no
"canonical" scan sketch to byte-compare against: a full-scan
hll_sketch_agg is itself a union of per-partition partials, so it too
drifts from the file-union by a register or two once sketches leave
sparse mode — both are estimates of the same live multiset."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from arlas_proc_spark.lake.table import _TOMB, LakeTable

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("seq", T.LongType(), True),
    T.StructField("lang", T.StringType(), True),
])


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, op string, repo string, path string, "
              "commit string, lang string",
    ).select("repo", "path", "commit", "seq", "lang", "op")


def _ev(seq, op, repo, path, commit, lang):
    return (seq, op, repo, path, commit, lang)


def _sketch_table(spark, tmp_path, name="t", **kw):
    kw.setdefault("sketch_cols", ["commit", "lang"])
    return LakeTable.create(spark, str(tmp_path / name), SCHEMA,
                            ["repo", "path"], "seq", n_buckets=4, **kw)


def _exact(t, col):
    """Exact distinct count over live rows — ndv()'s accuracy oracle."""
    return t.read().agg(F.countDistinct(col).alias("e")).collect()[0]["e"]


def _close(est, exact, tol=0.05):
    return abs(est - exact) <= max(1.0, tol * exact)


def _gen_rows(n, seq0=0, lang_mod=7):
    return [_ev(seq0 + i, "insert", f"r{i % 97:03d}", f"p{i:04d}.py",
                f"c{seq0 + i}", f"l{i % lang_mod}")
            for i in range(n)]


def test_union_tracks_exact_count_after_multi_batch_replay(spark,
                                                           tmp_path):
    t = _sketch_table(spark, tmp_path)
    t.merge_batch(_batch(spark, _gen_rows(300, 0)), 0)
    # second batch overwrites 100 keys (new commits) and adds 100 new
    t.merge_batch(_batch(spark, _gen_rows(200, 1000)[:200]), 1)
    nd = t.ndv()
    for col in ("commit", "lang"):
        assert nd[col]["covered_files"] == nd[col]["live_files"] > 0
        assert _close(nd[col]["ndv"], _exact(t, col)), col
    # lang has 7 distinct values — small cardinalities are HLL-exact
    assert nd["lang"]["ndv"] == 7


def test_cow_rewrite_drops_stale_sketches(spark, tmp_path):
    """Replacing every row's lang collapses NDV: the rewritten buckets'
    OLD sketches must stop counting (their files left the snapshot)."""
    t = _sketch_table(spark, tmp_path)
    rows = _gen_rows(120, 0, lang_mod=11)
    t.merge_batch(_batch(spark, rows), 0)
    assert t.ndv(["lang"])["lang"]["ndv"] == 11
    collapsed = [_ev(seq + 500, "update", r, p, c, "only")
                 for (seq, _op, r, p, c, _l) in rows]
    t.merge_batch(_batch(spark, collapsed), 1)
    nd = t.ndv(["lang"])["lang"]
    assert nd["ndv"] == 1
    assert nd["covered_files"] == nd["live_files"]


def test_tombstones_excluded_and_all_delete_file_still_covered(spark,
                                                               tmp_path):
    t = _sketch_table(spark, tmp_path, name="td")
    rows = _gen_rows(50, 0, lang_mod=5)
    t.merge_batch(_batch(spark, rows), 0)
    dels = [_ev(seq + 100, "delete", r, p, c, l)
            for (seq, _op, r, p, c, l) in rows if l != "l0"]
    t.merge_batch(_batch(spark, dels), 1)
    nd = t.ndv(["lang"])["lang"]
    assert nd["ndv"] == 1  # only l0 rows remain live
    assert nd["covered_files"] == nd["live_files"]
    assert nd["ndv"] == _exact(t, "lang")  # sparse regime: exact


def test_mor_generations_union_covers_all_live_values(spark, tmp_path):
    """mor appends never rewrite — each generation carries its own
    sketch and the union counts every value physically live across
    generations (overwritten values still count until compaction; that
    bound is the documented HLL-no-retraction semantics)."""
    t = _sketch_table(spark, tmp_path, name="tm")
    t.append_batch(_batch(spark, _gen_rows(100, 0, lang_mod=4)), 0)
    t.append_batch(_batch(spark, _gen_rows(100, 500, lang_mod=9)), 1)
    nd = t.ndv(["lang"])["lang"]
    assert nd["covered_files"] == nd["live_files"]
    assert nd["ndv"] == 9  # lang_mod=9 values superset the mod-4 ones
    # after compaction the generations fold and the invariant holds on
    # the resolved state
    t.compact(max_files_per_bucket=1)
    nd2 = t.ndv(["lang"])["lang"]
    assert nd2["covered_files"] == nd2["live_files"]
    assert nd2["ndv"] == _exact(t, "lang")


def test_enable_on_existing_table_coverage_converges_via_compact(
        spark, tmp_path):
    t = _sketch_table(spark, tmp_path, name="te", sketch_cols=[])
    t.merge_batch(_batch(spark, _gen_rows(80, 0)), 0)
    t.set_sketch_cols(["lang"])
    nd = t.ndv()["lang"]
    assert nd["covered_files"] == 0 and nd["live_files"] > 0
    # a merge touching ONE key rewrites (and sketches) only its bucket
    t.merge_batch(_batch(spark, [_ev(200, "update", "r000", "p0000.py",
                                     "c200", "l1")]), 1)
    nd = t.ndv()["lang"]
    assert 0 < nd["covered_files"] < nd["live_files"]
    # a full re-layout rewrites (and therefore sketches) everything
    t.rebucket(4)
    nd = t.ndv()["lang"]
    assert nd["covered_files"] == nd["live_files"]
    assert nd["ndv"] == _exact(t, "lang")


def test_set_sketch_cols_validates(spark, tmp_path):
    t = _sketch_table(spark, tmp_path, name="tv")
    for bad in (["nope"], [_TOMB]):
        try:
            t.set_sketch_cols(bad)
            raise AssertionError(f"accepted {bad}")
        except ValueError:
            pass
    assert t.set_sketch_cols(["lang"])["changed"] is True
    assert t.set_sketch_cols(["lang"])["changed"] is False


def test_rename_moves_config_and_compact_restores_coverage(spark,
                                                           tmp_path):
    t = _sketch_table(spark, tmp_path, name="tr", sketch_cols=["lang"])
    t.merge_batch(_batch(spark, _gen_rows(60, 0)), 0)
    t.rename_column("lang", "language")
    assert t.snapshot()["sketch_cols"] == ["language"]
    nd = t.ndv()["language"]
    assert nd["covered_files"] == 0  # old rows keyed by write-time name
    t.rebucket(4)
    nd = t.ndv()["language"]
    assert nd["covered_files"] == nd["live_files"]
    assert nd["ndv"] == 7


def test_gc_prunes_dead_sidecars_keeps_live(spark, tmp_path):
    t = _sketch_table(spark, tmp_path, name="tg")
    t.merge_batch(_batch(spark, _gen_rows(60, 0, lang_mod=6)), 0)
    before = t.ndv(["lang"])["lang"]
    # rewrite everything twice so batch-0/1 files leave all snapshots
    rows = _gen_rows(60, 1000, lang_mod=6)
    t.merge_batch(_batch(spark, rows), 1)
    t.merge_batch(_batch(spark, _gen_rows(60, 2000, lang_mod=6)), 2)
    n_dirs = len(glob.glob(os.path.join(t.stats_dir, "sk-*")))
    assert n_dirs == 3
    res = t.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
    assert res["orphan_sketches_removed"] >= 1
    nd = t.ndv(["lang"])["lang"]
    assert nd["covered_files"] == nd["live_files"]
    assert nd["ndv"] == before["ndv"] == 6


def test_ndv_at_version_time_travel(spark, tmp_path):
    t = _sketch_table(spark, tmp_path, name="tt")
    t.merge_batch(_batch(spark, _gen_rows(40, 0, lang_mod=3)), 0)
    v1 = t.snapshot()["version"]
    rows = _gen_rows(40, 100, lang_mod=10)
    t.merge_batch(_batch(spark, rows), 1)
    assert t.ndv(["lang"], version=v1)["lang"]["ndv"] == 3
    assert t.ndv(["lang"])["lang"]["ndv"] == 10


def test_rebucket_resketches_everything(spark, tmp_path):
    t = _sketch_table(spark, tmp_path, name="tb")
    t.merge_batch(_batch(spark, _gen_rows(90, 0, lang_mod=8)), 0)
    t.rebucket(8)
    nd = t.ndv(["lang"])["lang"]
    assert nd["covered_files"] == nd["live_files"]
    assert nd["ndv"] == 8 == _exact(t, "lang")
