"""Catalog: atomic multi-table visibility (lake/catalog.py).

The guarantee under test: a reader resolving tables THROUGH the catalog
can never observe a torn cross-table state — table commits become
visible only at the single catalog CAS flip, replayed transactions
(table merges AND the flip) are no-ops end to end, and one catalog
version addresses a consistent set of table versions (cross-table time
travel)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arlas_proc_spark.lake.catalog import Catalog
from arlas_proc_spark.lake.table import ConcurrentCommitError, LakeTable

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("seq", T.LongType(), True),
    T.StructField("lang", T.StringType(), True),
])

STATS_SCHEMA = T.StructType([
    T.StructField("lang", T.StringType(), False),
    T.StructField("seq", T.LongType(), True),
    T.StructField("n", T.LongType(), True),
])


def _rows(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, op string, repo string, path string, lang string",
    ).select("repo", "path", "seq", "lang", "op")


def _stats_of(spark, t):
    """Derived per-lang counts of a table state — the 'view' table's
    content (seq = max source seq so LWW merges apply cleanly)."""
    return (t.read().groupBy("lang")
            .agg(F.max("seq").alias("seq"), F.count("*").alias("n"))
            .withColumn("op", F.lit("insert")))


def _setup(spark, tmp_path):
    src = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA,
                           ["repo", "path"], "seq", n_buckets=2)
    stats = LakeTable.create(spark, str(tmp_path / "stats"), STATS_SCHEMA,
                             ["lang"], "seq", n_buckets=2)
    cat = Catalog.create(spark, str(tmp_path / "cat"))
    cat.register("src", src.path)
    cat.register("stats", stats.path)
    return src, stats, cat


def _txn(spark, src, stats, cat, batch, txn_id):
    """One multi-table transaction: merge source, refresh stats from it,
    flip the catalog. Safe to replay wholesale."""
    src.merge_batch(_rows(spark, batch), f"{txn_id}-src")
    stats.merge_batch(_stats_of(spark, src), f"{txn_id}-stats")
    return cat.commit(txn_id)


def test_no_torn_reads_before_flip_and_atomic_after(spark, tmp_path):
    src, stats, cat = _setup(spark, tmp_path)
    _txn(spark, src, stats, cat,
         [(1, "insert", "r1", "a.py", "py"),
          (2, "insert", "r2", "b.rs", "rs")], "t0")
    assert cat.read("src").count() == 2
    # next transaction: table commits land but the flip hasn't happened —
    # a catalog reader must still see the OLD consistent pair
    src.merge_batch(_rows(spark, [(3, "insert", "r3", "c.py", "py")]),
                    "t1-src")
    stats.merge_batch(_stats_of(spark, src), "t1-stats")
    assert cat.read("src").count() == 2          # not 3
    n_py = {r["lang"]: r["n"] for r in cat.read("stats").collect()}
    assert n_py == {"py": 1, "rs": 1}            # consistent with count=2
    res = cat.commit("t1")
    assert res["changed"] and not res["skipped"]
    assert cat.read("src").count() == 3
    n_py = {r["lang"]: r["n"] for r in cat.read("stats").collect()}
    assert n_py == {"py": 2, "rs": 1}            # consistent with count=3


def test_replayed_transaction_is_noop_end_to_end(spark, tmp_path):
    src, stats, cat = _setup(spark, tmp_path)
    batch = [(1, "insert", "r1", "a.py", "py")]
    r1 = _txn(spark, src, stats, cat, batch, "t0")
    cat_v = cat.snapshot()["version"]
    src_v = src.snapshot()["version"]
    # crash-replay: the whole transaction runs again with the same ids
    r2 = _txn(spark, src, stats, cat, batch, "t0")
    assert r2["skipped"] and not r1["skipped"]
    assert cat.snapshot()["version"] == cat_v
    assert src.snapshot()["version"] == src_v
    assert cat.read("src").count() == 1


def test_catalog_time_travel_is_cross_table_consistent(spark, tmp_path):
    src, stats, cat = _setup(spark, tmp_path)
    _txn(spark, src, stats, cat, [(1, "insert", "r1", "a.py", "py")], "t0")
    v0 = cat.snapshot()["version"]
    _txn(spark, src, stats, cat, [(2, "insert", "r2", "b.py", "py"),
                                  (3, "insert", "r3", "c.rs", "rs")], "t1")
    # one integer -> the consistent OLD pair
    assert cat.read("src", catalog_version=v0).count() == 1
    old = {r["lang"]: r["n"]
           for r in cat.read("stats", catalog_version=v0).collect()}
    assert old == {"py": 1}
    # and CURRENT is the consistent new pair
    new = {r["lang"]: r["n"] for r in cat.read("stats").collect()}
    assert new == {"py": 2, "rs": 1}
    assert cat.read("src").count() == 3


def test_pins_never_roll_backward(spark, tmp_path):
    src, stats, cat = _setup(spark, tmp_path)
    _txn(spark, src, stats, cat, [(1, "insert", "r1", "a.py", "py")], "t0")
    _txn(spark, src, stats, cat, [(2, "insert", "r2", "b.py", "py")], "t1")
    pinned = cat.tables()["src"]["version"]
    # a late replay of t0's flip with EXPLICIT old versions must not
    # move pins backward (its ledger entry may have rotated out)
    cat.commit("t0-late", versions={"src": 1})
    assert cat.tables()["src"]["version"] == pinned


def test_register_repin_and_drop(spark, tmp_path):
    src, stats, cat = _setup(spark, tmp_path)
    src.merge_batch(_rows(spark, [(1, "insert", "r1", "a.py", "py")]), 0)
    assert cat.read("src").count() == 0   # still pinned at create-version
    cat.register("src", src.path)         # re-pin at CURRENT
    assert cat.read("src").count() == 1
    cat.drop("stats")
    assert sorted(cat.tables()) == ["src"]
    with pytest.raises(ValueError):
        cat.read("stats")
    with pytest.raises(ValueError):
        cat.drop("stats")


def test_concurrent_catalog_writers_conflict_cleanly(spark, tmp_path):
    src, stats, cat = _setup(spark, tmp_path)
    cat2 = Catalog(spark, cat.path)
    snap = cat.snapshot()   # writer 1 reads
    cat2.register("third", src.path)  # writer 2 lands first
    snap["version"] += 1
    with pytest.raises(ConcurrentCommitError):
        cat._commit(snap, expected_version=snap["version"] - 1)
    # retry path: re-read and redo
    cat.register("fourth", src.path)
    assert "third" in cat.tables() and "fourth" in cat.tables()


def test_protect_pins_survives_aggressive_retention(spark, tmp_path):
    """Without protection, a table's GC can expire a snapshot the
    catalog still points readers at; protect_pins tags the pinned
    versions so retention flows around them, and moves the tags when
    the pins advance."""
    src, stats, cat = _setup(spark, tmp_path)
    _txn(spark, src, stats, cat, [(1, "insert", "r1", "a.py", "py")], "t0")
    cat.protect_pins()
    pinned_v = cat.tables()["src"]["version"]
    # table races ahead of the catalog by several commits
    for i in range(2, 6):
        src.merge_batch(_rows(spark, [(i, "insert", f"r{i}", "z.py",
                                       "py")]), f"ahead-{i}")
    src.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
    # the pinned snapshot survived and reads exactly the old state
    assert cat.read("src").count() == 1
    # flip + re-protect: tags move, the old pin becomes expirable
    cat.commit("t1")
    moved = cat.protect_pins()["protected"]
    assert moved["src"] > pinned_v
    assert cat.protect_pins()["protected"] == {}  # idempotent, no commits
    src.expire_snapshots(keep_last=1, orphan_grace_s=0.0)
    assert cat.read("src").count() == 5


def test_commit_rejects_unregistered_names(spark, tmp_path):
    src, stats, cat = _setup(spark, tmp_path)
    with pytest.raises(ValueError):
        cat.commit("t0", versions={"nope": 1})
