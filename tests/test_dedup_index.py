"""DedupIndex — incrementally-maintained MinHash-LSH near-dup index.

The contract: after replaying ANY batch sequence (inserts, updates,
deletes, duplicate delivery, out-of-order seqs, replayed batch ids),
``pairs()`` equals ``minhash_lsh_pairs`` recomputed from scratch on the
corpus's final state, and ``update`` emits exactly the current pairs
involving docs the batch touched.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arlas_proc_spark.cdc.dedup_index import DedupIndex
from arlas_proc_spark.operators.dedup_fuzzy import (
    minhash_lsh_pairs,
    minhash_signatures,
)

K, BANDS, N = 4, 2, 3

# ~identical sentences so LSH actually pairs things at k=4
BASE = "the quick brown fox jumps over the lazy dog near the river bank"
VAR = BASE + " today"
OTHER = "completely different content about spark shuffle partitions and joins"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, seq long, op string")


def _pairset(df):
    return {(r.id_a, r.id_b, r.n_bands_shared) for r in df.collect()}


def _make(spark, tmp_path):
    return DedupIndex.create(spark, str(tmp_path / "idx"),
                             n=N, k=K, bands=BANDS)


def test_replay_converges_to_scratch_recompute(spark, tmp_path):
    idx = _make(spark, tmp_path)
    idx.update(_batch(spark, [
        (1, BASE, 10, "insert"),
        (2, VAR, 11, "insert"),
        (3, OTHER, 12, "insert"),
        (4, BASE, 13, "insert"),
    ]), 0)
    idx.update(_batch(spark, [
        (4, OTHER + " v2", 20, "update"),     # leaves the BASE cluster
        (5, VAR + " indeed", 21, "insert"),
        (2, VAR, 22, "update"),               # same text, new seq
    ]), 1)
    idx.update(_batch(spark, [
        (3, None, 30, "delete"),
        (1, BASE, 31, "update"),
    ]), 2)
    final = _docs(spark, [(1, BASE), (2, VAR), (4, OTHER + " v2"),
                          (5, VAR + " indeed")])
    want = _pairset(minhash_lsh_pairs(final, "doc_id", "text", N, K, BANDS))
    assert _pairset(idx.pairs()) == want
    # signatures equal a scratch recompute of the final state
    got_sigs = sorted(map(tuple, idx.signatures().collect()))
    want_sigs = sorted(map(tuple, minhash_signatures(
        final, "doc_id", "text", N, K).collect()))
    assert got_sigs == want_sigs


def test_update_emits_pairs_touching_batch(spark, tmp_path):
    idx = _make(spark, tmp_path)
    first = idx.update(_batch(spark, [
        (1, BASE, 10, "insert"),
        (2, VAR, 11, "insert"),
        (3, OTHER, 12, "insert")]), 0)
    all0 = _pairset(idx.pairs())
    assert _pairset(first) == all0  # everything is new in batch 0
    # batch 1 adds a doc joining the cluster: emitted pairs are exactly
    # the current pairs involving doc 4
    second = idx.update(_batch(spark, [(4, BASE + " !", 20, "insert")]), 1)
    allp = _pairset(idx.pairs())
    want = {p for p in allp if 4 in (p[0], p[1])}
    assert _pairset(second) == want
    assert want  # the new doc really did pair


def test_delete_retracts_and_duplicate_delivery_collapses(spark, tmp_path):
    idx = _make(spark, tmp_path)
    idx.update(_batch(spark, [
        (1, BASE, 10, "insert"),
        (2, VAR, 11, "insert"),
        (2, VAR, 11, "insert"),          # duplicate delivery, same seq
        (2, OTHER, 5, "update"),         # stale, loses LWW inside batch
    ]), 0)
    assert _pairset(idx.pairs()) == _pairset(minhash_lsh_pairs(
        _docs(spark, [(1, BASE), (2, VAR)]), "doc_id", "text", N, K, BANDS))
    out = idx.update(_batch(spark, [(2, None, 20, "delete")]), 1)
    assert _pairset(out) == set()        # a deleted doc pairs with nothing
    assert _pairset(idx.pairs()) == set()


def test_stale_cross_batch_update_emits_index_state_pairs(spark, tmp_path):
    """A batch whose seq loses LWW against the TABLE must not emit pairs
    from the loser's signature — emitted pairs always reflect the
    index."""
    idx = _make(spark, tmp_path)
    idx.update(_batch(spark, [
        (1, BASE, 100, "insert"),
        (2, VAR, 101, "insert")]), 0)
    before = _pairset(idx.pairs())
    out = idx.update(_batch(spark, [(1, OTHER, 50, "update")]), 1)  # stale
    assert _pairset(idx.pairs()) == before          # index unchanged
    assert _pairset(out) == {p for p in before if 1 in (p[0], p[1])}


def test_replayed_batch_id_is_noop_and_emits_nothing(spark, tmp_path):
    idx = _make(spark, tmp_path)
    b = [(1, BASE, 10, "insert"), (2, VAR, 11, "insert")]
    idx.update(_batch(spark, b), 0)
    v = idx.table.snapshot()["version"]
    replay = idx.update(_batch(spark, b), 0)
    assert idx.table.snapshot()["version"] == v     # ledgered no-op
    assert _pairset(replay) == set()
    assert _pairset(idx.pairs()) == _pairset(minhash_lsh_pairs(
        _docs(spark, b and [(r[0], r[1]) for r in b]),
        "doc_id", "text", N, K, BANDS))


def test_shingleless_docs_index_but_never_pair(spark, tmp_path):
    idx = _make(spark, tmp_path)
    out = idx.update(_batch(spark, [
        (1, "too short", 10, "insert"),      # < n tokens: no shingles
        (2, "", 11, "insert"),
        (3, BASE, 12, "insert")]), 0)
    assert _pairset(out) == set()
    assert idx.signatures().count() == 3     # rows exist, sigs null
    assert _pairset(idx.pairs()) == set()


def test_update_plan_broadcasts_changed_side(spark, tmp_path):
    """The candidate join's changed side must be broadcast — the index
    side never shuffles (the 100-TB shape)."""
    idx = _make(spark, tmp_path)
    idx.update(_batch(spark, [(1, BASE, 10, "insert"),
                              (2, VAR, 11, "insert")]), 0)
    out = idx.update(_batch(spark, [(3, BASE + " x", 20, "insert")]), 1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bad_params_raise(spark, tmp_path):
    with pytest.raises(ValueError):
        DedupIndex(spark, str(tmp_path / "x"), k=5, bands=2)
    with pytest.raises(ValueError):
        DedupIndex.create(spark, str(tmp_path / "y"), id_type="float")


# --------------------------------------------------- change-feed refresher

def _source(spark, tmp_path):
    from pyspark.sql import types as T
    from arlas_proc_spark.lake.table import LakeTable
    schema = T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("seq", T.LongType(), True),
        T.StructField("content", T.StringType(), True)])
    return LakeTable.create(spark, str(tmp_path / "src"), schema,
                            ["repo", "path"], "seq", n_buckets=4)


def _src_batch(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, op string, repo string, path string, content string"
    ).select("repo", "path", "seq", "content", "op")


def _recompute(spark, src):
    """Ground truth: one-shot LSH pairs over the source's current state
    with the refresher's doc identity."""
    docs = src.read().selectExpr(
        "concat_ws('|', repo, path) AS doc_key", "content")
    return minhash_lsh_pairs(docs, "doc_key", "content", N, K, BANDS)


def test_refresher_tracks_source_table(spark, tmp_path):
    from arlas_proc_spark.cdc.dedup_index import DedupIndexRefresher
    src = _source(spark, tmp_path)
    ref = DedupIndexRefresher(spark, str(tmp_path / "ref"), src,
                              n=N, k=K, bands=BANDS, n_buckets=4)
    src.merge_batch(_src_batch(spark, [
        (1, "insert", "r1", "a.py", BASE),
        (2, "insert", "r1", "b.py", VAR),
        (3, "insert", "r2", "c.py", OTHER)]), 0)
    out = ref.refresh()
    assert out["source_version"] == src.snapshot()["version"]
    assert _pairset(ref.pairs()) == _pairset(_recompute(spark, src))
    assert _pairset(ref.pairs())  # something actually paired
    # update one member out of the cluster, delete another, add a new one
    src.merge_batch(_src_batch(spark, [
        (10, "update", "r1", "b.py", OTHER + " mutated"),
        (11, "delete", "r2", "c.py", None),
        (12, "insert", "r3", "d.py", BASE + " too")]), 1)
    ref.refresh()
    assert _pairset(ref.pairs()) == _pairset(_recompute(spark, src))
    # idle refresh is a cursor-skipped no-op
    v = ref.index.table.snapshot()["version"]
    assert ref.refresh()["skipped"]
    assert ref.index.table.snapshot()["version"] == v
    # reopening from disk resumes the cursor
    ref2 = DedupIndexRefresher(spark, str(tmp_path / "ref"), src,
                               n=N, k=K, bands=BANDS)
    assert ref2.refresh()["skipped"]


def test_refresher_rides_streaming_ingest(spark, tmp_path):
    """The views=[...] hook: the index refreshes after every committed
    micro-batch of the streaming WAL tail, and ends equal to the
    from-scratch recompute on the final table."""
    from arlas_proc_spark.cdc.dedup_index import DedupIndexRefresher
    from arlas_proc_spark.cdc.engine import EVENT_SCHEMA
    from arlas_proc_spark.streaming.ingest import StreamingIngest
    wal = str(tmp_path / "wal")
    rows = [
        (1, "insert", "r1", "a.py", "c1", 1000, "py", BASE),
        (2, "insert", "r1", "b.py", "c2", 1001, "py", VAR),
        (3, "insert", "r2", "c.py", "c3", 1002, "py", OTHER),
        (4, "update", "r1", "b.py", "c4", 1003, "py", OTHER + " now"),
        (5, "delete", "r2", "c.py", "c5", 1004, "py", None),
        (6, "insert", "r3", "d.py", "c6", 1005, "py", BASE + " !"),
    ]
    for i in range(0, len(rows), 2):  # 3 WAL segments of 2 events
        spark.createDataFrame(rows[i:i + 2], EVENT_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(wal)
    ing = StreamingIngest(spark, str(tmp_path / "tbl"), n_buckets=4)
    ref = DedupIndexRefresher(spark, str(tmp_path / "ref"),
                              ing.engine.table,
                              n=N, k=K, bands=BANDS, n_buckets=4)
    ing.views.append(ref)
    ing.run_to_completion(wal, str(tmp_path / "ckpt"),
                          max_files_per_trigger=1)
    assert ref.cursor() == ing.engine.table.snapshot()["version"]
    docs = ing.engine.table.read().selectExpr(
        "concat_ws('|', repo, path) AS doc_key", "content")
    want = _pairset(minhash_lsh_pairs(docs, "doc_key", "content",
                                      N, K, BANDS))
    assert _pairset(ref.pairs()) == want
    assert want  # BASE docs really pair


def test_reopen_adopts_persisted_params(spark, tmp_path):
    """Signatures are only comparable under one (shingle, k, bands)
    setting — reopening an index overrides caller params with the ones
    persisted at create time."""
    DedupIndex.create(spark, str(tmp_path / "i"), n=N, k=K, bands=BANDS)
    reopened = DedupIndex(spark, str(tmp_path / "i"), k=16, bands=8, n=5)
    assert (reopened.n, reopened.k, reopened.bands) == (N, K, BANDS)
    assert reopened.id_col == "doc_id"


def test_reopen_with_stale_invalid_flags_adopts_persisted_params(
        spark, tmp_path):
    """A scheduled job rerun with stale tuning flags (k=5 doesn't even
    divide bands=2) must NOT wedge a valid on-disk index: validation
    runs after the persisted-params override."""
    DedupIndex.create(spark, str(tmp_path / "i"), n=N, k=K, bands=BANDS)
    reopened = DedupIndex(spark, str(tmp_path / "i"), k=5, bands=2)
    assert (reopened.n, reopened.k, reopened.bands) == (N, K, BANDS)


def test_live_table_without_params_file_refuses(spark, tmp_path):
    """Signatures written under one (n, k, bands) are unreadable under
    another — a live index whose params file vanished must refuse to
    reopen with guessed defaults."""
    import os
    idx = _make(spark, tmp_path)
    os.remove(idx._params_path)
    with pytest.raises(RuntimeError, match="dedup_params"):
        DedupIndex(spark, str(tmp_path / "idx"))


def test_corpus_sized_batch_runs_without_broadcast(spark, tmp_path):
    """broadcast_doc_limit=0 forces every batch down the backfill path
    (no forced broadcast of the changed side) — output must still equal
    the scratch recompute, and the steady-state broadcast plan assert
    must not hold here."""
    idx = DedupIndex.create(spark, str(tmp_path / "idx"),
                            n=N, k=K, bands=BANDS,
                            broadcast_doc_limit=0)
    out = idx.update(_batch(spark, [
        (1, BASE, 10, "insert"),
        (2, VAR, 11, "insert"),
        (3, OTHER, 12, "insert"),
        (4, BASE + " x", 13, "insert"),
    ]), 0)
    final = _docs(spark, [(1, BASE), (2, VAR), (3, OTHER),
                          (4, BASE + " x")])
    want = _pairset(minhash_lsh_pairs(final, "doc_id", "text", N, K, BANDS))
    assert _pairset(out) == want
    assert _pairset(idx.pairs()) == want


def test_refresher_reseeds_when_cursor_snapshot_expired(spark, tmp_path):
    """A fresh index against a source that already ran expire_snapshots
    (cursor=0, v0 manifest gone), and an established index whose lag
    exceeded the source's retention, must RESEED rather than wedge —
    including retracting docs deleted during the missed window."""
    from arlas_proc_spark.cdc.dedup_index import DedupIndexRefresher
    src = _source(spark, tmp_path)
    src.merge_batch(_src_batch(spark, [
        (1, "insert", "r1", "a.py", BASE),
        (2, "insert", "r1", "b.py", VAR),
        (3, "insert", "r2", "c.py", OTHER)]), 0)
    src.merge_batch(_src_batch(spark, [
        (4, "insert", "r3", "d.py", BASE + " too")]), 1)
    src.merge_batch(_src_batch(spark, [
        (5, "insert", "r4", "e.py", OTHER + " v2")]), 2)
    src.expire_snapshots(keep_last=2, orphan_grace_s=0)
    with pytest.raises(ValueError):
        src.snapshot_at(0)  # precondition: v0 really expired
    # fresh refresher: cursor 0, diff impossible -> bootstrap reseed
    ref = DedupIndexRefresher(spark, str(tmp_path / "ref"), src,
                              n=N, k=K, bands=BANDS, n_buckets=4)
    out = ref.refresh()
    assert out["reseeded"]
    assert _pairset(ref.pairs()) == _pairset(_recompute(spark, src))
    # established refresher falls behind retention: miss a window that
    # includes a DELETE, then reseed must retract it
    src.merge_batch(_src_batch(spark, [
        (10, "delete", "r1", "b.py", None),
        (11, "insert", "r5", "f.py", BASE + " three")]), 3)
    src.merge_batch(_src_batch(spark, [
        (12, "update", "r3", "d.py", OTHER + " drifted")]), 4)
    src.expire_snapshots(keep_last=1, orphan_grace_s=0)
    out = ref.refresh()
    assert out["reseeded"]
    assert _pairset(ref.pairs()) == _pairset(_recompute(spark, src))
    assert not ref.refresh().get("reseeded")  # caught up again
