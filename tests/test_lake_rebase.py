"""Metadata-only commit rebase on a lost snapshot CAS (optimistic
concurrency, the Delta/Iceberg disjoint-writer fast path): a loser whose
touched buckets are untouched by the competing commit(s) re-commits by
attaching its already-written manifests to the winner's snapshot — zero
recompute, zero data IO — and falls back to the full re-merge whenever
disjointness (or global-state stability) cannot be proven."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from arlas_proc_spark.lake.table import (
    ConcurrentCommitError,
    LakeTable,
    py_bucket,
)

SCHEMA = T.StructType([
    # nullable like engine-created tables (WAL-read schema): a non-null
    # key schema would make the FIRST merge a nullability-widening
    # schema evolution, which rebase correctly refuses to ride over
    T.StructField("repo", T.StringType(), True),
    T.StructField("path", T.StringType(), True),
    T.StructField("commit", T.StringType(), True),
    T.StructField("seq", T.LongType(), True),
    T.StructField("content", T.StringType(), True),
])

N_BUCKETS = 4
KEY_TYPES = ["string", "string"]


def _bucket(repo, path):
    return py_bucket([repo, path], KEY_TYPES, N_BUCKETS)


def _keys_in_distinct_buckets():
    """Three (repo, path) keys that land in three DIFFERENT buckets —
    chosen by the driver-side murmur3 replica, so the test never
    depends on luck."""
    found: dict[int, tuple[str, str]] = {}
    for i in range(200):
        k = (f"r{i}", f"f{i}.py")
        b = _bucket(*k)
        if b not in found:
            found[b] = k
        if len(found) >= 3:
            break
    assert len(found) >= 3
    return list(found.values())[:3]


def _ev(seq, op, repo, path, commit, content):
    return (seq, op, repo, path, commit, content)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, op string, repo string, path string, "
              "commit string, content string"
    ).select("repo", "path", "commit", "seq", "content", "op")


def _race(monkeypatch, loser: LakeTable, land_first):
    """Arrange for ``land_first()`` (rival commits) to run the moment the
    loser reaches its snapshot CAS — the standard full-commit race."""
    real = LakeTable._commit_snapshot
    fired = []

    def hijack(self, snap, expected_version):
        if self is loser and not fired:
            fired.append(True)
            land_first()
        return real(self, snap, expected_version)

    monkeypatch.setattr(LakeTable, "_commit_snapshot", hijack)


def _count_bucket_writes(monkeypatch):
    """Counter over the data-write path: a metadata-only rebase must not
    write bucket files a second time."""
    real = LakeTable._write_bucket_files
    calls = []

    def counting(self, *a, **k):
        calls.append(True)
        return real(self, *a, **k)

    monkeypatch.setattr(LakeTable, "_write_bucket_files", counting)
    return calls


def test_rebase_metadata_only_on_disjoint_race(spark, tmp_path, monkeypatch):
    (ka, kb, kc) = _keys_in_distinct_buckets()
    path = str(tmp_path / "t")
    a = LakeTable.create(spark, path, SCHEMA, ["repo", "path"], "seq",
                         n_buckets=N_BUCKETS)
    b = LakeTable(spark, path)
    rival1 = _batch(spark, [_ev(1, "insert", *kb, "cB", "vB")])
    rival2 = _batch(spark, [_ev(2, "insert", *kc, "cC", "vC")])
    mine = _batch(spark, [_ev(3, "insert", *ka, "cA", "vA")])

    def rival_lands_twice():
        b.merge_batch(rival1, "rival-1")
        b.merge_batch(rival2, "rival-2")

    _race(monkeypatch, a, rival_lands_twice)
    writes = _count_bucket_writes(monkeypatch)
    m = a.merge_batch(mine, "mine", commit_retries=1)
    assert m.get("rebased_commit") is True
    assert m["rebased_over_versions"] == 2  # rival committed v1 AND v2
    # the loser wrote its bucket files exactly once per writer-merge:
    # rival twice + loser once, never a re-merge rewrite
    assert len(writes) == 3
    state = {(r.repo, r.path): r.content for r in a.read().collect()}
    assert state == {ka: "vA", kb: "vB", kc: "vC"}
    # the rebased commit is a real version on the chain
    assert a.snapshot()["version"] == 3


def test_rebase_falls_back_on_same_bucket(spark, tmp_path, monkeypatch):
    (ka, _, _) = _keys_in_distinct_buckets()
    path = str(tmp_path / "t")
    a = LakeTable.create(spark, path, SCHEMA, ["repo", "path"], "seq",
                         n_buckets=N_BUCKETS)
    b = LakeTable(spark, path)
    # rival writes the SAME key — same bucket, manifest ref moves,
    # disjointness unprovable -> full re-merge must resolve LWW
    rival = _batch(spark, [_ev(10, "insert", *ka, "cB", "from-rival")])
    mine = _batch(spark, [_ev(3, "insert", *ka, "cA", "from-me")])
    _race(monkeypatch, a, lambda: b.merge_batch(rival, "rival"))
    m = a.merge_batch(mine, "mine", commit_retries=1)
    assert not m.get("rebased_commit")
    state = {(r.repo, r.path): (r.content, r.seq)
             for r in a.read().collect()}
    assert state == {ka: ("from-rival", 10)}  # seq 10 out-ranks seq 3


def test_rebase_refused_when_winner_evolved_schema(spark, tmp_path,
                                                   monkeypatch):
    (ka, kb, _) = _keys_in_distinct_buckets()
    path = str(tmp_path / "t")
    a = LakeTable.create(spark, path, SCHEMA, ["repo", "path"], "seq",
                         n_buckets=N_BUCKETS)
    b = LakeTable(spark, path)
    rival = (_batch(spark, [_ev(1, "insert", *kb, "cB", "vB")])
             .withColumn("lang", _lit("py")))
    mine = _batch(spark, [_ev(2, "insert", *ka, "cA", "vA")])
    _race(monkeypatch, a, lambda: b.merge_batch(rival, "rival"))
    m = a.merge_batch(mine, "mine", commit_retries=1)
    # global schema moved under us -> full re-merge, not a rebase
    assert not m.get("rebased_commit")
    rows = {(r.repo, r.path): r.lang for r in a.read().collect()}
    assert rows == {ka: None, kb: "py"}


def _lit(v):
    from pyspark.sql import functions as F
    return F.lit(v)


def test_rebase_changefeed_entry_repointed(spark, tmp_path, monkeypatch):
    (ka, kb, _) = _keys_in_distinct_buckets()
    path = str(tmp_path / "t")
    a = LakeTable.create(spark, path, SCHEMA, ["repo", "path"], "seq",
                         n_buckets=N_BUCKETS, changefeed=True)
    b = LakeTable(spark, path)
    rival = _batch(spark, [_ev(1, "insert", *kb, "cB", "vB")])
    mine = _batch(spark, [_ev(2, "insert", *ka, "cA", "vA")])
    _race(monkeypatch, a, lambda: b.merge_batch(rival, "rival"))
    m = a.merge_batch(mine, "mine", commit_retries=1)
    assert m.get("rebased_commit") is True
    log = {(r.repo, r.path, r.change_type, r._change_version)
           for r in a.read_change_log(0, with_version=True).collect()}
    # winner's feed labeled v1, the REBASED commit's feed labeled v2 —
    # the entry was re-pointed, no change file rewritten
    assert log == {(kb[0], kb[1], "insert", 1), (ka[0], ka[1], "insert", 2)}


def test_rebase_ledger_exactly_once(spark, tmp_path, monkeypatch):
    (ka, kb, _) = _keys_in_distinct_buckets()
    path = str(tmp_path / "t")
    a = LakeTable.create(spark, path, SCHEMA, ["repo", "path"], "seq",
                         n_buckets=N_BUCKETS)
    b = LakeTable(spark, path)
    rival = _batch(spark, [_ev(1, "insert", *kb, "cB", "vB")])
    mine = _batch(spark, [_ev(2, "insert", *ka, "cA", "vA")])
    _race(monkeypatch, a, lambda: b.merge_batch(rival, "rival"))
    a.merge_batch(mine, "mine", commit_retries=1)
    # replaying the batch after the rebase is a ledger no-op
    m2 = a.merge_batch(_batch(
        spark, [_ev(2, "insert", *ka, "cA", "vA")]), "mine")
    assert m2["skipped"] and m2.get("rebased_commit") is True
    # lineage points the batch at its REBASED version
    lin = {(r.batch_id, r.version)
           for r in a.lineage_df().collect() if r.batch_id == "mine"}
    assert lin == {("mine", 2)}


def test_rebase_noops_when_rival_committed_same_batch(spark, tmp_path,
                                                      monkeypatch):
    (ka, _, _) = _keys_in_distinct_buckets()
    path = str(tmp_path / "t")
    a = LakeTable.create(spark, path, SCHEMA, ["repo", "path"], "seq",
                         n_buckets=N_BUCKETS)
    b = LakeTable(spark, path)
    mine = _batch(spark, [_ev(2, "insert", *ka, "cA", "vA")])
    _race(monkeypatch, a, lambda: b.merge_batch(mine, "shared-id"))
    m = a.merge_batch(mine, "shared-id", commit_retries=1)
    assert m["skipped"]  # exactly-once across racing workers
    assert a.read().count() == 1


def test_rebase_applies_set_properties_over_winner(spark, tmp_path,
                                                   monkeypatch):
    (ka, kb, _) = _keys_in_distinct_buckets()
    path = str(tmp_path / "t")
    a = LakeTable.create(spark, path, SCHEMA, ["repo", "path"], "seq",
                         n_buckets=N_BUCKETS)
    b = LakeTable(spark, path)
    rival = _batch(spark, [_ev(1, "insert", *kb, "cB", "vB")])
    mine = _batch(spark, [_ev(2, "insert", *ka, "cA", "vA")])

    def rival_with_props():
        b.merge_batch(rival, "rival",
                      set_properties={"rival.cursor": "10", "shared": "w"})

    _race(monkeypatch, a, rival_with_props)
    m = a.merge_batch(mine, "mine", commit_retries=1,
                      set_properties={"my.cursor": "7", "shared": "l"})
    assert m.get("rebased_commit") is True
    props = a.snapshot()["properties"]
    # winner's properties survive; ours land on top (last-committer-wins
    # on a genuinely shared key, same as a re-merge would produce)
    assert props["rival.cursor"] == "10"
    assert props["my.cursor"] == "7"
    assert props["shared"] == "l"


def test_rebase_dv_mode_disjoint(spark, tmp_path, monkeypatch):
    (ka, kb, _) = _keys_in_distinct_buckets()
    path = str(tmp_path / "t")
    a = LakeTable.create(spark, path, SCHEMA, ["repo", "path"], "seq",
                         n_buckets=N_BUCKETS)
    # seed both keys so the dv merges mask superseded positions
    a.merge_batch(_batch(spark, [_ev(1, "insert", *ka, "c0", "old-a"),
                                 _ev(1, "insert", *kb, "c0", "old-b")]),
                  "seed")
    b = LakeTable(spark, path)
    rival = _batch(spark, [_ev(5, "update", *kb, "cB", "new-b")])
    mine = _batch(spark, [_ev(6, "update", *ka, "cA", "new-a")])
    _race(monkeypatch, a, lambda: b.merge_batch(rival, "rival", dv=True))
    m = a.merge_batch(mine, "mine", dv=True, commit_retries=1)
    assert m.get("rebased_commit") is True
    assert m["rows_dv_masked"] == 1
    state = {(r.repo, r.path): r.content for r in a.read().collect()}
    assert state == {ka: "new-a", kb: "new-b"}


def test_rebase_still_failfast_without_retries(spark, tmp_path,
                                               monkeypatch):
    (ka, kb, _) = _keys_in_distinct_buckets()
    path = str(tmp_path / "t")
    a = LakeTable.create(spark, path, SCHEMA, ["repo", "path"], "seq",
                         n_buckets=N_BUCKETS)
    b = LakeTable(spark, path)
    rival = _batch(spark, [_ev(1, "insert", *kb, "cB", "vB")])
    mine = _batch(spark, [_ev(2, "insert", *ka, "cA", "vA")])
    _race(monkeypatch, a, lambda: b.merge_batch(rival, "rival"))
    # a disjoint race is still an ERROR at commit_retries=0: rebase is
    # a retry strategy, not a change to the fail-fast contract
    with pytest.raises(ConcurrentCommitError):
        a.merge_batch(mine, "mine")


def test_engine_delegates_retries_to_rebase(spark, tmp_path, monkeypatch):
    """CdcEngine hands commit_retries to LakeTable.merge_batch, so an
    engine batch racing a disjoint lake writer resolves by the
    metadata-only rebase — engine state still converges and the batch's
    ledger entry records the rebase."""
    from arlas_proc_spark.cdc.engine import CdcEngine
    from arlas_proc_spark.sources.changefeed import changefeed_df

    eng = CdcEngine(spark, str(tmp_path / "t"), n_buckets=64)
    assert eng._delegate_retries
    feed = changefeed_df(spark, 400)
    eng.apply_batch(feed.where(feed.seq < 200), 0)

    # a rival writes a brand-new repo — disjointness is not luck: pick
    # the rival's key by the driver-side bucket replica so it dodges
    # every bucket the engine batch touches
    t = eng.table
    used = {py_bucket([r.repo, r.path], ["string", "string"], 64)
            for r in feed.where(feed.seq >= 200)
            .select("repo", "path").distinct().collect()}
    free = next(b for b in range(64) if b not in used)
    key = next((f"zz{i}", "f.py") for i in range(2000)
               if py_bucket([f"zz{i}", "f.py"],
                            ["string", "string"], 64) == free)
    rival = spark.createDataFrame(
        [(key[0], key[1], "c-riv", 10**9, "python", "rival", "insert")],
        "repo string, path string, commit string, seq long, "
        "lang string, content string, op string")

    b = LakeTable(spark, str(tmp_path / "t"))
    _race(monkeypatch, t, lambda: b.merge_batch(rival, "rival"))
    m = eng.apply_batch(feed.where(feed.seq >= 200), 1)
    assert m.get("rebased_commit") is True
    state = {(r.repo, r.path) for r in eng.state().collect()}
    assert key in state


def test_rebase_gc_keeps_rebased_files(spark, tmp_path, monkeypatch):
    (ka, kb, _) = _keys_in_distinct_buckets()
    path = str(tmp_path / "t")
    a = LakeTable.create(spark, path, SCHEMA, ["repo", "path"], "seq",
                         n_buckets=N_BUCKETS, changefeed=True)
    b = LakeTable(spark, path)
    rival = _batch(spark, [_ev(1, "insert", *kb, "cB", "vB")])
    mine = _batch(spark, [_ev(2, "insert", *ka, "cA", "vA")])
    _race(monkeypatch, a, lambda: b.merge_batch(rival, "rival"))
    a.merge_batch(mine, "mine", commit_retries=1)
    a.expire_snapshots(keep_last=10, orphan_grace_s=0)
    state = {(r.repo, r.path): r.content for r in a.read().collect()}
    assert state == {ka: "vA", kb: "vB"}
    log = {(r.repo, r.path, r.change_type)
           for r in a.read_change_log(0).collect()}
    assert log == {(kb[0], kb[1], "insert"), (ka[0], ka[1], "insert")}


def test_rebase_expired_base_falls_back_to_remerge(spark, tmp_path,
                                                   monkeypatch):
    """A concurrent expire_snapshots can reclaim the loser's BASE
    snapshot between its CAS loss and its rebase attempt. Disjointness
    is then unprovable — but the full re-merge reads only CURRENT, so
    the merge must fall back and converge instead of dying on the
    missing manifest with retries left."""
    (ka, kb, _) = _keys_in_distinct_buckets()
    path = str(tmp_path / "t")
    a = LakeTable.create(spark, path, SCHEMA, ["repo", "path"], "seq",
                         n_buckets=N_BUCKETS)
    b = LakeTable(spark, path)
    rival = _batch(spark, [_ev(1, "insert", *kb, "cB", "vB")])
    mine = _batch(spark, [_ev(2, "insert", *ka, "cA", "vA")])

    def rival_lands_then_expires():
        b.merge_batch(rival, "rival")
        b.expire_snapshots(keep_last=1)  # reclaims the loser's base v0

    _race(monkeypatch, a, rival_lands_then_expires)
    m = a.merge_batch(mine, "mine", commit_retries=1)
    assert "rebased_commit" not in m  # full re-merge, not a rebase
    state = {(r.repo, r.path): r.content for r in a.read().collect()}
    assert state == {ka: "vA", kb: "vB"}
