"""Generic change-feed consumption (streaming/consume.py): a checkpointed
stream over a lake table's CDF files delivering per-batch transitions to
arbitrary apply functions, and the streaming outbound Debezium relay
built on it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arlas_proc_spark.lake.table import LakeTable
from arlas_proc_spark.sources.debezium import (compact_debezium_batch,
                                               decode_debezium,
                                               split_debezium)
from arlas_proc_spark.streaming.consume import (ChangeFeedConsumer,
                                                DebeziumStreamRelay)

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("seq", T.LongType(), True),
    T.StructField("ts_s", T.LongType(), True),
    T.StructField("content", T.StringType(), True),
])


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, op string, repo string, path string, "
        "commit string, ts_s long, content string"
    ).select("repo", "path", "commit", "seq", "ts_s", "content", "op")


def _src(spark, path):
    t = LakeTable.create(spark, path, SCHEMA, ["repo", "path"], "seq",
                         n_buckets=4, changefeed=True)
    t.merge_batch(_batch(spark, [
        (1, "insert", "r1", "a.py", "c1", 10, "v1"),
        (2, "insert", "r1", "b.py", "c2", 20, "w1"),
        (3, "insert", "r2", "c.py", "c3", 30, "x1"),
    ]), 0)
    t.merge_batch(_batch(spark, [
        (4, "update", "r1", "a.py", "c4", 40, "v2"),
        (5, "delete", "r1", "b.py", "c5", 50, None),
    ]), 1)
    return t


def _apply_to_dict(state):
    def apply_fn(df, batch_id):
        for r in sorted(df.collect(), key=lambda r: r._change_version):
            k = (r.repo, r.path)
            if r.change_type == "delete":
                state.pop(k, None)
            else:
                state[k] = r.content
    return apply_fn


def test_consumer_converges_and_sees_deletes(spark, tmp_path):
    src = _src(spark, str(tmp_path / "src"))
    state: dict = {}
    c = ChangeFeedConsumer(spark, src, _apply_to_dict(state))
    c.run_to_completion(str(tmp_path / "ckpt"))
    assert state == {(r.repo, r.path): r.content
                     for r in src.read().collect()}
    assert ("r1", "b.py") not in state  # the delete was delivered


def test_consumer_is_offset_exactly_once(spark, tmp_path):
    src = _src(spark, str(tmp_path / "src"))
    calls: list = []
    c = ChangeFeedConsumer(spark, src, lambda df, bid: calls.append(
        df.count()))
    c.run_to_completion(str(tmp_path / "ckpt"))
    n = len(calls)
    assert n > 0 and sum(calls) > 0
    # same checkpoint, no new source commits: no redelivery
    c2 = ChangeFeedConsumer(spark, src, lambda df, bid: calls.append(
        df.count()))
    c2.run_to_completion(str(tmp_path / "ckpt"))
    assert len(calls) == n
    # a new commit resumes incrementally: exactly its own transitions
    src.merge_batch(_batch(spark, [
        (6, "update", "r2", "c.py", "c6", 60, "x2")]), 2)
    c2.run_to_completion(str(tmp_path / "ckpt"))
    assert len(calls) == n + 1 and calls[-1] == 1


def test_net_only_compacts_multi_commit_drain(spark, tmp_path):
    """Three commits touching one key drained in ONE micro-batch must
    deliver a single row for it — the newest transition by producing
    commit (a delete reuses its pre-image seq, so only
    ``_change_version`` can order them)."""
    src = _src(spark, str(tmp_path / "src"))
    src.merge_batch(_batch(spark, [
        (6, "update", "r2", "c.py", "c6", 60, "x2")]), 2)
    src.merge_batch(_batch(spark, [
        (7, "delete", "r2", "c.py", "c7", 70, None)]), 3)
    got: list = []
    c = ChangeFeedConsumer(spark, src,
                           lambda df, bid: got.extend(df.collect()))
    c.run_to_completion(str(tmp_path / "ckpt"),
                        max_files_per_trigger=1000)
    per_key = [r for r in got if (r.repo, r.path) == ("r2", "c.py")]
    assert len(per_key) == 1
    assert per_key[0].change_type == "delete"


def test_every_transition_when_not_net_only(spark, tmp_path):
    src = _src(spark, str(tmp_path / "src"))
    got: list = []
    c = ChangeFeedConsumer(spark, src,
                           lambda df, bid: got.extend(df.collect()),
                           net_only=False)
    c.run_to_completion(str(tmp_path / "ckpt"),
                        max_files_per_trigger=1000)
    a_py = sorted((r._change_version, r.change_type) for r in got
                  if (r.repo, r.path) == ("r1", "a.py"))
    assert [t for _, t in a_py] == ["insert", "update_postimage"]
    assert all(r.change_type != "update_preimage" for r in got)


def test_consumer_refuses_feed_gap(spark, tmp_path):
    src = _src(spark, str(tmp_path / "src"))
    src.append_batch(_batch(spark, [
        (9, "insert", "r9", "z.py", "c9", 90, "q")]), "gap")
    with pytest.raises(ValueError, match="log-less"):
        ChangeFeedConsumer(spark, src, lambda df, bid: None)
    # seeded at/after the gap: allowed
    v = src.snapshot()["version"]
    ChangeFeedConsumer(spark, src, lambda df, bid: None, since_version=v)


def test_since_version_skips_seeded_prefix(spark, tmp_path):
    src = _src(spark, str(tmp_path / "src"))
    seed_v = src.snapshot()["version"]
    src.merge_batch(_batch(spark, [
        (6, "insert", "r3", "n.py", "c6", 60, "new")]), 2)
    got: list = []
    c = ChangeFeedConsumer(spark, src,
                           lambda df, bid: got.extend(df.collect()),
                           since_version=seed_v)
    c.run_to_completion(str(tmp_path / "ckpt"),
                        max_files_per_trigger=1000)
    assert {(r.repo, r.path) for r in got} == {("r3", "n.py")}


def test_debezium_stream_relay_round_trips(spark, tmp_path):
    """Full outbound loop: change feed → streaming relay → JSONL
    envelope segments → decode/compact/merge into a fresh replica ==
    source final state (including the delete, whose envelope carries the
    pre-image and the producing commit as txid)."""
    src = _src(spark, str(tmp_path / "src"))
    out = str(tmp_path / "envelopes")
    relay = DebeziumStreamRelay(spark, src, out)
    relay.run_to_completion(str(tmp_path / "ckpt"))

    raw = spark.read.text(out + "/*")
    row_schema = T.StructType([f for f in SCHEMA.fields
                               if f.name not in ("seq", "ts_s")])
    decoded = decode_debezium(raw, row_schema, txid_field="txid")
    good, dlq = split_debezium(decoded)
    assert dlq.count() == 0
    batch = compact_debezium_batch(good, ["repo", "path"]).drop("_txid")
    replica = LakeTable.create(spark, str(tmp_path / "replica"), SCHEMA,
                               ["repo", "path"], "seq", n_buckets=2)
    replica.merge_batch(batch, "relay")
    key = ["repo", "path", "commit", "seq", "ts_s", "content"]
    assert ({tuple(r) for r in replica.read().select(*key).collect()}
            == {tuple(r) for r in src.read().select(*key).collect()})


def test_relay_segments_idempotent_across_redelivery(spark, tmp_path):
    """A second drain over the same checkpoint writes nothing new, and a
    FRESH checkpoint rewrites deterministic segment content — the
    downstream compact-by-txid merge converges either way."""
    import glob
    src = _src(spark, str(tmp_path / "src"))
    out = str(tmp_path / "envelopes")
    DebeziumStreamRelay(spark, src, out).run_to_completion(
        str(tmp_path / "ckpt"), max_files_per_trigger=1000)

    def envelope_set():
        return {r.value for r in spark.read.text(out + "/*").collect()}

    first = envelope_set()
    n_segments = len(glob.glob(out + "/txn_*"))
    DebeziumStreamRelay(spark, src, out).run_to_completion(
        str(tmp_path / "ckpt"), max_files_per_trigger=1000)
    assert envelope_set() == first
    assert len(glob.glob(out + "/txn_*")) == n_segments
    # fresh checkpoint: same single-drain batching → same segment names,
    # overwritten in place; envelope multiset unchanged
    DebeziumStreamRelay(spark, src, out).run_to_completion(
        str(tmp_path / "ckpt2"), max_files_per_trigger=1000)
    assert envelope_set() == first
    assert len(glob.glob(out + "/txn_*")) == n_segments


def test_consumer_requires_changefeed(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         ["repo", "path"], "seq", n_buckets=2)
    with pytest.raises(ValueError, match="changefeed"):
        ChangeFeedConsumer(spark, t, lambda df, bid: None)
