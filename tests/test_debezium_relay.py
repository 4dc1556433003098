"""Outbound Debezium relay: a lake table's change feed rendered as
envelopes (``emit_debezium``), decoded back (``decode_debezium`` with
``txid_field``), compacted per key (``compact_debezium_batch``), and
merged into a replica — the full producer→consumer loop, byte-parity
asserted against the source table. The lake as a CDC *source* for
consumers outside this engine (the inbound half landed with
sources/debezium.py decode; this closes the loop)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from arlas_proc_spark.lake.table import LakeTable
from arlas_proc_spark.sources.debezium import (compact_debezium_batch,
                                               decode_debezium,
                                               emit_debezium,
                                               split_debezium)

SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("seq", T.LongType(), True),
    T.StructField("ts_s", T.LongType(), True),
    T.StructField("lang", T.StringType(), True),
])

ROW_SCHEMA = T.StructType([f for f in SCHEMA.fields
                           if f.name not in ("seq", "ts_s")])

KEYS = ["repo", "path"]


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, op string, repo string, path string, "
              "commit string, ts_s long, lang string",
    ).select("repo", "path", "commit", "seq", "ts_s", "lang", "op")


def _src(spark, tmp_path, name="src"):
    return LakeTable.create(spark, str(tmp_path / name), SCHEMA,
                            KEYS, "seq", n_buckets=4, changefeed=True)


def _relay(spark, src, replica, from_v, batch_id, to_v=None):
    env = emit_debezium(src, from_v, to_v)
    decoded = decode_debezium(env, ROW_SCHEMA, txid_field="txid")
    good, bad = split_debezium(decoded)
    assert bad.count() == 0
    replica.merge_batch(compact_debezium_batch(good, KEYS), batch_id)


def _state(t):
    return sorted(tuple(r) for r in
                  t.read().select([f.name for f in SCHEMA.fields])
                  .collect())


def test_roundtrip_byte_parity_including_update_delete_tie(spark,
                                                           tmp_path):
    """Key k1: insert → update → delete-of-that-update. The delete's
    pre-image reuses the update's seq (the tie seq alone cannot break) —
    the txid carried in source.txid must order them."""
    src = _src(spark, tmp_path)
    src.merge_batch(_batch(spark, [
        (1, "insert", "r1", "a.py", "c1", 100, "py"),
        (2, "insert", "r2", "b.py", "c2", 101, "py"),
        (3, "insert", "r3", "c.rs", "c3", 102, "rs"),
    ]), 0)
    src.merge_batch(_batch(spark, [
        (9, "update", "r1", "a.py", "c9", 110, "py3"),
        (4, "update", "r2", "b.py", "c4", 111, "py2"),
    ]), 1)
    src.merge_batch(_batch(spark, [
        (9, "delete", "r1", "a.py", "c9", 120, "py3"),
    ]), 2)
    replica = LakeTable.create(spark, str(tmp_path / "dst"), SCHEMA,
                               KEYS, "seq", n_buckets=2)
    _relay(spark, src, replica, 0, "relay-0")
    assert _state(replica) == _state(src)
    assert len(_state(replica)) == 2  # r1 deleted


def test_incremental_relay_converges_per_version_window(spark, tmp_path):
    src = _src(spark, tmp_path, name="src2")
    replica = LakeTable.create(spark, str(tmp_path / "dst2"), SCHEMA,
                               KEYS, "seq", n_buckets=2)
    cursor = src.snapshot()["version"]
    for i in range(3):
        rows = [(10 * i + j, "insert", f"r{j}", f"p{i}.py",
                 f"c{10 * i + j}", 100 + i, "py") for j in range(4)]
        if i == 2:  # overwrite + delete in the last window
            rows += [(100, "update", "r0", "p0.py", "c100", 200, "go"),
                     (101, "delete", "r1", "p0.py", "c101", 201, "py")]
        src.merge_batch(_batch(spark, rows), i)
        head = src.snapshot()["version"]
        _relay(spark, src, replica, cursor, f"relay-{i}", head)
        cursor = head
        assert _state(replica) == _state(src)


def test_emitted_envelopes_are_valid_debezium(spark, tmp_path):
    """Shape check on the wire: op letters, before/after placement, lsn
    and ts_ms round numbers — independent of the decoder."""
    import json

    src = _src(spark, tmp_path, name="src3")
    src.merge_batch(_batch(spark, [
        (5, "insert", "r1", "a.py", "c5", 100, "py")]), 0)
    src.merge_batch(_batch(spark, [
        (6, "delete", "r1", "a.py", "c6", 105, "py")]), 1)
    envs = [json.loads(r["value"])["payload"]
            for r in emit_debezium(src, 0).collect()]
    by_op = {e["op"]: e for e in envs}
    assert set(by_op) == {"c", "d"}
    assert by_op["c"]["after"]["repo"] == "r1"
    assert "before" not in by_op["c"]  # nulls omitted on the wire
    assert by_op["c"]["source"]["lsn"] == 5
    assert by_op["c"]["ts_ms"] == 100_000
    assert by_op["d"]["before"]["path"] == "a.py"
    assert "after" not in by_op["d"]
    assert by_op["d"]["source"]["txid"] > by_op["c"]["source"]["txid"]


def test_compact_requires_txid(spark):
    df = spark.createDataFrame([("r", "p")], "repo string, path string")
    try:
        compact_debezium_batch(df, KEYS)
        raise AssertionError("accepted frame without _txid")
    except ValueError:
        pass


def test_compact_null_txid_raises_instead_of_dropping(spark):
    """A foreign feed whose connector omits source.txId decodes rows
    with a null _txid — not a DLQ condition, but unorderable. The
    compaction must FAIL loudly at execution: max(_txid) over an
    all-null key is null, and the equi semi-join would otherwise drop
    the key's transition entirely (silent replica divergence)."""
    import pytest

    df = spark.createDataFrame(
        [("r", "a.py", 1), ("r", "b.py", None)],
        "repo string, path string, _txid long")
    out = compact_debezium_batch(df, KEYS)
    with pytest.raises(Exception, match="null _txid"):
        out.collect()
