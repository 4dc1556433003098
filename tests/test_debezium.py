"""Debezium envelope decode: classification rules, op mapping, plan
shape, encoder/decoder round trip, and DuckDB-parity of the SQL encoder."""
from __future__ import annotations

import json

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arlas_proc_spark.sources.changefeed import changefeed_sql
from arlas_proc_spark.sources.debezium import (DLQ_REASON, RAW_VALUE,
                                               decode_debezium,
                                               encode_debezium_sql,
                                               split_debezium)

ROW_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType()),
    T.StructField("path", T.StringType()),
    T.StructField("commit", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("content", T.StringType()),
])


def _env(op, row=None, before=None, seq=7, ts_ms=1700000001000,
         wrapped=True, drop_source=False):
    payload = {"before": before, "after": row, "op": op, "ts_ms": ts_ms,
               "source": None if drop_source else {"lsn": seq}}
    return json.dumps({"payload": payload} if wrapped else payload)


ROW = {"repo": "r1", "path": "a.py", "commit": "c1", "lang": "py",
       "content": 'x = "quoted \\ backslash"'}


def test_decode_classification_and_mapping(spark):
    rows = [
        (_env("c", ROW),),                       # insert
        (_env("r", ROW),),                       # snapshot read -> insert
        (_env("u", ROW),),                       # update
        (_env("d", before=ROW, row=None),),      # delete from before image
        ('{"payload": {"op":"c"',),              # malformed JSON
        ('{"not_an_envelope": 1}',),             # malformed (no payload)
        (_env("x", ROW),),                       # bad_op
        (_env("u", None),),                      # missing_after
        (_env("d", row=None, before=None),),     # missing_before
        (_env("c", ROW, drop_source=True),),     # missing_seq
        (None,),                                 # null value -> malformed
    ]
    df = spark.createDataFrame(rows, "value string")
    out = decode_debezium(df, ROW_SCHEMA).collect()
    reasons = [r[DLQ_REASON] for r in out]
    assert reasons == [None, None, None, None, "malformed", "malformed",
                       "bad_op", "missing_after", "missing_before",
                       "missing_seq", "malformed"]
    ops = [r["op"] for r in out[:4]]
    assert ops == ["insert", "insert", "update", "delete"]
    assert out[3]["content"] == ROW["content"]  # delete reads BEFORE image
    assert out[0]["seq"] == 7 and out[0]["ts_s"] == 1700000001
    # DLQ rows: event columns nulled, raw value preserved
    assert out[4]["repo"] is None and out[4][RAW_VALUE] == rows[4][0]
    good, bad = split_debezium(decode_debezium(df, ROW_SCHEMA))
    assert good.count() == 4 and bad.count() == 7
    assert DLQ_REASON not in good.columns and RAW_VALUE not in good.columns


def test_decode_unwrapped_and_custom_seq_field(spark):
    payload = {"before": None, "after": ROW, "op": "c",
               "ts_ms": 1700000002500, "source": {"pos": 42}}
    df = spark.createDataFrame([(json.dumps(payload),)], "value string")
    out = decode_debezium(df, ROW_SCHEMA, wrapped=False,
                          seq_field="pos").collect()[0]
    assert out[DLQ_REASON] is None and out["seq"] == 42
    assert out["ts_s"] == 1700000002  # ms floor-divided


def test_decode_is_map_only(spark):
    df = spark.createDataFrame([(_env("c", ROW),)], "value string")
    plan = decode_debezium(df, ROW_SCHEMA)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_encoder_decoder_round_trip_and_duckdb_parity(spark):
    """The portable SQL encoder renders the SAME envelope bytes in Spark
    and DuckDB, and decode_debezium recovers the original feed rows
    exactly (including duplicate deliveries)."""
    n = 400
    enc = encode_debezium_sql(dialect="spark")
    feed_sql = changefeed_sql(n, dialect="spark")
    envs = spark.sql(f"SELECT seq, {enc} AS value FROM ({feed_sql}) f")
    ddb_enc = encode_debezium_sql(dialect="duckdb")
    ddb_feed = changefeed_sql(n, dialect="duckdb")
    ddb_envs = duckdb.sql(
        f"SELECT {ddb_enc} AS value FROM ({ddb_feed}) f ORDER BY value"
    ).fetchall()
    spark_envs = [r["value"]
                  for r in envs.select("value").orderBy("value").collect()]
    assert spark_envs == [r[0] for r in ddb_envs]

    decoded, dlq = split_debezium(decode_debezium(envs, ROW_SCHEMA))
    assert dlq.count() == 0
    back = decoded.select("seq", "op", "repo", "path", "commit", "ts_s",
                          "lang", "content")
    orig = spark.sql(f"SELECT seq, op, repo, path, commit, ts_s, lang, "
                     f"content FROM ({feed_sql}) f")
    sym_diff = back.exceptAll(orig).count() + orig.exceptAll(back).count()
    assert sym_diff == 0


@pytest.mark.parametrize("dialect", ["spark", "duckdb"])
def test_encoder_emits_valid_json(spark, dialect):
    enc = encode_debezium_sql(dialect=dialect)
    feed = changefeed_sql(50, dialect=dialect)
    if dialect == "spark":
        vals = [r[0] for r in
                spark.sql(f"SELECT {enc} FROM ({feed}) f").collect()]
    else:
        vals = [r[0] for r in duckdb.sql(
            f"SELECT {enc} FROM ({feed}) f").fetchall()]
    for v in vals:
        doc = json.loads(v)
        p = doc["payload"]
        assert p["op"] in ("c", "u", "d")
        img = p["before"] if p["op"] == "d" else p["after"]
        assert set(img) == {"repo", "path", "commit", "lang", "content"}
