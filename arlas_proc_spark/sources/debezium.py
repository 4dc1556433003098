"""Debezium-envelope CDC decode: the standard public change-event JSON
(op c/r/u/d, before/after images, source.lsn sequencing, ts_ms) → this
engine's WAL rows ``(seq, op, key..., ts_s, payload...)``.

Real deployments rarely hand you a clean typed change feed: they hand you
a Kafka topic (or JSONL WAL segments) of Debezium envelopes. This module
is the boundary adapter — one ``from_json`` over the envelope schema plus
pure column expressions, so the decode is MAP-ONLY (zero shuffle, no
Python on the hot path; ``from_json`` runs JVM-side per partition and
Catalyst prunes unused envelope fields). Undecodable records are never
dropped silently: every row carries a ``_dlq_reason`` and the caller
splits good rows from the dead-letter queue with :func:`split_debezium`.

Classification rules (deterministic, engine-independent — the DuckDB
oracle replays them with ``json_valid``/``json_extract_string``):

- unparseable JSON, or JSON without the expected envelope  → ``malformed``
- ``op`` missing or not one of c/r/u/d                      → ``bad_op``
- delete (``d``) without a ``before`` image                 → ``missing_before``
- c/r/u without an ``after`` image                          → ``missing_after``
- no sequence number under ``source.<seq_field>``           → ``missing_seq``

Op mapping: ``c`` (create) and ``r`` (snapshot read) → ``insert``;
``u`` → ``update`` (row from ``after``); ``d`` → ``delete`` (row from
``before``). ``ts_s = ts_ms div 1000``.

Reference analog: the incremental ScyllaDB source
(``/root/reference/src/main/scala/io/arlas/data/sql/DataFrameReader.scala:48-55``)
assumes its driver already typed the rows; here the typed boundary is the
public Debezium contract instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DLQ_REASON = "_dlq_reason"
RAW_VALUE = "_raw_value"

_VALID_OPS = ("c", "r", "u", "d")


def envelope_schema(row_schema: T.StructType, *, seq_field: str = "lsn",
                    wrapped: bool = True) -> T.StructType:
    """The ``from_json`` schema for a Debezium envelope whose before/after
    images have ``row_schema``. ``wrapped=True`` is the on-the-wire shape
    with the ``payload`` wrapper (Kafka Connect JSON converter with
    schemas disabled still wraps); ``wrapped=False`` decodes a bare
    payload (``unwrap``/ExtractNewRecordState NOT applied — this module
    replaces that transform)."""
    payload = T.StructType([
        T.StructField("before", row_schema, True),
        T.StructField("after", row_schema, True),
        T.StructField("source", T.StructType(
            [T.StructField(seq_field, T.LongType(), True)]), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
    ])
    if not wrapped:
        return payload
    return T.StructType([T.StructField("payload", payload, True)])


def decode_debezium(df: DataFrame, row_schema: T.StructType, *,
                    value_col: str = "value", seq_field: str = "lsn",
                    wrapped: bool = True) -> DataFrame:
    """Decode a DataFrame of Debezium envelope strings into WAL rows.

    Output columns: ``seq`` (bigint, from ``source.<seq_field>``), ``op``
    (insert/update/delete), every field of ``row_schema`` (from ``after``,
    or ``before`` for deletes), ``ts_s`` (bigint), plus the markers
    ``_dlq_reason`` (null = good row) and ``_raw_value`` (the original
    envelope — kept so dead-letter rows stay replayable). All event
    columns are null on DLQ rows.

    Works identically on batch and streaming DataFrames (pure projection,
    no state)."""
    parsed = F.from_json(F.col(value_col),
                         envelope_schema(row_schema, seq_field=seq_field,
                                         wrapped=wrapped))
    pay = parsed.getField("payload") if wrapped else parsed
    op = pay.getField("op")
    before, after = pay.getField("before"), pay.getField("after")
    seq = pay.getField("source").getField(seq_field)
    ts_ms = pay.getField("ts_ms")
    reason = (
        F.when(F.col(value_col).isNull() | pay.isNull(), "malformed")
        .when(op.isNull() | ~op.isin(*_VALID_OPS), "bad_op")
        .when((op == "d") & before.isNull(), "missing_before")
        .when((op != "d") & after.isNull(), "missing_after")
        .when(seq.isNull(), "missing_seq")
        .otherwise(F.lit(None).cast("string")))
    row = F.when(op == "d", before).otherwise(after)
    mapped_op = (F.when(op == "u", F.lit("update"))
                 .when(op == "d", F.lit("delete"))
                 .otherwise(F.lit("insert")))

    def good(col: Column) -> Column:
        return F.when(reason.isNull(), col)

    # floor(ts_ms / 1000) is exact here: epoch-ms magnitudes sit far below
    # 2^53, so the double quotient of an exact-multiple numerator rounds
    # to the exact integer and floor() never crosses it.
    cols = [good(seq).alias("seq"), good(mapped_op).alias("op")]
    cols += [good(row.getField(f.name)).alias(f.name)
             for f in row_schema.fields]
    cols += [good(F.floor(ts_ms / F.lit(1000)).cast("long")).alias("ts_s"),
             reason.alias(DLQ_REASON),
             F.col(value_col).alias(RAW_VALUE)]
    return df.select(*cols)


def split_debezium(decoded: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean WAL rows without the markers, dead-letter rows).

    DLQ rows keep ``_raw_value`` + ``_dlq_reason`` plus whatever event
    columns decoded (nulls) so they union-by-name into the engine's
    null-key quarantine store."""
    good = (decoded.where(F.col(DLQ_REASON).isNull())
            .drop(DLQ_REASON, RAW_VALUE))
    bad = decoded.where(F.col(DLQ_REASON).isNotNull())
    return good, bad


def encode_debezium_sql(row_cols: tuple[str, ...] = (
        "repo", "path", "commit", "lang", "content"), *,
        dialect: str = "spark", op_col: str = "op", seq_col: str = "seq",
        ts_col: str = "ts_s") -> str:
    """SQL expression rendering a feed row as a Debezium envelope string.

    The SAME expression text runs in Spark and DuckDB (`||` concat, CASE,
    cast) — it exists so tests and the DuckDB oracle can manufacture
    byte-identical envelope corpora from the deterministic change feed
    without any engine-specific JSON writer (whose key ordering would
    differ). ``row_cols`` must be STRING columns whose values contain no
    ``"`` or ``\\`` (true of the generator; real producers escape
    upstream). ``op_col`` holds insert/update/delete."""
    str_t = "string" if dialect == "spark" else "varchar"
    row_json = " || ".join(
        [f"'{{\"{row_cols[0]}\":\"' || {row_cols[0]}"] +
        [f"'\",\"{c}\":\"' || {c}" for c in row_cols[1:]] +
        ["'\"}'"])
    op_letter = (f"CASE {op_col} WHEN 'insert' THEN 'c' "
                 f"WHEN 'update' THEN 'u' ELSE 'd' END")
    return (
        f"'{{\"payload\":{{\"op\":\"' || {op_letter} || "
        f"'\",\"ts_ms\":' || cast({ts_col} * 1000 AS {str_t}) || "
        f"',\"source\":{{\"lsn\":' || cast({seq_col} AS {str_t}) || "
        f"'}},\"before\":' || "
        f"CASE WHEN {op_col} = 'delete' THEN {row_json} ELSE 'null' END || "
        f"',\"after\":' || "
        f"CASE WHEN {op_col} = 'delete' THEN 'null' ELSE {row_json} END || "
        f"'}}}}'")


def faulty_envelope_sql(env_expr: str, *, seq_col: str = "seq",
                        fault_mod: int = 97) -> str:
    """Deterministic fault injector over an envelope expression — the SAME
    text runs in Spark and DuckDB, so oracle and engine agree on exactly
    which records are broken and how:

    - ``seq % fault_mod = 3``: last byte truncated → ``malformed``
    - ``seq % fault_mod = 5``: op letter prefixed with x → ``bad_op``
    """
    return (f"CASE WHEN {seq_col} % {fault_mod} = 3 "
            f"THEN substr(({env_expr}), 1, length(({env_expr})) - 1) "
            f"WHEN {seq_col} % {fault_mod} = 5 "
            f"THEN replace(({env_expr}), '\"op\":\"', '\"op\":\"x') "
            f"ELSE ({env_expr}) END")


def write_debezium_batches(spark, out_dir: str, n_events: int,
                           n_batches: int, *, fault_mod: int | None = None,
                           **gen_kw) -> list[str]:
    """Materialize the deterministic change feed as ordered JSONL WAL
    segments of Debezium envelopes (the directory a
    ``StreamingIngest(wal_format='debezium')`` tails). Mirrors
    ``changefeed.write_changefeed_batches``: each segment generates only
    its own seq range (O(n_events) total). ``fault_mod`` injects
    deterministic undecodable records via :func:`faulty_envelope_sql` to
    exercise the dead-letter path."""
    import os

    from arlas_proc_spark.sources.changefeed import changefeed_df
    os.makedirs(out_dir, exist_ok=True)
    env = encode_debezium_sql(dialect="spark")
    if fault_mod:
        env = faulty_envelope_sql(env, fault_mod=fault_mod)
    sz = (n_events + n_batches - 1) // n_batches
    paths = []
    for b in range(n_batches):
        part = changefeed_df(spark, min((b + 1) * sz, n_events),
                             start=b * sz, **gen_kw)
        p = os.path.join(out_dir, f"batch_{b:05d}")
        (part.selectExpr(f"{env} AS value")
         .coalesce(1).write.mode("overwrite").text(p))
        paths.append(p)
    return paths
