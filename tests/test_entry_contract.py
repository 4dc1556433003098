"""Mimics the driver's correctness gate: for every queries() entry with an
oracle_sql(), run both at sf0.001 and compare row count + column names +
values (order-insensitive), like CORRECTNESS_r{N}.json does at sf0.01."""

from __future__ import annotations

import math
import sys

import duckdb
import pytest

import conftest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402

import os

SF_DIR = os.environ.get("CONTRACT_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = conftest.duck_cursor()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"{v:.6f}"
    if isinstance(v, bool):
        return str(bool(v))
    return str(v)


def _normalize(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in row)
            for row in pdf[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows)


# the gate covers the driver's 50-query window AND the oracle-checked
# variants outside it (extra_queries) — every operator stays verified
ORACLES = {**entrymod.oracle_sql(), **entrymod.extra_oracle_sql()}
ALL = {**entrymod.queries(), **entrymod.extra_queries()}


def test_driver_window_holds_all_graded_queries():
    """The driver's CORRECTNESS gate checks the FIRST 50 queries() entries
    (r2 lesson: 11 fell outside). Pin the count and that every entry has
    an oracle twin."""
    q = entrymod.queries()
    assert len(q) <= 50, f"{len(q)} queries — driver grades only first 50"
    missing = set(q) - set(entrymod.oracle_sql())
    assert not missing, f"queries without oracles: {missing}"
    assert set(entrymod.extra_queries()) == set(entrymod.extra_oracle_sql())


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, ddb, name):
    spark_df = ALL[name](spark, SF_DIR).toPandas()
    try:
        oracle_df = ddb.execute(ORACLES[name]).fetchdf()
    except duckdb.OutOfMemoryException:
        # this host sporadically fails tiny allocations with >100GB free
        # (thread-TLS exhaustion, see conftest.py) and the failure sticks
        # to the shared instance's pool — retry on an ISOLATED
        # single-threaded connection, which never spawns a worker thread
        # and so cannot hit the TLS wall
        con = duckdb.connect(config={"threads": 1})
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM '{SF_DIR}/{t}.parquet'")
        oracle_df = con.execute(ORACLES[name]).fetchdf()
        con.close()
    scols, srows = _normalize(spark_df)
    ocols, orows = _normalize(oracle_df)
    assert scols == ocols, f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), \
        f"{name}: row count {len(srows)} vs {len(orows)}"
    if srows != orows:
        diff = [(a, b) for a, b in zip(srows, orows) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = ALL[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_simhash_oracle_handles_tokenless_docs(spark, ddb):
    """Docs with empty/whitespace-only/null text carry signature 0 in the
    Spark kernel and pair within bucket 0; the DuckDB oracle must keep
    them (left join) instead of dropping them with the token filter."""
    from arlas_proc_spark.operators.dedup_fuzzy import simhash_near_dups
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").limit(50))
    extra = spark.createDataFrame(
        [(90001, ""), (90002, "   "), (90003, None)],
        "doc_id long, text string")
    all_docs = docs.unionByName(extra)
    got = simhash_near_dups(all_docs, "doc_id", "text",
                            prefix_bits=8).toPandas()
    con = conftest.duck_cursor()
    con.register("documents", all_docs.toPandas())
    want = con.execute(ORACLES["simhash_neardups"]).fetchdf()
    key = lambda df: sorted(  # noqa: E731
        map(tuple, df[["id_a", "id_b", "hamming"]].values.tolist()))
    assert key(got) == key(want)
    z = set(zip(got.id_a, got.id_b))
    assert {(90001, 90002), (90001, 90003), (90002, 90003)} <= z


def test_chunk_oracle_handles_tokenless_docs(spark, ddb):
    """Empty/whitespace-only/null docs emit NO chunks in the engine;
    the DuckDB oracle must agree — string_split_regex(trim('')) is ['']
    (len 1), so without the empty-token filter the oracle would emit a
    phantom ''-chunk (review finding, fixture has no such docs)."""
    from arlas_proc_spark.operators.corpus import chunk_documents
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").limit(20))
    extra = spark.createDataFrame(
        [(90001, ""), (90002, "   "), (90003, None)],
        "doc_id long, text string")
    all_docs = docs.unionByName(extra)
    got = chunk_documents(all_docs, chunk_tokens=40, overlap=10).toPandas()
    con = conftest.duck_cursor()
    con.register("documents", all_docs.toPandas())
    want = con.execute(ORACLES["doc_chunks"]).fetchdf()
    key = lambda df: sorted(map(tuple, df[  # noqa: E731
        ["doc_id", "chunk_id", "chunk_text", "n_chunk_tokens"]
    ].values.tolist()))
    assert key(got) == key(want)
    assert not (got.doc_id >= 90001).any()  # tokenless docs emit nothing
