"""Generator determinism + Spark/DuckDB bit-parity (the oracle foundation)."""

from __future__ import annotations

import duckdb

from arlas_proc_spark.sources.changefeed import changefeed_df, changefeed_sql

N = 2000


def test_feed_matches_duckdb(spark):
    sp = changefeed_df(spark, N).orderBy("seq", "commit").toPandas()
    dd = duckdb.sql(
        changefeed_sql(N, dialect="duckdb") + " ORDER BY seq, commit").fetchdf()
    assert len(sp) == len(dd)
    for col in ["seq", "op", "repo", "path", "commit", "ts_s", "lang", "content"]:
        assert sp[col].tolist() == dd[col].tolist(), f"mismatch in {col}"


def test_feed_properties(spark):
    df = changefeed_df(spark, N)
    rows = df.count()
    assert rows > N  # duplicates injected
    base = changefeed_df(spark, N, with_dups=False)
    assert base.count() == N
    # skew: hot repo gets ~30%
    hot = base.where("repo = 'repo_0000'").count()
    assert 0.2 * N < hot < 0.4 * N
    # ops present
    ops = {r["op"] for r in base.select("op").distinct().collect()}
    assert ops == {"insert", "update", "delete"}


def test_feed_deterministic(spark):
    a = changefeed_df(spark, 500).orderBy("seq", "commit").collect()
    b = changefeed_df(spark, 500).orderBy("seq", "commit").collect()
    assert a == b
