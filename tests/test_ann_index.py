"""AnnIndex: incrementally-maintained quantized-IVF ANN index — after
replaying ANY batch sequence (updates, deletes, duplicates, stale
events, replayed batch ids), query() equals cosine_topk_ivf_q8
recomputed from scratch on the corpus's final state with the same
frozen centroids."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arlas_proc_spark.cdc.ann_index import AnnIndex
from arlas_proc_spark.operators.ann import cosine_topk_ivf_q8

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .select("vec_id", "embedding"))


def _cents(spark):
    return _emb(spark).where(F.col("vec_id") % 25 == 0)


def _as_batch(df, seq0=0, op="insert"):
    return df.select(
        "vec_id", "embedding",
        (F.col("vec_id") + F.lit(seq0)).cast("long").alias("seq"),
        F.lit(op).alias("op"))


def _rows(df):
    return sorted(map(tuple, df.toPandas().values.tolist()))


def _make(spark, tmp_path, n_probe_queries=True):
    idx = AnnIndex.create(spark, str(tmp_path / "ann"), _cents(spark),
                          id_col="vec_id", n_buckets=4)
    return idx


def test_bootstrap_equals_from_scratch(spark, tmp_path):
    idx = _make(spark, tmp_path)
    idx.update(_as_batch(_emb(spark)), 0)
    queries = _emb(spark).where(F.col("vec_id") < 20)
    want = cosine_topk_ivf_q8(_emb(spark), queries, "vec_id", "embedding",
                              centroids=_cents(spark), k=3, n_probe=4)
    got = idx.query(queries, k=3, n_probe=4)
    assert _rows(got) == _rows(want)


def test_updates_deletes_stale_and_replay_converge(spark, tmp_path):
    idx = _make(spark, tmp_path)
    e = _emb(spark)
    idx.update(_as_batch(e), 0)
    # update a slice with shifted vectors at higher seq
    moved = (e.where(F.col("vec_id") % 7 == 0)
             .select("vec_id",
                     F.transform("embedding",
                                 lambda x: x + F.lit(0.05)).alias("embedding")))
    idx.update(_as_batch(moved, seq0=1_000_000, op="update"), 1)
    # delete a slice
    dels = e.where(F.col("vec_id") % 11 == 3) \
        .select("vec_id", "embedding")
    idx.update(_as_batch(dels, seq0=2_000_000, op="delete"), 2)
    # a STALE update (lower seq than the stored winner) must lose
    stale = e.where(F.col("vec_id") % 7 == 0).select(
        "vec_id",
        F.transform("embedding", lambda x: x * F.lit(0.0)).alias("embedding"))
    idx.update(_as_batch(stale, seq0=-1_000_000, op="update"), 3)
    # a replayed batch id is a no-op
    assert idx.update(_as_batch(dels, seq0=2_000_000, op="delete"),
                      2)["skipped"]
    # final corpus state, recomputed from scratch
    final = (e.join(dels.select("vec_id"), "vec_id", "left_anti")
             .join(moved.withColumnRenamed("embedding", "_m"),
                   "vec_id", "left")
             .select("vec_id",
                     F.coalesce("_m", "embedding").alias("embedding")))
    queries = e.where(F.col("vec_id") < 20)
    want = cosine_topk_ivf_q8(final, queries, "vec_id", "embedding",
                              centroids=_cents(spark), k=3, n_probe=4)
    got = idx.query(queries, k=3, n_probe=4)
    assert _rows(got) == _rows(want)
    # deleted docs never appear as neighbors
    deleted = {r.vec_id for r in dels.select("vec_id").collect()}
    assert not deleted & {r.neighbor_id for r in got.collect()}


def test_reopen_adopts_frozen_params(spark, tmp_path):
    idx = _make(spark, tmp_path)
    idx.update(_as_batch(_emb(spark).limit(50)), 0)
    again = AnnIndex(spark, str(tmp_path / "ann"))
    assert again.id_col == "vec_id"
    assert again._cent_mat.shape == idx._cent_mat.shape
    q = _emb(spark).where(F.col("vec_id") < 5)
    assert _rows(again.query(q)) == _rows(idx.query(q))


def test_null_embedding_upsert_fails_loudly(spark, tmp_path):
    idx = _make(spark, tmp_path)
    bad = spark.createDataFrame(
        [(999999, None, 1, "insert")],
        "vec_id long, embedding array<float>, seq long, op string")
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception, match="null embedding|USER_RAISED"):
        idx.update(bad, 0)
    # the failed batch never reached the ledger — the id stays usable
    m = idx.update(_as_batch(_emb(spark).limit(5)), 0)
    assert not m.get("skipped")


def test_open_missing_index_fails(spark, tmp_path):
    with pytest.raises(ValueError, match="create"):
        AnnIndex(spark, str(tmp_path / "nope"))
