"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products via `F.zip_with` + `F.aggregate` (JVM expressions, no
  Python); the query side is broadcast (queries << corpus).
- ``cosine_topk_bucketed``: the scale path — a coarse quantizer (sign of
  the first d dims, an IVF-style cell id) restricts candidates to the
  query's cell. At 100 TB the corpus shuffles once by cell; queries
  broadcast per cell.

All math in double; output similarity rounded so results are stable across
engines/plan shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arlas_proc_spark.operators.base import require_columns


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; a zero-norm vector yields 0.0, not NaN — Spark
    sorts NaN ABOVE every number, so an unguarded 0/0 would make a
    zero-padding embedding the rank-1 'neighbor' of every query."""
    denom = _norm(a) * _norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))


def coarse_bucket(vec_col: str | Column, d: int = 4) -> Column:
    """IVF-style cell id: concatenated signs of the first d dimensions.
    Deterministic, portable, splits the corpus into 2^d cells. Uses
    null-safe F.get (not element_at, which throws on short arrays under
    ANSI); a missing dimension reads null → sign '0', matching DuckDB's
    out-of-range list index semantics."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.concat_ws("", *[
        F.when(F.get(c, i) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(d)
    ])


def cosine_topk(corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
                k: int = 3, round_to: int = 3) -> DataFrame:
    """Exact top-k cosine neighbors of each query against the corpus
    (excluding self). Output: query_id, neighbor_id, rank, cosine.

    The cross join broadcasts the (small) query side; ties broken by
    neighbor id for determinism."""
    require_columns(corpus, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    sims = (c.crossJoin(F.broadcast(q))
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id",
                    F.round(cosine_sim(F.col("_qv"), F.col("_cv")), round_to)
                     .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (sims.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cosine"))


def cosine_topk_bucketed(corpus: DataFrame, queries: DataFrame, id_col: str,
                         vec_col: str, k: int = 3, d: int = 4,
                         round_to: int = 3) -> DataFrame:
    """ANN variant: candidates restricted to the query's coarse cell.
    Recall < 1 by design; same output shape as cosine_topk."""
    require_columns(corpus, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
                       coarse_bucket(vec_col, d).alias("_cell"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
                      coarse_bucket(vec_col, d).alias("_cell"))
    sims = (c.join(F.broadcast(q), "_cell")
            .where(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id",
                    F.round(cosine_sim(F.col("_qv"), F.col("_cv")), round_to)
                     .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (sims.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cosine"))
