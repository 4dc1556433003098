"""Near-duplicate detection at training-data scale.

Four families, each with a different scale/precision point:

- exact: hash-groupBy on content (or sha256(content)) — one shuffle.
- n-gram Jaccard: exact similarity on shingle sets; pairwise, so only
  viable after blocking. Implemented shingle-join style (explode →
  self-join on shingle → count) which IS the blocking: only pairs sharing
  ≥1 shingle are ever materialized.
- MinHash + LSH: k md5-based minhashes → b bands → candidate pairs bucket
  by band signature. Hashes are md5 hex strings compared lexicographically,
  which keeps the whole operator portable (same result in any SQL engine,
  no engine-specific 64-bit hash).
- SimHash: 64-bit sign-aggregated token hashes via a vectorized pandas UDF
  (bit-twiddling is the genuinely non-SQL part); hamming-distance buckets.

At 100 TB: everything is shuffle-on-shingle/band — fine, because shingle
and band keys are high-cardinality (no hot reducer); the explode factor is
bounded by tokens-per-doc. The LSH path is the scale path: candidate pairs
only, verify with exact Jaccard afterwards.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from arlas_proc_spark.operators.base import require_columns
from arlas_proc_spark.operators.text import shingles


def exact_duplicates(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Groups of byte-identical docs: content → (canonical_id = min id,
    n_dups). One hash aggregation; at scale group on sha2(content) so the
    shuffle key is 64 bytes, not the document. Null-content docs are
    excluded — sha2(NULL) is NULL, so they would all collapse into one
    bogus 'duplicate' group of unrelated documents."""
    return (df.where(F.col(content_col).isNotNull())
            .groupBy(F.sha2(F.col(content_col), 256).alias("content_key"))
            .agg(F.min(id_col).alias("canonical_id"),
                 F.count(F.lit(1)).alias("n_dups"))
            .where(F.col("n_dups") > 1))


def _exploded_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    return (df.select(F.col(id_col).alias("_id"),
                      F.explode(shingles(text_col, n)).alias("_sh")))


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard over word-n-gram shingle sets for all pairs sharing at
    least one shingle. Output: id_a < id_b, jaccard."""
    require_columns(df, id_col, text_col)
    ex = _exploded_shingles(df, id_col, text_col, n)
    sizes = ex.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    a, b = ex.alias("a"), ex.alias("b")
    inter = (a.join(b, (F.col("a._sh") == F.col("b._sh")) &
                    (F.col("a._id") < F.col("b._id")))
             .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("_inter")))
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_sz").alias("_sza"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_sz").alias("_szb"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard", F.round(
                F.col("_inter") /
                (F.col("_sza") + F.col("_szb") - F.col("_inter")), 6))
            .where(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n: int = 3, k: int = 8) -> DataFrame:
    """k MinHash values per doc: m_i = min over shingles of
    md5(i || '|' || shingle) (hex string order). Empty docs get nulls."""
    require_columns(df, id_col, text_col)
    sh = shingles(text_col, n)
    out = df.select(F.col(id_col), sh.alias("_sh"))

    def _hasher(i: int):
        # single-arg lambda: a 2-arg lambda would make F.transform pass the
        # array index as the 2nd argument and shadow the closure value
        return lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))

    cols = [F.col(id_col)]
    for i in range(k):
        cols.append(F.array_min(F.transform(F.col("_sh"), _hasher(i)))
                    .alias(f"m{i}"))
    return out.select(*cols)


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3, k: int = 8, bands: int = 4) -> DataFrame:
    """LSH candidate pairs: k minhashes split into `bands` bands of k/bands
    rows; docs sharing any full band signature become a candidate pair.
    Output: id_a < id_b, n_bands_shared. Verify candidates with
    ngram_jaccard_pairs afterwards (standard LSH + verify)."""
    sigs = minhash_signatures(df, id_col, text_col, n, k)
    r = k // bands
    banded = []
    for b in range(bands):
        sig = F.concat_ws("_", *[F.col(f"m{b * r + j}") for j in range(r)])
        banded.append(sigs.select(F.col(id_col).alias("_id"),
                                  F.lit(b).alias("_band"), sig.alias("_sig"))
                      .where(F.col("_sig") != ""))
    stacked = banded[0]
    for x in banded[1:]:
        stacked = stacked.unionByName(x)
    a, b2 = stacked.alias("a"), stacked.alias("b")
    return (a.join(b2, (F.col("a._band") == F.col("b._band")) &
                   (F.col("a._sig") == F.col("b._sig")) &
                   (F.col("a._id") < F.col("b._id")))
            .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_bands_shared")))


@pandas_udf(T.LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (vectorized, numpy bit ops):
    per token, a 64-bit hash votes ±1 per bit; the sign vector is the
    fingerprint. Near-dups differ in few bits (hamming)."""
    import hashlib

    shifts = np.arange(64, dtype=np.uint64)
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        acc = np.zeros(64, dtype=np.int64)
        for tok in t.split():
            h = np.uint64(
                int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big"))
            bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
            acc += 2 * bits - 1
        val = 0
        for bit in np.nonzero(acc > 0)[0]:
            val |= 1 << int(bit)
        out[i] = val - 2**64 if val >= 2**63 else val  # two's complement
    return pd.Series(out)


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str,
                      prefix_bits: int = 16) -> DataFrame:
    """SimHash near-dup candidates: bucket by the top `prefix_bits` bits
    (one shuffle on a high-cardinality key), pair within buckets, rank by
    hamming distance. Output: id_a < id_b, hamming."""
    require_columns(df, id_col, text_col)
    sig = df.select(F.col(id_col).alias("_id"),
                    simhash64(F.col(text_col)).alias("_sig"))
    bucket = F.shiftrightunsigned(F.col("_sig"), 64 - prefix_bits)
    sig = sig.withColumn("_bucket", bucket)
    a, b = sig.alias("a"), sig.alias("b")
    xor = F.expr("a._sig ^ b._sig")
    return (a.join(b, (F.col("a._bucket") == F.col("b._bucket")) &
                   (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                    F.bit_count(xor).alias("hamming")))


def embedding_near_dups(df: DataFrame, id_col: str, vec_col: str,
                        threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ threshold. Brute force within
    sign-prefix buckets (see ann.coarse_bucket) to avoid the full cross
    join; exact cosine in double."""
    from arlas_proc_spark.operators.ann import coarse_bucket, cosine_sim
    sig = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
                    coarse_bucket(vec_col, 4).alias("_bucket"))
    a, b = sig.alias("a"), sig.alias("b")
    return (a.join(b, (F.col("a._bucket") == F.col("b._bucket")) &
                   (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                    F.round(cosine_sim(F.col("a._v"), F.col("b._v")), 6).alias("cosine"))
            .where(F.col("cosine") >= threshold))
