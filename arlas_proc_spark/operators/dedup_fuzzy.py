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
                        n: int = 3, threshold: float = 0.5,
                        max_doc_freq: int = 1000) -> DataFrame:
    """Exact Jaccard over word-n-gram shingle sets for all pairs sharing at
    least one NON-UBIQUITOUS shingle. Output: id_a < id_b, jaccard.

    ``max_doc_freq`` is the stop-shingle cap: a shingle appearing in more
    than this many documents is dropped from the self-join (standard
    practice — one ubiquitous trigram like a boilerplate import line would
    otherwise create an O(df²) candidate group; at 10^8 docs a single
    shingle shared by 1% of them is a 10^12-pair explosion). The cap
    bounds the join's per-key fan-out at max_doc_freq², at the price of
    missing pairs whose ONLY shared shingles are stop-shingles — such
    pairs overlap solely on boilerplate, which is exactly what Jaccard
    dedup should not count. Jaccard denominators still use the full
    shingle sets, so surviving pairs' scores are exact (slightly
    UNDER-counted intersections when stop-shingles were shared — the
    conservative direction for a dedup decision). ``None`` disables."""
    require_columns(df, id_col, text_col)
    ex = _exploded_shingles(df, id_col, text_col, n)
    sizes = ex.groupBy("_id").agg(F.count(F.lit(1)).alias("_sz"))
    joinable = ex
    if max_doc_freq is not None:
        df_counts = (ex.groupBy("_sh")
                     .agg(F.countDistinct("_id").alias("_df"))
                     .where(F.col("_df") <= max_doc_freq))
        joinable = ex.join(df_counts.select("_sh"), "_sh")
    a, b = joinable.alias("a"), joinable.alias("b")
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


def banded_minhash(sigs: DataFrame, id_col: str, k: int,
                   bands: int) -> DataFrame:
    """Stack a minhash-signature frame (``m0``..``m{k-1}``) into LSH band
    rows ``(_id, _band, _sig)``. ``concat_ws`` (not ``concat``) skips the
    NULL minhashes of shingle-less docs, yielding '' which the filter
    drops — empty docs never enter any bucket. Shared by the one-shot
    ``minhash_lsh_pairs`` and the incrementally-maintained
    ``cdc.dedup_index.DedupIndex``."""
    r = k // bands
    parts = []
    for b in range(bands):
        sig = F.concat_ws("_", *[F.col(f"m{b * r + j}") for j in range(r)])
        parts.append(sigs.select(F.col(id_col).alias("_id"),
                                 F.lit(b).alias("_band"), sig.alias("_sig"))
                     .where(F.col("_sig") != ""))
    stacked = parts[0]
    for x in parts[1:]:
        stacked = stacked.unionByName(x)
    return stacked


def lsh_band_pairs(stacked: DataFrame) -> DataFrame:
    """Self-join the band rows of :func:`banded_minhash` into candidate
    pairs (id_a < id_b, n_bands_shared). ONE copy of the pair contract —
    shared by the one-shot ``minhash_lsh_pairs`` and the incremental
    ``cdc.dedup_index.DedupIndex.pairs`` so the two can never drift.

    The band frame is checkpointed before the self-join: both join
    sides otherwise re-run the ENTIRE upstream lineage (shingle → k
    minhashes → bands — and whatever produced the text), doubling it
    per caller; composed pipelines (canonical_docs: chunk → boilerplate
    strip → clean → minhash) were measured paying the sub-DAG 5-7×
    through this join before the cut. Band rows are k/bands hashes per
    doc — far smaller than the work that made them."""
    stacked = stacked.localCheckpoint(eager=False)
    a, b2 = stacked.alias("a"), stacked.alias("b")
    return (a.join(b2, (F.col("a._band") == F.col("b._band")) &
                   (F.col("a._sig") == F.col("b._sig")) &
                   (F.col("a._id") < F.col("b._id")))
            .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_bands_shared")))


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      n: int = 3, k: int = 8, bands: int = 4) -> DataFrame:
    """LSH candidate pairs: k minhashes split into `bands` bands of k/bands
    rows; docs sharing any full band signature become a candidate pair.
    Output: id_a < id_b, n_bands_shared. Verify candidates with
    ngram_jaccard_pairs afterwards (standard LSH + verify)."""
    sigs = minhash_signatures(df, id_col, text_col, n, k)
    return lsh_band_pairs(banded_minhash(sigs, id_col, k, bands))


@pandas_udf(T.LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """REFERENCE KERNEL (per-row Python; kept only as the parity oracle for
    ``simhash_signatures_df`` in tests — do not use in pipelines). 64-bit
    SimHash over whitespace tokens: per token, a 64-bit md5-derived hash
    votes ±1 per bit; the sign vector is the fingerprint."""
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


@pandas_udf(T.LongType())
def simhash64_batch(texts: pd.Series) -> pd.Series:
    """Batch-vectorized SimHash — the production kernel, bit-identical to
    the per-row reference ``simhash64`` (same md5 ⇒ same votes ⇒ same
    signature). Per Arrow batch: tokenize, ``pd.factorize`` the token
    stream (hash-based, no string sort), md5 ONLY the unique tokens
    (vocabulary reuse makes uniques ≪ occurrences), then accumulate the
    ±1 bit votes per document with NO per-token Python:

    - dense path (docs × vocab fits in memory): one ``np.bincount`` over
      the (doc, token) pair keys builds the count matrix, and a single
      BLAS matmul against the (vocab × 64) vote matrix produces every
      document's 64 vote sums at once;
    - sparse path (large vocab): unique (doc, token) pairs with counts,
      one ``np.add.at`` scatter of count-scaled vote rows.

    Counts stay < 2^53 so the float64 matmul is exact."""
    import hashlib
    from itertools import chain

    shifts = np.arange(64, dtype=np.uint64)
    n = len(texts)
    toks = texts.fillna("").str.split()
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
    total = int(lens.sum())
    if total == 0:
        return pd.Series(np.zeros(n, dtype=np.int64))
    flat = np.fromiter(chain.from_iterable(toks), dtype=object, count=total)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    inv, uniq = pd.factorize(flat)
    u = len(uniq)
    hashes = np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
         for t in uniq), dtype=np.uint64, count=u)
    votes = (((hashes[:, None] >> shifts) & np.uint64(1))
             .astype(np.float64) * 2.0 - 1.0)          # (U, 64)
    if n * u <= 8_000_000:
        counts = np.bincount(rows * u + inv, minlength=n * u) \
            .reshape(n, u).astype(np.float64)
        acc = counts @ votes                            # (N, 64)
    else:
        # large vocab: 64 weighted bincounts over the token stream
        # (bincount is a single C pass; np.add.at is ~10x slower here)
        acc = np.empty((n, 64), dtype=np.float64)
        for b in range(64):
            acc[:, b] = np.bincount(rows, weights=votes[inv, b],
                                    minlength=n)
    # pack the 64 sign bits per doc: bit i = LSB-first -> one uint64 view
    packed = np.packbits(acc > 0, axis=1, bitorder="little") \
        .view(np.uint64).ravel()
    return pd.Series(packed.astype(np.int64))  # two's-complement view


def simhash_signatures_df(df: DataFrame, id_col: str,
                          text_col: str) -> DataFrame:
    """64-bit SimHash per doc, entirely in JVM expressions — the scale
    kernel (the pandas-UDF ``simhash64`` above looped per row AND per
    token in Python; this formulation is explode → md5 → 64 bit-vote sums
    inside one whole-stage-codegen hash aggregation, with map-side partial
    combine so the shuffle carries one 64-int row per doc per mapper).

    Bit math: h = first 8 bytes of md5(token) big-endian; bit i (from the
    LSB) votes +1 if set else -1; the doc's signature sets bit i iff the
    vote sum is > 0 (ties clear, matching the reference kernel and the
    DuckDB oracle). The 64-bit value is carried as two 32-bit halves so no
    intermediate overflows under ANSI; the sign bit (63) is applied as a
    +(-2^63) at the end. Token-less docs (null/empty/whitespace-only) get
    signature 0. Output: (_id, _sig long)."""
    require_columns(df, id_col, text_col)
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
                     lambda t: t != "")).alias("_tok"))
    h = F.md5(F.col("_tok"))
    hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")   # bits 63..32
    lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("long")   # bits 31..0
    aggs = []
    for i in range(64):
        half, sh = (hi, i - 32) if i >= 32 else (lo, i)
        bit = F.shiftrightunsigned(half, sh).bitwiseAND(F.lit(1))
        aggs.append(F.sum(bit * 2 - 1).alias(f"_b{i}"))
    voted = toks.groupBy("_id").agg(*aggs)
    val = None
    for i in range(63):
        term = F.when(F.col(f"_b{i}") > 0,
                      F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        val = term if val is None else val + term
    val = F.when(F.col("_b63") > 0,
                 val + F.lit(-9223372036854775808)).otherwise(val)
    packed = voted.select("_id", val.alias("_sig"))
    # token-less docs never survive the explode; restore them with sig 0
    base = df.select(F.col(id_col).alias("_id"))
    return (base.join(packed, "_id", "left")
            .select("_id", F.coalesce(F.col("_sig"),
                                      F.lit(0).cast("long")).alias("_sig")))


def simhash_near_dups(df: DataFrame, id_col: str, text_col: str,
                      prefix_bits: int = 16,
                      kernel: str = "batch") -> DataFrame:
    """SimHash near-dup candidates: bucket by the top `prefix_bits` bits
    (one shuffle on a high-cardinality key), pair within buckets, rank by
    hamming distance. Output: id_a < id_b, hamming.

    ``kernel``: 'batch' (default — the numpy batch-vectorized Arrow UDF,
    measured 25x the per-row reference on the doc fixture) or 'expr'
    (pure JVM explode + bit-vote aggregation — no Python workers needed;
    wins when Python worker startup dominates or Arrow transfer of large
    texts is the bottleneck). All kernels produce bit-identical
    signatures."""
    require_columns(df, id_col, text_col)
    if kernel == "expr":
        sig = simhash_signatures_df(df, id_col, text_col)
    else:
        sig = df.select(F.col(id_col).alias("_id"),
                        simhash64_batch(F.col(text_col)).alias("_sig"))
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
    """TOY-FIXTURE variant: brute force within 16 sign-prefix cells (see
    ann.coarse_bucket). Within-cell pairing is O(n²/16) — fine for small
    corpora, NOT the scale path. Use ``embedding_near_dups_lsh`` for real
    data (configurable-bit random-hyperplane banding)."""
    from arlas_proc_spark.operators.ann import coarse_bucket, cosine_sim
    sig = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
                    coarse_bucket(vec_col, 4).alias("_bucket"))
    a, b = sig.alias("a"), sig.alias("b")
    return (a.join(b, (F.col("a._bucket") == F.col("b._bucket")) &
                   (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                    F.round(cosine_sim(F.col("a._v"), F.col("b._v")), 6).alias("cosine"))
            .where(F.col("cosine") >= threshold))


def embedding_near_dups_lsh(df: DataFrame, id_col: str, vec_col: str, *,
                            dim: int, threshold: float = 0.95,
                            bits_per_band: int = 16, n_bands: int = 8,
                            seed: int = 7,
                            max_bucket_size: int | None = None) -> DataFrame:
    """Embedding-cosine near-dup pairs ≥ threshold via random-hyperplane
    LSH banding (the scale path — replaces the 16-cell coarse quantizer).

    Candidates are pairs sharing ≥1 of ``n_bands`` band signatures of
    ``bits_per_band`` sign bits each; exact cosine verifies. Defaults
    (16 bits × 8 bands) give 2^16 buckets per band and ≥0.97 recall at
    cosine 0.95 (per-bit collision 1-θ/π ≈ 0.90 → per-band 0.90^16 ≈
    0.18 → 1-(1-0.18)^8). Recall at lower thresholds needs shorter
    bands — tune bits_per_band DOWN and n_bands UP (see the recall maths
    on ann.band_signature_cols). ``max_bucket_size`` drops degenerate
    over-full buckets, bounding within-bucket pairing at a documented
    cap. Output: id_a < id_b, cosine."""
    from arlas_proc_spark.operators.ann import (band_signatures_array,
                                                cosine_sim_fast,
                                                random_hyperplanes)
    require_columns(df, id_col, vec_col)
    planes = random_hyperplanes(dim, bits_per_band * n_bands, seed)
    stacked = (df.select(F.col(id_col).alias("_id"),
                         F.col(vec_col).alias("_v"),
                         band_signatures_array(vec_col, planes,
                                               n_bands).alias("_bands"))
               .select("_id", "_v",
                       F.posexplode("_bands").alias("_band", "_sig")))
    if max_bucket_size is not None:
        keep = (stacked.groupBy("_band", "_sig")
                .agg(F.count(F.lit(1)).alias("_n"))
                .where(F.col("_n") <= max_bucket_size)
                .select("_band", "_sig"))
        stacked = stacked.join(keep, ["_band", "_sig"])
    a, b = stacked.alias("a"), stacked.alias("b")
    # multi-band collisions dedup via numeric max over identical cosines
    # (codegen HashAggregate — see cosine_topk_lsh for why not
    # dropDuplicates over the vector columns)
    return (a.join(b, (F.col("a._band") == F.col("b._band")) &
                   (F.col("a._sig") == F.col("b._sig")) &
                   (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"),
                    F.round(cosine_sim_fast(F.col("a._v"), F.col("b._v")), 6)
                     .alias("cosine"))
            .where(F.col("cosine") >= threshold)
            .groupBy("id_a", "id_b")
            .agg(F.max("cosine").alias("cosine")))
