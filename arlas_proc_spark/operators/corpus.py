"""Corpus-shaping operators for training-data pipelines: token-window
document chunking and cross-document boilerplate-line removal.

Both stay scale-honest:

- ``chunk_documents`` is pure JVM expressions (split → sequence →
  transform/slice → one explode) — NO shuffle at all; chunking 100 TB is
  a map-only job whose output partitioning is inherited from the scan.
- boilerplate detection shuffles ONCE on md5(line) (narrow 32-byte keys,
  two-level distinct-then-count aggregation with map-side partials), and
  document reassembly is the one place the engine accepts a
  non-codegen ObjectHashAggregate (collect_list of (pos, line) structs)
  because array rebuild per doc is inherently object-typed; per-group
  state is bounded by lines-per-document, not corpus size.

The line-dedup semantics follow the published web-corpus recipe
(CCNet / RefinedWeb): a line occurring in >= min_doc_freq DISTINCT
documents is template boilerplate (headers, footers, cookie banners)
and is dropped from every document; lines shorter than min_line_chars
are exempt from detection (blank lines and separators are structure,
and counting them would both skew doc-freq and skew the shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arlas_proc_spark.operators.base import require_columns
from arlas_proc_spark.operators.text import tokens


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", chunk_tokens: int = 128,
                    overlap: int = 0) -> DataFrame:
    """Split each document into token windows of ``chunk_tokens``
    whitespace tokens, consecutive windows sharing ``overlap`` tokens
    (the standard pretraining/RAG chunker). Returns one row per chunk:
    (id, chunk_id, chunk_text, n_chunk_tokens). Documents with null or
    token-less text emit no chunks (nothing to train on).

    Chunk math: step = chunk_tokens - overlap; chunk i covers tokens
    [i*step, i*step + chunk_tokens); the number of chunks is
    max(ceil((n_tokens - overlap) / step), 1) for non-empty docs, so
    every token is covered, no chunk starts past the end (the last
    window may be short), and a doc shorter than one window still emits
    its single short chunk.
    """
    require_columns(df, id_col, text_col)
    chunk_tokens = int(chunk_tokens)
    overlap = int(overlap)
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be > 0, got {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in [0, chunk_tokens), got {overlap}")
    step = chunk_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    n_chunks = F.when(n > 0, F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(step)),
        F.lit(1))).cast("int")
    # sequence(0, -1) counts DOWN in Spark ([0, -1]) — the zero/negative
    # case must short-circuit to an empty array, never reach sequence()
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)) \
        .otherwise(F.array().cast("array<int>"))  # null n → otherwise too
    chunks = F.transform(
        idx,
        lambda i: F.struct(
            i.cast("long").alias("chunk_id"),
            F.array_join(F.slice(toks, i * step + 1, chunk_tokens),
                         " ").alias("chunk_text"),
            F.least(n - i * step, F.lit(chunk_tokens)).cast("long")
             .alias("n_chunk_tokens")))
    return (df.select(id_col, F.explode(chunks).alias("_c"))
              .select(id_col, "_c.chunk_id", "_c.chunk_text",
                      "_c.n_chunk_tokens"))


def contamination_report(corpus: DataFrame, benchmark: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         n: int = 3,
                         bench_text_col: str | None = None) -> DataFrame:
    """Benchmark-contamination check (the Gopher/LLaMA eval-leakage
    step): for every corpus document, the fraction of its distinct word
    n-grams that also appear ANYWHERE in the benchmark set. Returns
    (id, n_shingles, n_contaminated, contamination) — filter on
    ``contamination`` to quarantine leaked documents before training.

    Scale shape: the benchmark side (eval suites: thousands of items,
    not billions) collapses to its DISTINCT shingle hashes and is
    BROADCAST, so the corpus is never shuffled — one map-side join over
    the corpus scan, md5 keys so the broadcast holds hashes, not text.
    Docs with fewer than n tokens have zero shingles and report 0.0
    contamination (nothing to leak)."""
    from arlas_proc_spark.operators.text import shingles
    require_columns(corpus, id_col, text_col)
    bcol = bench_text_col or text_col
    require_columns(benchmark, bcol)
    bench_sh = benchmark_shingle_hashes(benchmark, bcol, n)
    return contamination_scores(corpus, bench_sh, id_col, text_col, n)


def benchmark_shingle_hashes(benchmark: DataFrame, text_col: str,
                             n: int = 3) -> DataFrame:
    """The benchmark set collapsed to its DISTINCT md5 shingle hashes
    (one column ``_bk``) — the small broadcastable artifact both the
    one-shot ``contamination_report`` and the incremental
    ``cdc.contamination_monitor`` score against. Persist it once and the
    benchmark text never needs re-shingling."""
    from arlas_proc_spark.operators.text import shingles
    return (benchmark
            .select(F.explode(shingles(text_col, n)).alias("_s"))
            .select(F.md5("_s").alias("_bk")).distinct())


def contamination_scores(corpus: DataFrame, bench_hashes: DataFrame,
                         id_col: str, text_col: str,
                         n: int = 3) -> DataFrame:
    """Score ``corpus`` docs against a precomputed benchmark hash set
    (``_bk`` column, see :func:`benchmark_shingle_hashes`). One copy of
    the scoring contract — the corpus side explodes map-side and joins
    the BROADCAST hash set; no corpus shuffle before the per-doc agg."""
    from arlas_proc_spark.operators.text import shingles
    doc_sh = corpus.select(
        F.col(id_col),
        F.explode_outer(shingles(text_col, n)).alias("_s"))
    joined = doc_sh.join(F.broadcast(bench_hashes),
                         F.md5(F.col("_s")) == F.col("_bk"), "left")
    return (joined.groupBy(id_col).agg(
        F.count("_s").alias("n_shingles"),
        F.count("_bk").alias("n_contaminated"),
        F.round(F.when(F.count("_s") > 0,
                       F.count("_bk") / F.count("_s"))
                .otherwise(F.lit(0.0)), 6).alias("contamination")))


def flag_boilerplate_lines(lines: DataFrame, id_col: str, pos_col: str,
                           line_col: str, min_doc_freq: int = 5,
                           min_line_chars: int = 8) -> DataFrame:
    """Flag boilerplate in an exploded (id, pos, line) frame: a line
    whose TRIMMED form is at least ``min_line_chars`` chars and occurs
    in >= ``min_doc_freq`` distinct documents gets is_boilerplate=true.

    One shuffle on md5(trimmed line) — the 32-char hash, not the line
    text, is the join/agg key, so the shuffle stays narrow no matter how
    long the lines are. countDistinct plans as the two-level
    expand/partial-agg pipeline (map-side combine on (hash, id) first),
    which is the scalable shape for doc-frequency counting."""
    require_columns(lines, id_col, pos_col, line_col)
    if min_doc_freq < 2:
        raise ValueError(f"min_doc_freq must be >= 2, got {min_doc_freq}")
    key = F.md5(F.trim(F.col(line_col)))
    eligible = F.length(F.trim(F.col(line_col))) >= int(min_line_chars)
    boiler = (lines.where(eligible)
              .groupBy(key.alias("_lk"))
              .agg(F.countDistinct(F.col(id_col)).alias("_df"))
              .where(F.col("_df") >= int(min_doc_freq))
              .select("_lk"))
    # Pure equi-join on the hash: identical trimmed text implies identical
    # trimmed length, so an ineligible line can never hash-match an
    # eligible boilerplate group — the eligibility gate on the agg side
    # alone is sufficient, and the plan stays a plain hash join.
    return (lines.join(boiler, key == F.col("_lk"), "left")
            .withColumn("is_boilerplate", F.col("_lk").isNotNull())
            .drop("_lk"))


def strip_boilerplate_lines(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", line_sep: str = "\n",
                            min_doc_freq: int = 5, min_line_chars: int = 8,
                            out_col: str = "text_clean") -> DataFrame:
    """Remove cross-document boilerplate lines and reassemble each
    document (CCNet / RefinedWeb line-level dedup). Returns one row per
    input document: (id, out_col, n_lines, n_lines_kept). Null-text
    documents pass through with a null ``out_col`` and zero counts —
    they are not silently dropped (the quality filter decides, not the
    dedup). ``line_sep`` is a literal separator, regex-escaped before
    the split."""
    require_columns(df, id_col, text_col)
    from arlas_proc_spark.operators.text import regex_literal
    lines = df.select(
        F.col(id_col),
        F.posexplode_outer(
            F.split(F.col(text_col), regex_literal(line_sep), -1))
         .alias("_pos", "_line"))
    flagged = flag_boilerplate_lines(
        lines, id_col, "_pos", "_line",
        min_doc_freq=min_doc_freq, min_line_chars=min_line_chars)
    # the null-text doc's single (null pos, null line) row from
    # posexplode_outer must not count as a kept line
    kept = F.when((~F.col("is_boilerplate")) & F.col("_line").isNotNull(),
                  F.struct(F.col("_pos"), F.col("_line")))
    agg = (flagged.groupBy(id_col).agg(
        F.count("_line").alias("n_lines"),
        F.count(kept).alias("n_lines_kept"),
        # array_sort on (pos, line) structs orders by pos — collect_list
        # order is NOT deterministic across retries, the sort is load-
        # bearing. Null-text docs have zero non-null lines -> null text.
        F.when(
            F.count("_line") > 0,
            F.array_join(F.transform(F.array_sort(F.collect_list(kept)),
                                     lambda s: s["_line"]), line_sep))
        .alias(out_col)))
    return agg.select(id_col, out_col, "n_lines", "n_lines_kept")


def pack_chunks(chunks: DataFrame, id_col: str = "doc_id",
                order_cols: tuple = ("doc_id", "chunk_id"),
                token_col: str = "n_chunk_tokens", budget: int = 2048,
                n_shards: int = 64,
                out_pack: str = "pack_id",
                out_offset: str = "pack_offset") -> DataFrame:
    """Sequence packing: assign chunks to fixed-token-budget packs (the
    pretraining batch-prep step — concatenate short chunks up to the
    context length so padding doesn't eat the batch).

    Semantics: chunks are ordered deterministically within
    ``n_shards`` hash shards (a doc's chunks stay in one shard, in
    order) and bin by their running-token OFFSET: a chunk starting at
    offset o goes to pack floor(o / budget). This is offset binning —
    the form production packers use when they may split/truncate at
    pack boundaries: every pack STARTS below the budget and overflows
    by at most one chunk, packs are dense (no internal waste), and the
    assignment is a pure window expression any engine replays exactly.
    True no-overflow greedy packing is a sequential scan per shard —
    strictly less parallel and not oracle-replayable; callers needing
    it can post-split the at-most-one straddling chunk per pack.

    Scale shape: ONE hash exchange on the shard id + a per-shard sort —
    shards are independent, so 100-TB packing parallelizes to
    ``n_shards`` regardless of document count; per-task state is one
    running sum. Returns the input plus (pack_id, pack_offset) where
    ``pack_id`` = '<shard>#<bin>' and ``pack_offset`` is the chunk's
    token start offset inside its pack."""
    require_columns(chunks, id_col, token_col, *order_cols)
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    from pyspark.sql.window import Window
    # portable shard hash (md5-of-identity, like operators/sampling.py):
    # 8 hex chars < 2^32 parse as a non-negative long in any engine, so
    # the oracle replays the exact same shard assignment
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
               16, 10).cast("long"),
        F.lit(n_shards))
    w = (Window.partitionBy("_shard")
         .orderBy(*[F.col(c) for c in order_cols])
         .rowsBetween(Window.unboundedPreceding, 0))
    start = (F.sum(F.col(token_col)).over(w) - F.col(token_col))
    pack = F.floor(start / F.lit(budget))
    return (chunks.withColumn("_shard", shard)
            .withColumn(out_pack,
                        F.concat_ws("#", F.col("_shard").cast("string"),
                                    pack.cast("string")))
            .withColumn(out_offset,
                        (start - pack * F.lit(budget)).cast("long"))
            .drop("_shard"))
