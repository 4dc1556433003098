"""Text analysis for training-data pipelines over the documents table.

All pure `pyspark.sql.functions` expressions (JVM-side, codegen'd) so they
survive 100 TB: tokenization by regex split, quality ratios, n-gram
shingles, language-ID heuristic, fingerprinting. The shapes mirror what a
pretraining-data pipeline needs (dedup keys, quality filters, token
budgets); the reference analog is the scalar-function layer of SURVEY §2.8.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arlas_proc_spark.operators.base import require_columns

# tiny embedded stopword list — enough for a ratio feature and en-detection
STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "that"]


def regex_literal(s: str) -> str:
    """Escape a literal string for use as a Java-regex pattern (Spark's
    split/regexp_* take regexes, not literals). Shared by every operator
    that splits on a caller-supplied separator."""
    return "".join("\\" + ch if not ch.isalnum() else ch for ch in s)


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization, empty-safe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")


BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_ish_token_count(col: str | Column) -> Column:
    """Sub-word-ish token count: letter runs, digit runs, and single
    punctuation marks each count as one token — a cheap, deterministic BPE
    proxy. The pattern is RE2-compatible (no lookaround) so the exact same
    regex runs in DuckDB/Trino for oracle parity."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc stats: n_chars, n_tokens, avg_token_len, stopword_ratio,
    punct_ratio, and a composite quality score in [0,1]."""
    require_columns(df, text_col)
    toks = tokens(text_col)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    n_chars = F.length(text_col)
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    avg_tok = F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    quality = (
        F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((avg_tok >= 2) & (avg_tok <= 12), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.2, F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.01, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return (df.withColumn("n_chars_calc", n_chars.cast("long"))
              .withColumn("n_tokens", n_tok.cast("long"))
              .withColumn("avg_token_len", F.round(avg_tok, 4).cast("double"))
              .withColumn("stopword_ratio", F.round(stop_ratio, 4).cast("double"))
              .withColumn("punct_ratio", F.round(punct_ratio, 4).cast("double"))
              .withColumn("quality_score", F.round(quality, 2).cast("double")))


def with_lang_id(df: DataFrame, text_col: str = "text",
                 out_col: str = "lang_pred") -> DataFrame:
    """N-gram-free language-ID heuristic: English if enough stopword mass,
    else 'unk'. Deliberately simple + fully deterministic/portable."""
    toks = tokens(text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    ratio = F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))
    return df.withColumn(out_col, F.when(ratio >= 0.02, "en").otherwise("unk"))


def shingles(col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles as 'w1 w2 w3' strings (distinct). Docs with
    fewer than n tokens yield an EMPTY array: sequence(1, 0) counts DOWN
    in Spark ([1, 0]) and element_at would then throw under ANSI, so the
    short-doc case is guarded explicitly (DuckDB's generate_series(1, 0)
    is empty — the oracle agrees)."""
    toks = tokens(col)
    idx = F.when(F.size(toks) >= n,
                 F.sequence(F.lit(1), F.size(toks) - (n - 1))) \
           .otherwise(F.array().cast("array<int>"))
    return F.array_distinct(F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])))


def with_fingerprint(df: DataFrame, text_col: str = "text", n: int = 3,
                     out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint = lexicographic min of md5(shingle) — a
    1-permutation MinHash; identical-content docs collide, near-identical
    docs collide with prob ≈ Jaccard."""
    sh = shingles(text_col, n)
    return df.withColumn(
        out_col,
        F.array_min(F.transform(sh, lambda s: F.md5(s))))


# PII patterns, applied IN ORDER (email first: an address contains digit
# runs and dots that the later patterns would mangle). Every pattern is
# RE2-compatible (no lookaround, ASCII \b) so the exact same regex runs
# in DuckDB/Trino for oracle parity; replacements contain no characters
# that could re-match a later pattern.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{13,19}\b", "<LONGNUM>"),  # card/account-number-length runs
]


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str = "text_scrubbed") -> DataFrame:
    """Redact common PII shapes (emails, IPv4 addresses, 13-19-digit
    numbers) with typed placeholders — the standard pre-training scrub
    pass. Pure chained regexp_replace: JVM-side, codegen'd, map-only
    (no shuffle), so it costs one scan at any corpus size. Nulls pass
    through as nulls."""
    require_columns(df, text_col)
    c: Column = F.col(text_col)
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return df.withColumn(out_col, c)


def with_repetition_stats(df: DataFrame, text_col: str = "text",
                          line_sep: str = "\n") -> DataFrame:
    """In-document repetition features (the Gopher quality rules'
    repetition family): fraction of duplicate lines and duplicate word
    bigrams inside each document — high values mark boilerplate-ish /
    degenerate text. Pure JVM array expressions, map-only (no shuffle,
    no UDF): per-row cost is O(len), so the pass is one corpus scan at
    any size. Null text yields null ratios (unknown, not 0 — the
    quality gate decides); docs with no lines/bigrams yield 0.0
    (nothing repeats)."""
    require_columns(df, text_col)
    lines = F.split(F.col(text_col), regex_literal(line_sep), -1)
    n_lines = F.size(lines)
    dup_line = F.when(
        n_lines > 0,
        1.0 - F.size(F.array_distinct(lines)) / n_lines.cast("double"))
    toks = tokens(text_col)
    n_tok = F.size(toks)
    bigrams = F.when(n_tok >= 2, F.transform(
        F.sequence(F.lit(1), n_tok - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i),
                              F.element_at(toks, i + 1)))) \
        .otherwise(F.array().cast("array<string>"))
    n_bi = F.size(bigrams)
    dup_bi = F.when(
        n_bi > 0,
        1.0 - F.size(F.array_distinct(bigrams)) / n_bi.cast("double"))
    null_text = F.col(text_col).isNull()
    return (df
            .withColumn("n_lines",
                        F.when(~null_text, n_lines).cast("long"))
            .withColumn("dup_line_ratio",
                        F.when(~null_text,
                               F.round(F.coalesce(dup_line, F.lit(0.0)), 6)))
            .withColumn("dup_2gram_ratio",
                        F.when(~null_text,
                               F.round(F.coalesce(dup_bi, F.lit(0.0)), 6))))


_CONTROL_CLASS = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def normalize_text(df: DataFrame, text_col: str = "text",
                   out_col: str = "text_norm",
                   nfc: bool = True) -> DataFrame:
    """Pretraining text cleanup: NFC unicode normalization → strip C0/DEL
    control characters → collapse whitespace runs to one space → trim.

    NFC runs as an Arrow-batched pandas UDF (Spark has no built-in
    unicode normalizer; per-batch ``unicodedata.normalize`` is the
    vectorized path — never per-row Python). The control strip runs
    BEFORE the whitespace collapse on purpose: Java's ``\\s`` includes
    vertical tab (0x0b) but RE2's does not, so stripping 0x0b first
    keeps the expression portable to RE2 engines (DuckDB oracle parity).
    Nulls pass through as nulls at every step."""
    require_columns(df, text_col)
    c: Column = F.col(text_col)
    if nfc:
        import pandas as pd  # noqa: F401  (signature type only)
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import StringType

        @pandas_udf(StringType())
        def _nfc(s):  # type: ignore[no-untyped-def]
            import unicodedata
            return s.map(lambda x: unicodedata.normalize("NFC", x)
                         if x is not None else None)
        c = _nfc(c)
    c = F.regexp_replace(c, _CONTROL_CLASS, "")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return df.withColumn(out_col, c)
