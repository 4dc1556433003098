"""Deterministic sampling for training-data pipelines.

Why not `df.sample()`: Spark's Bernoulli sample is seeded per-PARTITION,
so the kept set changes whenever partitioning changes (repartition, AQE,
input split sizing) — a re-run of the same pipeline over the same 100 TB
yields a different corpus. These operators derive the keep decision from
the ROW's own identity via md5, so the sample is a pure function of the
data: reproducible across runs, clusters, partitionings, and engines
(the same expressions run in DuckDB/Trino for oracle parity — see
__spark_entry__.oracle_sql). Reference analog: the deterministic
id-derived routing of SURVEY §2.8's scalar layer.

All pure `pyspark.sql.functions` expressions — JVM-side, codegen'd, no
shuffle for Bernoulli, one hash-partitioned window for stratified.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arlas_proc_spark.operators.base import require_columns


def _hash_hex8(cols: list[str], salt: str) -> Column:
    """First 8 hex chars of md5(salt|col1|col2|...) — a uniform 32-bit
    draw addressed by row identity. concat_ws skips nulls, so null id
    columns still hash (identically in DuckDB)."""
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(salt), *[F.col(c) for c in cols])),
        1, 8)


def fraction_threshold_hex(fraction: float) -> str:
    """The 8-hex-digit threshold t such that P[hash8 < t] == fraction
    (up to 2^-32). Computed driver-side once so BOTH engines compare the
    same constant string — no float math in the plan."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    n = int(round(fraction * 2**32))
    # 2^32 doesn't fit 8 hex digits, and a 9-char threshold would compare
    # lexicographically WRONG against 8-char draws ("ffffffff" > "1000…");
    # "g" sorts above every hex digit, so `draw < "g"` keeps everything
    return "g" if n >= 2**32 else format(n, "08x")


def sample_bernoulli(df: DataFrame, fraction: float, id_cols: list[str],
                     salt: str = "") -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff its md5-derived
    32-bit draw falls below fraction. Same (id_cols, salt) → same sample
    on any cluster at any scale; vary ``salt`` for an independent
    resample. Narrow (no shuffle), codegen'd, filter pushes to the scan
    when id_cols are scan columns."""
    require_columns(df, *id_cols)
    thr = fraction_threshold_hex(fraction)
    if fraction >= 1.0:
        return df
    return df.where(_hash_hex8(id_cols, salt) < F.lit(thr))


def sample_stratified(df: DataFrame, strata_cols: list[str], n_per_stratum: int,
                      id_cols: list[str], salt: str = "") -> DataFrame:
    """Per-stratum deterministic quota (e.g. ≤N docs per language or per
    source domain — the standard pretraining-mix balancer): rank rows
    inside each stratum by their md5 draw (id_cols as tiebreaker) and
    keep the first N. CONTRACT: id_cols must uniquely identify rows —
    duplicate ids share both the draw and the tiebreaker, so when the
    quota cuts between two copies the kept one is engine-arbitrary
    (dedup first, or include a discriminating column in id_cols).
    One hash-partitioned
    window on the strata; skewed strata cost what any top-N-per-group
    costs — at 100 TB pre-filter with sample_bernoulli(upper bound) first
    so the window sorts a bounded candidate set, not the raw corpus."""
    require_columns(df, *strata_cols, *id_cols)
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be >= 1")
    w = (Window.partitionBy(*strata_cols)
         .orderBy(_hash_hex8(id_cols, salt),
                  *[F.col(c) for c in id_cols]))
    return (df.withColumn("_sr", F.row_number().over(w))
            .where(F.col("_sr") <= n_per_stratum).drop("_sr"))


def sample_weighted_strata(df: DataFrame, strata_col: str,
                           fractions: dict[str, float], id_cols: list[str],
                           salt: str = "",
                           default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum Bernoulli rates (the 'upsample code, downsample crawl'
    mix knob): each stratum value gets its own keep-fraction; unlisted
    strata get ``default_fraction``. Still narrow/deterministic — the
    threshold is a CASE over precomputed hex constants."""
    require_columns(df, strata_col, *id_cols)
    draw = _hash_hex8(id_cols, salt)
    expr = F.lit(fraction_threshold_hex(default_fraction))
    for val, frac in sorted(fractions.items()):
        expr = F.when(F.col(strata_col) == F.lit(val),
                      F.lit(fraction_threshold_hex(frac))).otherwise(expr)
    return df.where(draw < expr)
