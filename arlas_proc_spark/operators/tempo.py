"""Tempo layer: emission-tempo detection, proportions, main-tempo vote.

Reference analogs:
- ``WithTempo`` (ml/WithTempo.scala:40-61): HMM over fragment duration
  detects the emitter's tempo class; null predictions fall back to the
  irregular tempo label.
- ``WithSupportValues`` (ml/WithSupportValues.scala:40-85): long
  fragments duplicate their value into "support points" so the HMM
  weighs them properly. The reference row-maps with a RowEncoder — the
  expression form here is a single ``array_repeat`` (codegen, no
  serialization escape).
- ``WithTempoProportions`` (features/WithTempoProportions.scala:20-55):
  per-fragment 0/1 indicator column per tempo value.
- ``FragmentSummaryTransformer.getMainTempo``
  (fragments/FragmentSummaryTransformer.scala:343-364): after
  aggregation the proportions become duration-weighted means; the main
  tempo is the value of the greatest REGULAR proportion, or the
  irregular label when every regular proportion is zero. Ties resolve
  to the first column in the map's order (the reference's recursive
  ``when`` chain does the same).

Multi-model composition: run ``with_tempo`` once per model (distinct
label sets), union the proportion maps, and let the greatest-proportion
vote pick the dominant tempo across ALL models — the reference's
multi-model tempo pipeline (SURVEY §2, VERDICT r01 Missing #2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arlas_proc_spark.operators.base import require_columns
from arlas_proc_spark.operators.hmm import with_hmm_states, with_hmm_states_multi

IRREGULAR_TEMPO = "tempo_irregular"


def with_support_values(df: DataFrame, support_col: str, duration_col: str,
                        out_col: str = "supported_values",
                        delta_time: int = 120,
                        max_number_in_gap: int = 10) -> DataFrame:
    """Duplicate a fragment's value into an array of support points when
    its duration is long (> delta_time × max_number_in_gap): n = min(
    max_number_in_gap, duration // delta_time) copies; otherwise one.
    Pure expression (array_repeat) — the reference's RowEncoder map
    (ml/WithSupportValues.scala:44-63) re-expressed in codegen."""
    require_columns(df, support_col, duration_col)
    n = F.when(
        F.col(duration_col) > delta_time * max_number_in_gap,
        F.least(F.lit(max_number_in_gap),
                F.floor(F.col(duration_col) / delta_time)).cast("int")
    ).otherwise(F.lit(1))
    return df.withColumn(out_col, F.array_repeat(F.col(support_col), n))


def with_tempo(df: DataFrame, id_col: str, ts_col: str, duration_col: str,
               model: dict | str, out_col: str = "tempo",
               chunk_size: int = 5000,
               irregular: str = IRREGULAR_TEMPO) -> DataFrame:
    """HMM tempo decode over the duration series; null/Unknown
    predictions become the irregular tempo (ml/WithTempo.scala:56-60)."""
    decoded = with_hmm_states(df, id_col, ts_col, duration_col,
                              model=model, chunk_size=chunk_size,
                              out_col=out_col)
    return decoded.withColumn(
        out_col,
        F.when(F.col(out_col).isNull() |
               (F.col(out_col) == "Unknown"), F.lit(irregular))
        .otherwise(F.col(out_col)))


def with_tempo_multi(df: DataFrame, id_col: str, ts_col: str,
                     duration_col: str, models: dict[str, dict | str],
                     chunk_size: int = 5000,
                     irregular: str = IRREGULAR_TEMPO) -> DataFrame:
    """All tempo models decoded in ONE applyInPandas pass (one sort, one
    Arrow round-trip — see with_hmm_states_multi); identical semantics
    to chaining ``with_tempo`` once per model."""
    decoded = with_hmm_states_multi(df, id_col, ts_col, duration_col,
                                    models, chunk_size=chunk_size)
    for out_col in models:
        decoded = decoded.withColumn(
            out_col,
            F.when(F.col(out_col).isNull() |
                   (F.col(out_col) == "Unknown"), F.lit(irregular))
            .otherwise(F.col(out_col)))
    return decoded


def with_tempo_proportions(df: DataFrame, tempo_col: str,
                           proportion_map: dict[str, str],
                           is_multi_col: str = "is_tempo_multi") -> DataFrame:
    """One 0.0/1.0 indicator column per tempo value (initial fragments
    carry exactly one tempo, so is_multi is False); ``proportion_map``
    maps proportion column name → tempo value."""
    require_columns(df, tempo_col)
    out = df
    for col_name, tempo_value in proportion_map.items():
        out = out.withColumn(
            col_name,
            F.when(F.col(tempo_col) == tempo_value, F.lit(1.0))
            .otherwise(F.lit(0.0)))
    return out.withColumn(is_multi_col, F.lit(False))


def main_tempo_col(proportion_map: dict[str, str],
                   irregular: str = IRREGULAR_TEMPO) -> Column:
    """The tempo value whose (aggregated) proportion column is the
    greatest among REGULAR tempos; irregular when they are all zero.
    First-in-map wins ties, mirroring the reference's recursive when
    chain (FragmentSummaryTransformer.scala:343-364)."""
    regular = {c: v for c, v in proportion_map.items() if v != irregular}
    cols = [F.col(c) for c in regular]
    if not cols:
        return F.lit(irregular)
    greatest = F.greatest(*cols) if len(cols) > 1 else cols[0]
    expr: Column = F.lit(irregular)
    for col_name, tempo_value in reversed(list(regular.items())):
        expr = F.when((greatest != 0.0) & (greatest == F.col(col_name)),
                      F.lit(tempo_value)).otherwise(expr)
    return expr


def tempo_fragment_summary(df: DataFrame, key_cols: list[str],
                           duration_col: str,
                           proportion_map: dict[str, str],
                           irregular: str = IRREGULAR_TEMPO,
                           main_col: str = "main_tempo",
                           is_multi_col: str = "is_tempo_multi",
                           round_to: int = 6) -> DataFrame:
    """Aggregate per-fragment tempo proportions to one row per key:
    duration-weighted mean per proportion column, a multi-tempo flag
    (more than one non-zero proportion), and the greatest-proportion
    main tempo."""
    require_columns(df, *key_cols, duration_col, *proportion_map)
    w = F.col(duration_col).cast("double")
    aggs = [F.round(F.sum(F.col(c) * w) / F.sum(w), round_to).alias(c)
            for c in proportion_map]
    out = df.groupBy(*key_cols).agg(*aggs)
    n_nonzero = None
    for c in proportion_map:
        term = F.when(F.col(c) > 0.0, 1).otherwise(0)
        n_nonzero = term if n_nonzero is None else n_nonzero + term
    return (out.withColumn(is_multi_col, n_nonzero > 1)
            .withColumn(main_col, main_tempo_col(proportion_map, irregular)))
