"""Conditional group summary — the reference's most intricate operator,
re-expressed Catalyst-friendly.

Reference: ``fragments/FragmentSummaryTransformer.scala:211-325`` collapses
all rows of a group that match a condition into ONE summary row while
non-matching rows pass through untouched. The reference does it with a
row-duplication ``flatMap`` + ``RowEncoder`` + suffix-window aggregation +
an ``df.rdd`` schema rebuild — two Catalyst exits that would be per-row
Python here.

The idiomatic PySpark formulation (SURVEY.md §2.7): split → groupBy.agg →
unionByName. Same semantics, pure expressions, map-side partial
aggregation for free, no plan breaks.

``summarize_groups`` is the generic engine; weighted means
(:262-289) are expressed as sum(v*w)/sum(w); derived-metric recompute
(:304) via post-agg expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arlas_proc_spark.operators.base import require_columns


def weighted_avg(value_col: str, weight_col: str) -> Column:
    """sum(v*w)/sum(w) (FragmentSummaryTransformer.scala:262-271)."""
    return (F.sum(F.col(value_col) * F.col(weight_col)) /
            F.sum(F.col(weight_col)))


def summarize_groups(
    df: DataFrame,
    group_col: str,
    condition: Column,
    aggs: dict[str, Column],
    post: dict[str, Column] | None = None,
) -> DataFrame:
    """Collapse condition-matching rows per group to one summary row;
    pass non-matching rows through unchanged.

    ``aggs``: out_col -> aggregate expression evaluated over matching rows
    of the group (caller aliases inside are ignored; the dict key names the
    column). Columns not aggregated come out null on summary rows — the
    reference nulls non-propagated columns the same way (:240-259).
    ``post``: expressions computed on summary rows after aggregation
    (derived-metric recompute, :304).
    """
    require_columns(df, group_col)
    matching = df.where(condition)
    passthrough = df.where(~F.coalesce(condition, F.lit(False)))
    summary = matching.groupBy(group_col).agg(
        *[a.alias(name) for name, a in aggs.items()])
    for name, expr in (post or {}).items():
        summary = summary.withColumn(name, expr)
    # summary rows carry only group key + aggregates; unionByName with
    # allowMissingColumns aligns the schemas (missing side reads null)
    return summary.unionByName(passthrough, allowMissingColumns=True)


def conditional_sum(value: Column, cond: Column) -> Column:
    """sum(when(cond, v).otherwise(0)) — the reference's conditional
    aggregation idiom (CourseExtractorTransformer.scala:83-105)."""
    return F.sum(F.when(cond, value).otherwise(F.lit(0)))


def proportion(value: Column, total: Column) -> Column:
    """ratio with 0-guard (CourseExtractorTransformer.scala:106-110)."""
    return F.when(total != 0, value / total)


def top1_by_count(df: DataFrame, key_col: str, value_col: str,
                  out_col: str = "mode_value") -> DataFrame:
    """Mode per key = max_by over counts (reference: groupBy count +
    row_number desc == 1, ml/HmmProcessor.scala:149-153). ``max_by`` with a
    (count, value) struct makes the tie-break deterministic (higher count,
    then lexicographically larger value) and needs no window."""
    counts = df.groupBy(key_col, value_col).count()
    return counts.groupBy(key_col).agg(
        F.max_by(value_col, F.struct(F.col("count"), F.col(value_col))).alias(out_col))


def group_span_stats(df: DataFrame, group_col: str,
                     stats: dict[str, Column]) -> DataFrame:
    """Group-spanning scalars joined back to every row — the groupBy+join
    formulation of the reference's unbounded-window first/last
    (features/WithDurationFromId.scala:41-48). Catalyst broadcast-joins the
    tiny aggregate side automatically when it fits."""
    agg = df.groupBy(group_col).agg(*[a.alias(n) for n, a in stats.items()])
    return df.join(agg, on=group_col, how="left")
