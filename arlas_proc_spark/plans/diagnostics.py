"""Physical-plan diagnostics: make 100-TB-readiness assertable.

The scale rules this engine lives by — filters reach the parquet scan,
projections prune columns, small dimensions broadcast, hot paths stay in
whole-stage codegen — are invisible in unit tests that only check values.
These helpers read the executed plan so tests (and operators) can ASSERT
the plan shape, not just the answer. Reference analog: none (the reference
trusts Catalyst blindly); this is the Spark-first discipline SURVEY §4
commits to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode)


def plan_report(df: DataFrame) -> dict:
    """Cheap structural summary of the physical plan.

    Note: under AQE the pre-execution formatted plan carries no
    ``codegen id`` annotations, so ``codegen_stages`` is only meaningful
    when the plan was built with ``spark.sql.adaptive.enabled=false``
    (see :func:`replan_without_aqe`). ``sort_aggs`` is the scale smell to
    watch: a SortAggregate means an aggregation buffer type (struct,
    string First()) fell off the hash-agg/codegen fast path and every
    group is being sorted.
    """
    s = explain_str(df)
    return {
        "pushed_filters": "PushedFilters: [" in s and "PushedFilters: []" not in s,
        "broadcast_joins": s.count("BroadcastHashJoin"),
        "sort_merge_joins": s.count("SortMergeJoin"),
        "exchanges": s.count("Exchange"),
        "codegen_stages": s.count("codegen id"),
        "hash_aggs": s.count("HashAggregate"),
        "sort_aggs": s.count("SortAggregate"),
        "python_udfs": s.count("ArrowEvalPython") + s.count("BatchEvalPython"),
    }


def replan_without_aqe(spark, build):
    """Build a DataFrame with AQE off so the static physical plan carries
    codegen annotations, then restore the session conf. ``build`` is a
    zero-arg callable returning the DataFrame."""
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = build()
        df._jdf.queryExecution().executedPlan()  # force planning under AQE-off
        return df
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the scan node carries pushed filters (all fragments present)."""
    s = explain_str(df)
    for frag in fragments or ("PushedFilters: [",):
        if frag not in s or "PushedFilters: []" in s.split(frag)[0][-40:]:
            raise AssertionError(
                f"expected pushed filter fragment {frag!r} in plan:\n{s[:4000]}")


def assert_read_schema_excludes(df: DataFrame, *cols: str) -> None:
    """Assert column pruning: none of `cols` appear in any ReadSchema."""
    s = explain_str(df)
    for line in s.splitlines():
        if "ReadSchema" in line:
            for c in cols:
                if c in line:
                    raise AssertionError(f"column {c} not pruned: {line.strip()}")


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    s = explain_str(df)
    n = s.count("BroadcastHashJoin")
    if n < at_least:
        raise AssertionError(
            f"expected ≥{at_least} BroadcastHashJoin, found {n}:\n{s[:4000]}")
