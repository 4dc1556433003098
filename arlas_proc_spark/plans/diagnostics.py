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
    # per-scan, not whole-plan: a dimension scan with no filter to push
    # ("PushedFilters: []") must not mask the fact scan's pushed filters
    n_scans = s.count("PushedFilters: [")
    n_empty = s.count("PushedFilters: []")
    return {
        "pushed_filter_scans": n_scans - n_empty,
        "empty_filter_scans": n_empty,
        "pushed_filters": (n_scans - n_empty) > 0,
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
    """Assert a scan node carries pushed filters: every given fragment
    must appear, and with no fragments at least one scan must have a
    NON-EMPTY PushedFilters list ("PushedFilters: []" alone fails)."""
    s = explain_str(df)
    if not fragments:
        if s.count("PushedFilters: [") - s.count("PushedFilters: []") < 1:
            raise AssertionError(
                f"no scan with non-empty PushedFilters in plan:\n{s[:4000]}")
        return
    for frag in fragments:
        if frag not in s:
            raise AssertionError(
                f"expected pushed filter fragment {frag!r} in plan:\n{s[:4000]}")


def assert_read_schema_excludes(df: DataFrame, *cols: str) -> None:
    """Assert column pruning: none of `cols` appear as a FIELD NAME in any
    ReadSchema. Matches `<col:` / `,col:` so a short name that is a
    substring of a kept column (id vs media_id) can't false-fail."""
    import re
    s = explain_str(df)
    for line in s.splitlines():
        if "ReadSchema" in line:
            for c in cols:
                if re.search(rf"[<,]{re.escape(c)}:", line):
                    raise AssertionError(f"column {c} not pruned: {line.strip()}")


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    s = explain_str(df)
    n = s.count("BroadcastHashJoin")
    if n < at_least:
        raise AssertionError(
            f"expected ≥{at_least} BroadcastHashJoin, found {n}:\n{s[:4000]}")
