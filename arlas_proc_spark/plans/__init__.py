from arlas_proc_spark.plans.diagnostics import (  # noqa: F401
    assert_broadcast_join,
    assert_pushed_filters,
    assert_read_schema_excludes,
    explain_str,
    plan_report,
)
