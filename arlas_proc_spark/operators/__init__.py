from arlas_proc_spark.operators.base import pipeline, require_columns  # noqa: F401
