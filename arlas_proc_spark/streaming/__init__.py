from arlas_proc_spark.streaming.ingest import StreamingIngest  # noqa: F401
