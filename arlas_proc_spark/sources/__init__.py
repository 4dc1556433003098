from arlas_proc_spark.sources.changefeed import (  # noqa: F401
    changefeed_df,
    changefeed_sql,
    final_state_sql,
    write_changefeed_batches,
)
from arlas_proc_spark.sources.readers import (  # noqa: F401
    read_csv,
    read_parquet,
    read_stream_parquet,
)
