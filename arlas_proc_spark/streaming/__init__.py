from arlas_proc_spark.streaming.consume import (  # noqa: F401
    ChangeFeedConsumer, DebeziumStreamRelay)
from arlas_proc_spark.streaming.ingest import StreamingIngest  # noqa: F401
from arlas_proc_spark.streaming.replicate import ChangeLogReplicator  # noqa: F401
