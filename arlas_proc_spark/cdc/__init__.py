from arlas_proc_spark.cdc.engine import CdcEngine, EVENT_SCHEMA, prepare_events  # noqa: F401
from arlas_proc_spark.cdc.salting import salted_agg, with_salt  # noqa: F401
