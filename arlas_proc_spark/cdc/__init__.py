from arlas_proc_spark.cdc.engine import (  # noqa: F401
    EVENT_SCHEMA,
    CdcEngine,
    lww_compact,
    lww_resolve,
    prepare_events,
)
from arlas_proc_spark.cdc.ann_index import (  # noqa: F401
    AnnIndex,
    AnnIndexRefresher,
)
from arlas_proc_spark.cdc.contamination_monitor import (  # noqa: F401
    ContaminationMonitor,
)
from arlas_proc_spark.cdc.dedup_index import (  # noqa: F401
    DedupIndex,
    DedupIndexRefresher,
)
from arlas_proc_spark.cdc.salting import salted_agg, with_salt  # noqa: F401
