from arlas_proc_spark.lake.schema_evolution import align_to_schema, evolve_schema  # noqa: F401
from arlas_proc_spark.lake.schema_evolution import SchemaEvolutionError  # noqa: F401
from arlas_proc_spark.lake.table import ConcurrentCommitError, LakeTable  # noqa: F401
from arlas_proc_spark.lake.ivm import IncrementalAggView  # noqa: F401
from arlas_proc_spark.lake.catalog import Catalog  # noqa: F401
from arlas_proc_spark.lake.cas import CasConflict, CommitCAS, PosixCAS  # noqa: F401
