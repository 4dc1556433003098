from __future__ import annotations

# DuckDB must instantiate (and spawn its worker-thread pool) BEFORE the
# heavy native stack (pyspark -> pandas/numpy/pyarrow) is imported: on
# this sandbox's glibc, loading those DSOs consumes the static-TLS
# surplus, and a DuckDB database created afterwards intermittently fails
# to start worker threads ("cannot allocate memory for thread-local
# data: ABORT", or a spurious OutOfMemoryException on a tiny block
# allocation). pytest imports conftest.py before any test module, so
# connecting here is the one structurally-early point. Tests share this
# instance through cursors (duck_cursor) — cursors attach to the
# already-spawned pool and never create threads; `register()` is
# connection-scoped in duckdb-python, so per-test registered frames on
# separate cursors cannot collide.
import duckdb

_DUCK = duckdb.connect()
# force the FULL worker pools into existence while TLS is still
# available — both the shared instance's and the module-global default
# one behind duckdb.sql(). The range must be big enough to engage every
# worker thread (a tiny warmup leaves threads unspawned, and a later
# heavy oracle then tries to spawn them after the heavy native stack
# has eaten the TLS surplus — the exact failure this file prevents).
_DUCK.execute("select sum(range) from range(200000000)").fetchall()
duckdb.sql("select sum(range) from range(200000000)").fetchall()

import pytest  # noqa: E402

from arlas_proc_spark.config import build_session  # noqa: E402


def duck_cursor() -> duckdb.DuckDBPyConnection:
    """A fresh cursor on the early-spawned shared DuckDB instance.

    Use this instead of ``duckdb.connect()`` anywhere inside tests —
    a brand-new instance created after pyspark/pandas are loaded can
    fail thread spawn (see module docstring above).
    """
    return _DUCK.cursor()


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="arlas_proc_spark-tests", master="local[4]",
                      shuffle_partitions=4,
                      extra_conf={"spark.driver.memory": "4g"})
    yield s
    s.stop()
