from __future__ import annotations

import pytest

from arlas_proc_spark.config import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="arlas_proc_spark-tests", master="local[4]",
                      shuffle_partitions=4,
                      extra_conf={"spark.driver.memory": "4g"})
    yield s
    s.stop()
