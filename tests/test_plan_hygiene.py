"""Contract-wide plan hygiene: EVERY fixture-backed contract query's
physical plan is free of the two scale-killers the engine bans —
CartesianProduct (an unbroadcast cross join is quadratic at corpus
scale; the documented brute-force ANN baselines broadcast their small
side, which plans as BroadcastNestedLoopJoin, never CartesianProduct)
and BatchEvalPython (row-at-a-time Python UDFs; every Python kernel in
the engine is Arrow-batched: ArrowEvalPython / MapInPandas /
FlatMapGroupsInPandas).

The cdc_*/stream_* queries are excluded: their callables BUILD lake
tables (real write jobs) before returning a frame, and their plans are
pinned by the dedicated shape tests (tests/test_plan_shapes.py).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

FIXTURE_QUERIES = sorted(
    name for name in {**entry.queries(), **entry.extra_queries()}
    if not name.startswith(("cdc_", "stream_")))

BANNED = ("CartesianProduct", "BatchEvalPython")


@pytest.mark.parametrize("name", FIXTURE_QUERIES)
def test_no_cartesian_or_row_python(spark, name):
    fn = {**entry.queries(), **entry.extra_queries()}[name]
    plan = fn(spark, SF)._jdf.queryExecution().executedPlan().toString()
    hits = [n for n in BANNED if n in plan]
    assert not hits, f"{name}: banned plan nodes {hits}"
