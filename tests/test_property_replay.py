"""Property-based replay-to-convergence: ANY event log, delivered in ANY
batch split with duplicates and shuffled arrival order, converges the lake
table to the pandas-oracle final state (LWW by seq, deletes tombstoned).

Complements the deterministic-generator tests: hypothesis explores key
collisions, delete-then-stale-insert races, single-key logs, all-delete
logs, empty batches — the adversarial corners a fixed generator misses.

Reference analog: the golden-frame strategy of the reference's tests
(SURVEY §5 — independent reimplementation as the oracle), with hypothesis
supplying the fixtures instead of hand-built timeseries.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arlas_proc_spark.cdc.engine import CdcEngine

KEYS = [("r0", "a"), ("r0", "b"), ("r1", "a"), ("r1", "c"), ("r2", "x")]


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    events = []
    for seq in range(n):
        repo, path = draw(st.sampled_from(KEYS))
        op = draw(st.sampled_from(["insert", "update", "delete"]))
        content = None if op == "delete" else draw(
            st.text(alphabet="abcXYZ0,ä\n", min_size=0, max_size=8))
        events.append((seq, op, repo, path, f"c{seq}",
                       1_700_000_000 + seq, "py", content))
    # duplicate deliveries of random events (byte-identical, same seq)
    for i in draw(st.lists(st.integers(0, n - 1), max_size=5)):
        events.append(events[i])
    # arrival order is NOT seq order
    events = draw(st.permutations(events))
    # random contiguous batch split (by arrival position)
    n_batches = draw(st.integers(min_value=1, max_value=4))
    cuts = sorted(draw(st.lists(st.integers(0, len(events)),
                                min_size=n_batches - 1,
                                max_size=n_batches - 1)))
    bounds = [0, *cuts, len(events)]
    return [events[a:b] for a, b in zip(bounds, bounds[1:])]


def _oracle(batches) -> dict:
    rows = [e for b in batches for e in b]
    df = pd.DataFrame(rows, columns=["seq", "op", "repo", "path", "commit",
                                     "ts_s", "lang", "content"])
    last = (df.sort_values(["seq", "commit"])
              .groupby(["repo", "path"], as_index=False).last())
    live = last[last["op"] != "delete"]
    return {(r.repo, r.path): (int(r.seq), r.content)
            for r in live.itertuples()}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(batches=event_logs())
def test_any_log_any_split_converges(spark, tmp_path_factory, batches):
    table = str(tmp_path_factory.mktemp("prop") / "t")
    engine = CdcEngine(spark, table, n_buckets=4, collect_metrics=False)
    for i, batch in enumerate(batches):
        if not batch:
            continue
        df = spark.createDataFrame(
            batch, "seq long, op string, repo string, path string, "
                   "commit string, ts_s long, lang string, content string")
        engine.apply_batch(df, i)
    got = {(r.repo, r.path): (r.seq, r.content)
           for r in engine.state().collect()}
    assert got == _oracle(batches)
