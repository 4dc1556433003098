"""Custom stateful streaming operator: cross-batch per-key version tracking.

``latest_version_deltas`` converts the at-least-once WAL tail into a
**suppressed delta stream**: for every key ``(repo, path)`` it keeps the
highest ``(seq, commit)`` seen so far in the Structured Streaming state
store and emits a row ONLY when a micro-batch advances that version —
re-deliveries and stale events produce nothing. Downstream consumers (cache
invalidation, search indexing) then see exactly one notification per
version instead of the raw duplicate-laden feed.

This is the reference's batch LWW (SURVEY §2.6) lifted into streaming
state: the reference has no streaming layer at all (§2.9), so this is the
`applyInPandasWithState` rebuild of the idiom its keyed ES upserts imply
(``sql/WritableDataFrame.scala:83-86`` — replays converge by overwriting
the same doc id; here replays are *silenced* instead).

Scale notes:
- state per key is 2 scalars (seq + commit) — ~60 bytes; 10^9 keys ≈
  60 GB across the cluster's state stores, well within RocksDB-backed
  state at 1000 executors;
- the kernel is Arrow-batched per key-group (no per-row Python);
- ``GroupStateTimeout`` can evict keys idle past the retention horizon
  (pass ``ttl_minutes``) to bound state for hot-then-cold keys.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

DELTA_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("seq", T.LongType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("op", T.StringType(), True),
])

STATE_SCHEMA = T.StructType([
    T.StructField("seq", T.LongType(), False),
    T.StructField("commit", T.StringType(), True),
])


def latest_version_deltas(events: DataFrame, *,
                          ttl_minutes: int | None = None) -> DataFrame:
    """events (streaming, EVENT_SCHEMA-shaped) → per-key version-advance
    deltas. Output mode must be ``update``."""

    def track(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: Any) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        prev_seq, prev_commit = state.get if state.exists else (-1, "")
        best = None  # (seq, commit, op)
        for pdf in pdfs:
            i = pdf["seq"].idxmax()
            cand = (int(pdf["seq"].loc[i]), str(pdf["commit"].loc[i]),
                    str(pdf["op"].loc[i]))
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
        if best is not None and (best[0], best[1]) > (prev_seq, prev_commit or ""):
            state.update((best[0], best[1]))
            if ttl_minutes:
                state.setTimeoutDuration(ttl_minutes * 60 * 1000)
            yield pd.DataFrame({"repo": [key[0]], "path": [key[1]],
                                "seq": [best[0]], "commit": [best[1]],
                                "op": [best[2]]})
        elif ttl_minutes and state.exists:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)

    timeout = "ProcessingTimeTimeout" if ttl_minutes else "NoTimeout"
    return (events
            .groupBy("repo", "path")
            .applyInPandasWithState(
                track, DELTA_SCHEMA, STATE_SCHEMA, "update", timeout))


def latest_version_deltas_tws(events: DataFrame, *,
                              ttl_minutes: int | None = None) -> DataFrame:
    """Same contract as :func:`latest_version_deltas`, on Spark 4's
    ``transformWithStateInPandas`` (the successor stateful API): a
    ``StatefulProcessor`` with a typed ``ValueState`` instead of the
    callback-and-tuple ``GroupState``.

    Why offer both: ``transformWithState`` is where new state features land
    (native per-state TTL without hand-rolled timers, multiple named state
    variables, list/map state, state schema evolution) and it requires the
    RocksDB state-store provider — the provider a 1000-executor deployment
    runs anyway for state larger than executor heap. The legacy variant
    stays for HDFS-backed state stores. Output mode must be ``update``.

    Runtime requirement: the transformWithState Python worker talks to the
    JVM state server over a protobuf protocol, so the ``protobuf`` package
    must be importable on executors (it ships with any pip install of
    pyspark[connect]; absent in this sandbox — the gate below fails fast
    with a clear message instead of a crashed driver worker mid-query).
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package on "
            "driver and executors (its Python<->JVM state protocol); use "
            "latest_version_deltas (applyInPandasWithState) instead") from e

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    ttl_ms = ttl_minutes * 60 * 1000 if ttl_minutes else None

    class VersionTracker(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # native TTL: RocksDB evicts idle keys without timer plumbing
            self._version = handle.getValueState("version", STATE_SCHEMA,
                                                 ttl_ms)

        def handleInputRows(self, key: tuple, rows: Iterator[pd.DataFrame],
                            timerValues: Any) -> Iterator[pd.DataFrame]:
            prev = self._version.get() if self._version.exists() else None
            prev_seq, prev_commit = prev if prev else (-1, "")
            best = None  # (seq, commit, op)
            for pdf in rows:
                i = pdf["seq"].idxmax()
                cand = (int(pdf["seq"].loc[i]), str(pdf["commit"].loc[i]),
                        str(pdf["op"].loc[i]))
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
            if best is not None and \
                    (best[0], best[1]) > (prev_seq, prev_commit or ""):
                self._version.update((best[0], best[1]))
                yield pd.DataFrame({"repo": [key[0]], "path": [key[1]],
                                    "seq": [best[0]], "commit": [best[1]],
                                    "op": [best[2]]})

        def close(self) -> None:
            pass

    # transformWithState requires the RocksDB provider (the HDFS-backed
    # default store doesn't implement multiple column families). NOTE:
    # this is a SESSION-wide conf read at each query's start — every
    # streaming query started in this session afterwards also runs on
    # RocksDB. That is the provider a production deployment runs anyway;
    # restarting a pre-existing HDFS-backed checkpoint in the same session
    # would fail, so keep such restarts in their own session.
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    return (events
            .groupBy("repo", "path")
            .transformWithStateInPandas(
                statefulProcessor=VersionTracker(),
                outputStructType=DELTA_SCHEMA,
                outputMode="update",
                # state TTL is only legal in processingTime mode (Spark
                # raises STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL
                # otherwise) — mirror the legacy variant's timeout switch
                timeMode="processingTime" if ttl_minutes else "none"))
