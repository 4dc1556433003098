"""ContaminationMonitor — incrementally-maintained benchmark-
decontamination flags over a CDC'd document corpus.

The one-shot ``operators.corpus.contamination_report`` re-shingles the
ENTIRE corpus per run; at 100-TB corpus sizes that full text pass is the
dominant cost and pure waste when a batch changes 0.01% of the
documents. This monitor is the same downstream-CDC-consumer shape as
``cdc.dedup_index.DedupIndexRefresher``: it tails a keyed lake table's
change feed and keeps a flags table (doc_key → n_shingles,
n_contaminated, contamination) current, paying per refresh only

- shingle + hash-probe for the CHANGED docs (batch-sized text pass);
- one broadcast join against the benchmark's DISTINCT shingle hashes —
  eval suites are thousands of items, so the hash set broadcasts and
  the changed-docs side never shuffles before its per-doc agg;
- one keyed MERGE into the flags table (O(touched buckets)).

The benchmark hash set is computed ONCE at construction and persisted as
parquet beside the flags table, so reopening the monitor (scheduled
jobs, restarts) never re-shingles the benchmark — and the flags stay
comparable because the hash set is frozen until the caller explicitly
rebuilds the monitor directory.

Deletes retract the doc's flag row; updates re-score via LWW on the
source snapshot version; replayed refreshes are ledgered no-ops; the
cursor commits ATOMICALLY with its merge (snapshot property — no crash
window between "scored" and "cursor advanced"). When the source has
expired the snapshot at the cursor, refresh RESEEDS from current state
instead of wedging (same recovery contract as the dedup index).

Correctness contract (tests/test_contamination_monitor.py): after
replaying any commit sequence, the flags table equals
``contamination_report`` recomputed from scratch on the source's final
state.

Reference analog: the keyed idempotent sink
(``/root/reference/src/main/scala/io/arlas/data/sql/WritableDataFrame.scala:83-86``)
maintaining a derived QUALITY-GATE artifact — the monitor is itself a
CDC consumer, like the dedup index and the incremental views.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arlas_proc_spark.lake.table import LakeTable
from arlas_proc_spark.operators.corpus import (
    benchmark_shingle_hashes,
    contamination_scores,
)

FLAGS_SCHEMA = T.StructType([
    T.StructField("doc_key", T.StringType(), False),
    T.StructField("n_shingles", T.LongType(), True),
    T.StructField("n_contaminated", T.LongType(), True),
    T.StructField("contamination", T.DoubleType(), True),
    T.StructField("seq", T.LongType(), True),
])


class ContaminationMonitor:
    """Tails ``source`` (a keyed :class:`LakeTable` with a text column)
    and maintains per-doc contamination flags against a frozen benchmark
    hash set. Plugs into the streaming loop via
    ``StreamingIngest(views=[monitor])`` — ``refresh()`` after every
    committed micro-batch."""

    LEDGER_SCOPE = "contamination-monitor"
    _CURSOR_PROP = "contamination.cursor"

    def __init__(self, spark: SparkSession, path: str, source, *,
                 benchmark: DataFrame | None = None,
                 bench_text_col: str = "text",
                 text_col: str = "content",
                 id_expr: str | None = None,
                 n: int = 3, n_buckets: int = 8):
        self.spark = spark
        self.path = path
        self.source = source
        self.text_col = text_col
        key_cols = source.snapshot()["key_cols"]
        self.id_expr = id_expr or \
            "concat_ws('|', " + ", ".join(key_cols) + ")"
        self.cursor_path = os.path.join(path, "cursor.json")
        self._params_path = os.path.join(path, "params.json")
        self._bench_path = os.path.join(path, "benchmark_hashes.parquet")
        flags_path = os.path.join(path, "flags")
        if LakeTable.exists(spark, flags_path):
            with open(self._params_path) as f:
                self.n = json.load(f)["n"]
            self.flags = LakeTable(spark, flags_path)
        else:
            if benchmark is None:
                raise ValueError(
                    "first construction needs benchmark= (the eval set "
                    "to freeze into the monitor's hash set)")
            self.n = n
            os.makedirs(path, exist_ok=True)
            # freeze the benchmark's distinct shingle hashes FIRST
            # (atomic: parquet dir written before params, params before
            # the flags table — a crash leaves no openable half-monitor)
            benchmark_shingle_hashes(benchmark, bench_text_col, n) \
                .coalesce(1).write.mode("overwrite").parquet(self._bench_path)
            tmp = self._params_path + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump({"n": n}, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._params_path)
            self.flags = LakeTable.create(
                spark, flags_path, FLAGS_SCHEMA, ["doc_key"], "seq",
                n_buckets=n_buckets)

    # -------------------------------------------------------------- cursor
    def cursor(self) -> int:
        prop = int(self.flags.snapshot().get("properties", {})
                   .get(self._CURSOR_PROP, 0))
        if not os.path.exists(self.cursor_path):
            return prop
        with open(self.cursor_path) as f:
            return max(prop, int(json.load(f)["version"]))

    def _advance_cursor(self, version: int) -> None:
        tmp = os.path.join(self.path, f".cursor.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump({"version": version}, f)
        os.replace(tmp, self.cursor_path)

    def _cursor_snapshot_available(self, version: int) -> bool:
        try:
            self.source.snapshot_at(version)
            return True
        except ValueError:
            return False

    def lake_tables(self) -> list:
        """The LakeTables this consumer commits to — the streaming loop's
        catalog publisher flips their pins atomically with the source."""
        return [self.flags]

    # ------------------------------------------------------------- refresh
    def refresh(self) -> dict:
        """Score all source commits past the cursor and fold the flag
        rows into the flags table; reseed from current state when the
        cursor's snapshot has been expired (see module docstring)."""
        src_v = self.source.snapshot()["version"]
        last = self.cursor()
        if src_v <= last:
            return {"skipped": True, "source_version": last}
        reseed = not self._cursor_snapshot_available(last)
        if reseed:
            live = self.source.read().select(
                F.expr(self.id_expr).alias("doc_key"),
                F.col(self.text_col).alias("_text"))
            scored = self._score(live, src_v)
            stale = (self.flags.read().select("doc_key")
                     .join(live.select("doc_key"), "doc_key", "left_anti")
                     .select("doc_key", *self._null_metrics(),
                             F.lit("delete").alias("op")))
            batch = scored.withColumn("op", F.lit("upsert")) \
                .unionByName(stale.withColumn(
                    "seq", F.lit(src_v).cast("long")))
        else:
            ch = self.source.read_changes(last, src_v)
            keyed = ch.select(
                F.expr(self.id_expr).alias("doc_key"),
                F.col(self.text_col).alias("_text"),
                F.col("change_type"))
            ups = self._score(keyed.where(F.col("change_type") != "delete")
                              .drop("change_type"), src_v) \
                .withColumn("op", F.lit("upsert"))
            dels = (keyed.where(F.col("change_type") == "delete")
                    .select("doc_key", *self._null_metrics(),
                            F.lit("delete").alias("op"))
                    .withColumn("seq", F.lit(src_v).cast("long")))
            batch = ups.unionByName(dels)
        self.flags.merge_batch(
            batch, f"src-{src_v}", op_col="op",
            ledger_scope=self.LEDGER_SCOPE,
            set_properties={self._CURSOR_PROP: src_v})
        self._advance_cursor(src_v)
        return {"source_version": src_v, "reseeded": reseed}

    def _null_metrics(self):
        return [F.lit(None).cast("long").alias("n_shingles"),
                F.lit(None).cast("long").alias("n_contaminated"),
                F.lit(None).cast("double").alias("contamination")]

    def _score(self, docs: DataFrame, seq: int) -> DataFrame:
        """(doc_key, _text) → flag rows, seq-stamped with the source
        version the scores were observed at (the refresh's own src_v —
        never re-read, a commit may land mid-refresh)."""
        bench = self.spark.read.parquet(self._bench_path)
        return (contamination_scores(docs, bench, "doc_key", "_text",
                                     self.n)
                .withColumn("seq", F.lit(seq).cast("long")))

    # --------------------------------------------------------------- query
    def report(self) -> DataFrame:
        """Current flags — equals ``contamination_report`` of the
        source's current live state."""
        return self.flags.read().select(
            "doc_key", "n_shingles", "n_contaminated", "contamination")

    def flagged(self, threshold: float = 0.2) -> DataFrame:
        """Docs whose contamination ≥ threshold — the quarantine list a
        corpus export excludes before training."""
        return self.report().where(F.col("contamination") >= threshold)
