"""ContaminationMonitor — incrementally-maintained benchmark-
decontamination flags, as a downstream CDC consumer.

Contract: after replaying ANY commit sequence (inserts, updates,
deletes, replayed refreshes, cursor-expired reseeds), ``report()``
equals ``contamination_report`` recomputed from scratch on the source's
final state with the frozen benchmark.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from arlas_proc_spark.cdc.contamination_monitor import ContaminationMonitor
from arlas_proc_spark.lake.table import LakeTable
from arlas_proc_spark.operators.corpus import contamination_report

LEAKED = "what is the capital of france paris is the capital of france"
PARTIAL = "the capital of france is a lovely city to visit in spring"
CLEAN = "spark shuffles partition data across executors during wide joins"
BENCH_ROWS = [("q1", "what is the capital of france"),
              ("q2", "name the largest planet in the solar system")]


def _source(spark, tmp_path):
    schema = T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("seq", T.LongType(), True),
        T.StructField("content", T.StringType(), True)])
    return LakeTable.create(spark, str(tmp_path / "src"), schema,
                            ["repo", "path"], "seq", n_buckets=4)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, op string, repo string, path string, content string"
    ).select("repo", "path", "seq", "content", "op")


def _bench(spark):
    return spark.createDataFrame(BENCH_ROWS, "qid string, text string")


def _make(spark, tmp_path):
    src = _source(spark, tmp_path)
    mon = ContaminationMonitor(spark, str(tmp_path / "mon"), src,
                               benchmark=_bench(spark), n=3, n_buckets=4)
    return src, mon


def _recompute(spark, src):
    docs = src.read().selectExpr(
        "concat_ws('|', repo, path) AS doc_key", "content")
    return contamination_report(docs, _bench(spark), "doc_key",
                                "content", 3, bench_text_col="text")


def _flags(df):
    return {(r.doc_key, r.n_shingles, r.n_contaminated, r.contamination)
            for r in df.collect()}


def test_tracks_source_and_converges(spark, tmp_path):
    src, mon = _make(spark, tmp_path)
    src.merge_batch(_batch(spark, [
        (1, "insert", "r1", "a.py", LEAKED),
        (2, "insert", "r1", "b.py", PARTIAL),
        (3, "insert", "r2", "c.py", CLEAN)]), 0)
    out = mon.refresh()
    assert not out.get("reseeded")
    assert _flags(mon.report()) == _flags(_recompute(spark, src))
    # the leaked doc really scores high, the clean one zero
    rows = {r.doc_key: r.contamination for r in mon.report().collect()}
    assert rows["r1|a.py"] > 0.5
    assert rows["r2|c.py"] == 0.0
    # update one doc to clean text, delete another, insert a new leak
    src.merge_batch(_batch(spark, [
        (10, "update", "r1", "a.py", CLEAN + " now scrubbed"),
        (11, "delete", "r1", "b.py", None),
        (12, "insert", "r3", "d.py", LEAKED + " again")]), 1)
    mon.refresh()
    assert _flags(mon.report()) == _flags(_recompute(spark, src))
    assert "r1|b.py" not in {r.doc_key for r in mon.report().collect()}
    # idle refresh skips; replaying the same window is a ledgered no-op
    v = mon.flags.snapshot()["version"]
    assert mon.refresh()["skipped"]
    assert mon.flags.snapshot()["version"] == v


def test_flagged_threshold_and_reopen(spark, tmp_path):
    src, mon = _make(spark, tmp_path)
    src.merge_batch(_batch(spark, [
        (1, "insert", "r1", "a.py", LEAKED),
        (2, "insert", "r2", "c.py", CLEAN)]), 0)
    mon.refresh()
    assert {r.doc_key for r in mon.flagged(0.5).collect()} == {"r1|a.py"}
    # reopening from disk (no benchmark= needed) resumes cursor + params
    mon2 = ContaminationMonitor(spark, str(tmp_path / "mon"), src)
    assert mon2.n == 3
    assert mon2.refresh()["skipped"]
    assert _flags(mon2.report()) == _flags(_recompute(spark, src))


def test_first_construction_requires_benchmark(spark, tmp_path):
    src = _source(spark, tmp_path)
    with pytest.raises(ValueError, match="benchmark"):
        ContaminationMonitor(spark, str(tmp_path / "mon"), src)


def test_reseeds_when_cursor_snapshot_expired(spark, tmp_path):
    src, mon = _make(spark, tmp_path)
    src.merge_batch(_batch(spark, [
        (1, "insert", "r1", "a.py", LEAKED),
        (2, "insert", "r2", "c.py", CLEAN)]), 0)
    mon.refresh()
    # miss a window (incl. a delete) longer than the source's retention
    src.merge_batch(_batch(spark, [
        (10, "delete", "r1", "a.py", None),
        (11, "insert", "r3", "d.py", PARTIAL)]), 1)
    src.merge_batch(_batch(spark, [
        (12, "insert", "r4", "e.py", LEAKED)]), 2)
    src.expire_snapshots(keep_last=1, orphan_grace_s=0)
    out = mon.refresh()
    assert out["reseeded"]
    assert _flags(mon.report()) == _flags(_recompute(spark, src))
    assert "r1|a.py" not in {r.doc_key for r in mon.report().collect()}
    assert mon.refresh()["skipped"]  # caught up


def test_rides_streaming_ingest(spark, tmp_path):
    """views=[...] hook: flags refresh after every committed micro-batch
    and end equal to the from-scratch report on the final table."""
    from arlas_proc_spark.cdc.engine import EVENT_SCHEMA
    from arlas_proc_spark.streaming.ingest import StreamingIngest
    wal = str(tmp_path / "wal")
    rows = [
        (1, "insert", "r1", "a.py", "c1", 1000, "py", LEAKED),
        (2, "insert", "r2", "c.py", "c2", 1001, "py", CLEAN),
        (3, "update", "r1", "a.py", "c3", 1002, "py", CLEAN + " scrubbed"),
        (4, "insert", "r3", "d.py", "c4", 1003, "py", PARTIAL),
    ]
    for i in range(0, len(rows), 2):
        spark.createDataFrame(rows[i:i + 2], EVENT_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(wal)
    ing = StreamingIngest(spark, str(tmp_path / "tbl"), n_buckets=4)
    mon = ContaminationMonitor(spark, str(tmp_path / "mon"),
                               ing.engine.table,
                               benchmark=_bench(spark), n=3, n_buckets=4)
    ing.views.append(mon)
    ing.run_to_completion(wal, str(tmp_path / "ckpt"),
                          max_files_per_trigger=1)
    assert mon.cursor() == ing.engine.table.snapshot()["version"]
    docs = ing.engine.table.read().selectExpr(
        "concat_ws('|', repo, path) AS doc_key", "content")
    want = _flags(contamination_report(docs, _bench(spark), "doc_key",
                                       "content", 3,
                                       bench_text_col="text"))
    assert _flags(mon.report()) == want
