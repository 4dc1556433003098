"""Scale-readiness assertions on PHYSICAL PLANS, not values: pushdown,
pruning, broadcast, codegen. These are the 100-TB guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry
from arlas_proc_spark.plans.diagnostics import (
    assert_broadcast_join,
    assert_pushed_filters,
    assert_read_schema_excludes,
    explain_str,
    plan_report,
)

SF = "/root/testdata/sf0.001"


def test_filter_pushes_to_parquet_scan(spark):
    df = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .where(F.col("l_orderkey") == 42).select("l_orderkey", "l_quantity"))
    assert_pushed_filters(df, "PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,42)]")


def test_projection_prunes_columns(spark):
    df = (spark.read.parquet(f"{SF}/lineitem.parquet")
          .select("l_orderkey", "l_quantity"))
    assert_read_schema_excludes(df, "l_extendedprice", "l_shipdate", "l_returnflag")


def test_dimension_joins_broadcast(spark):
    df = entry.q_revenue_by_nation(spark, SF)
    assert_broadcast_join(df, at_least=2)  # nation + region at minimum


def test_lww_stays_in_codegen_without_python(spark):
    """The LWW resolve path must be pure JVM and hash-based: no Python eval
    nodes, no SortAggregate (payload never sorts through an agg buffer),
    map-side partial aggregation before the shuffle, and — planned with AQE
    off so codegen ids are visible — at least one whole-stage codegen span."""
    from arlas_proc_spark.cdc.engine import lww_resolve
    from arlas_proc_spark.plans.diagnostics import replan_without_aqe
    from arlas_proc_spark.sources.changefeed import changefeed_df
    df = lww_resolve(changefeed_df(spark, 1000))
    rep = plan_report(df)
    assert rep["python_udfs"] == 0
    assert rep["sort_aggs"] == 0
    assert rep["hash_aggs"] >= 2  # partial + final argmax
    static = replan_without_aqe(
        spark, lambda: lww_resolve(changefeed_df(spark, 1000)))
    assert plan_report(static)["codegen_stages"] >= 1


def test_prepare_events_uses_arrow_not_row_python(spark):
    """The vectorized UDF contract: ArrowEvalPython (pandas batch), never
    BatchEvalPython (row-at-a-time pickle)."""
    from arlas_proc_spark.cdc.engine import prepare_events
    from arlas_proc_spark.sources.changefeed import changefeed_df
    s = explain_str(prepare_events(changefeed_df(spark, 100)))
    assert "ArrowEvalPython" in s
    assert "BatchEvalPython" not in s


def test_events_epoch_filter_pushdown(spark):
    """filter_on_period ANDs a partition predicate usable by pruning."""
    from arlas_proc_spark.operators.formatter import filter_on_period
    df = spark.read.parquet(f"{SF}/events.parquet") \
        .withColumn("es", F.unix_timestamp("ts")) \
        .withColumn("partition_day", F.date_format("ts", "yyyyMMdd").cast("int"))
    out = filter_on_period(df, "es", "partition_day", start=1704100000)
    rows = out.count()
    assert rows > 0
    assert out.where("partition_day < 20240101").count() == 0


@pytest.mark.parametrize("qname", ["pricing_summary", "salted_event_stats"])
def test_agg_queries_have_partial_aggregation(spark, qname):
    df = entry.queries()[qname](spark, SF)
    s = explain_str(df)
    # two HashAggregates per grouping (partial + final) = map-side combine
    assert s.count("HashAggregate") >= 2


def test_lww_compact_broadcasts_precomputed_winners(spark):
    """The incremental path's join-back must plan as a BroadcastHashJoin
    on the (shared, narrow) winners frame — no shuffle of the event
    payload — and keep the zero-buffer distinct out of SortAggregate."""
    from arlas_proc_spark.cdc.engine import lww_compact
    from arlas_proc_spark.sources.changefeed import changefeed_df
    events = changefeed_df(spark, 1000)
    winners = events.groupBy("repo", "path").agg(F.max("seq").alias("seq"))
    df = lww_compact(events, winners=winners)
    assert_broadcast_join(df, at_least=1)
    rep = plan_report(df)
    assert rep["sort_aggs"] == 0
    assert rep["python_udfs"] == 0


def test_lsh_queries_never_plan_cartesian(spark):
    """The LSH candidate join must hash-join on (band, sig) — a
    CartesianProduct or BroadcastNestedLoopJoin here would be the exact
    all-pairs explosion LSH exists to avoid."""
    import __spark_entry__ as e
    for name in ["embedding_topk_lsh", "embedding_neardups"]:
        plan = {**e.queries(), **e.extra_queries()}[name](spark, "/root/testdata/sf0.001") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "Join [_band" in plan or "Join [_band".replace(
            " ", "") in plan.replace(" ", ""), f"{name}: no band-key join"


def test_merge_write_is_shuffle_once(spark, tmp_path):
    """The cow merge's bucketed write must reuse the join's hash
    partitioning: exactly ONE exchange on each join input and NONE
    between the join and the write (shuffle.partitions=4 here divides
    n_buckets=4, the aligned case)."""
    from pyspark.sql import functions as F

    from arlas_proc_spark.lake.table import LakeTable
    import pyspark.sql.types as T
    schema = T.StructType([
        T.StructField("repo", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("commit", T.StringType(), True),
        T.StructField("seq", T.LongType(), True),
        T.StructField("content", T.StringType(), True)])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema,
                         ["repo", "path"], "seq", n_buckets=4)

    def batch(rows):
        return spark.createDataFrame(
            rows, "seq long, op string, repo string, path string,"
                  " commit string, content string") \
            .select("repo", "path", "commit", "seq", "content", "op")

    t.merge_batch(batch([(1, "insert", "r", "a", "c1", "v1"),
                         (2, "insert", "r", "b", "c2", "v2")]), 0)
    # incremental merge against non-empty state: bucket files written by
    # the merge == join output partitions that held rows — never more
    # than shuffle_partitions total, and a second merge REPLACES (not
    # grows) each touched bucket's list
    t.merge_batch(batch([(3, "update", "r", "a", "c3", "v3")]), 1)
    snap = t.snapshot()
    total_files = sum(len(fs) for fs in snap["buckets"].values())
    assert total_files <= 4  # == shuffle partitions cap, no spray


def test_change_log_serves_files_without_join(spark, tmp_path):
    """read_change_log over changefeed-emitted files is a pure file scan —
    no snapshot join anywhere in the plan (the diff fallback would show a
    SortMergeJoin/ShuffledHashJoin over two snapshot reads)."""
    import pyspark.sql.types as T
    from arlas_proc_spark.lake.table import LakeTable
    sch = T.StructType([T.StructField("k", T.StringType(), False),
                        T.StructField("n", T.LongType(), True),
                        T.StructField("seq", T.LongType(), True)])
    t = LakeTable.create(spark, str(tmp_path / "t"), sch, ["k"], "seq",
                         n_buckets=2, changefeed=True)

    def b(rows):
        return spark.createDataFrame(rows, "k string, n long, seq long,"
                                     " op string")
    t.merge_batch(b([("a", 1, 1, "upsert")]), 0)
    t.merge_batch(b([("a", 2, 2, "upsert"), ("b", 3, 2, "upsert")]), 1)
    plan = explain_str(t.read_change_log(0, 2))
    assert "Join" not in plan, plan
    # the diff path (no emitted log) DOES join — pin the contrast
    # (from v1, not v0: a diff against the empty bootstrap snapshot is
    # join-ELIMINATED by the LocalRelation optimization, by design)
    plan_diff = explain_str(t.read_changes(1, 2))
    assert "Join" in plan_diff


def test_lookup_pushes_key_filters_into_one_bucket_scan(spark, tmp_path):
    import pyspark.sql.types as T
    from arlas_proc_spark.lake.table import LakeTable
    sch = T.StructType([T.StructField("repo", T.StringType(), False),
                        T.StructField("path", T.StringType(), False),
                        T.StructField("seq", T.LongType(), True),
                        T.StructField("content", T.StringType(), True)])
    t = LakeTable.create(spark, str(tmp_path / "t"), sch, ["repo", "path"],
                         "seq", n_buckets=8)
    t.merge_batch(spark.createDataFrame(
        [("r1", f"f{i}.py", i, "x", "insert") for i in range(32)],
        "repo string, path string, seq long, content string, op string"), 0)
    got = t.lookup(repo="r1", path="f3.py")
    plan = explain_str(got)
    assert "PushedFilters" in plan and "EqualTo(path,f3.py)" in plan, plan
    assert len({f.rsplit("/", 1)[-1].split("-")[1]
                for f in got.inputFiles()}) == 1


def test_replicator_compaction_is_codegen_argmax(spark):
    """_compact_changes must plan as numeric HashAggregate + semi
    join-back — no SortAggregate (the struct-max anti-pattern) and no
    payload through an aggregation buffer. The join is deliberately NOT
    hint-forced to broadcast (a catch-up backlog's winner set can exceed
    the broadcast limit); AQE must still convert it to a broadcast semi
    join at runtime when the winner side is small — asserted on the
    EXECUTED plan."""
    from arlas_proc_spark.streaming.replicate import _compact_changes
    batch = spark.createDataFrame(
        [("r1", "a.py", "c1", 1, "v1", "insert", 1),
         ("r1", "a.py", "c2", 2, "v2", "update_postimage", 2),
         ("r1", "b.py", "c3", 3, "w1", "insert", 2)],
        "repo string, path string, commit string, seq long,"
        " content string, change_type string, _change_version long")
    out = _compact_changes(batch, ["repo", "path"])
    rep = plan_report(out)
    assert rep["sort_aggs"] == 0, "struct-max SortAggregate crept back in"
    got = {(r.repo, r.path): (r.seq, r.content, r.op)
           for r in out.collect()}
    assert got == {("r1", "a.py"): (2, "v2", "upsert"),
                   ("r1", "b.py"): (3, "w1", "upsert")}
    s = explain_str(out)  # post-action: AQE's finalized plan
    assert "BroadcastHashJoin" in s and "LeftSemi" in s, s
