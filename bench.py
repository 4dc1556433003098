"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Headline = CDC ingest: replay a deterministic change feed (generated at a
size scaled to the SF dir) through LWW resolution + vectorized hashing +
the snapshot lake MERGE, plus representative operator queries at
$SPARK_GRAFT_SF_DIR. Extra keys carry events/sec throughput.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     BENCH_EVENTS (override feed size).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from arlas_proc_spark.config import build_session  # noqa: E402


def _materialize(df) -> int:
    """Run the full plan; cheap sink (noop) would hide row count, use count
    via agg to keep one job."""
    return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    n_events = int(os.environ.get("BENCH_EVENTS", "16000000"))
    # ~400k distinct keys so the LWW/merge does real per-key work
    GEN = dict(n_repos=200, files_per_repo=2000)

    spark = build_session(app_name="arlas_proc_spark-bench",
                          master=f"local[{cpus}]",
                          shuffle_partitions=cpus)

    import __spark_entry__ as entry
    from arlas_proc_spark.cdc.engine import CdcEngine, lww_resolve, prepare_events
    from arlas_proc_spark.sources.changefeed import changefeed_df

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # --- CDC headline: full replay through the lake (MERGE + snapshot) ---
    tmp = tempfile.mkdtemp(prefix="bench_lake_")
    try:
        # warmup: a small replay compiles every codegen/JIT/Arrow-worker
        # path, so the timed runs measure sustained throughput, not JVM
        # startup (same protocol as bench_scaling.py)
        warm = CdcEngine(spark, f"{tmp}/warm", n_buckets=cpus,
                         collect_metrics=False)
        warm.replay(changefeed_df(spark, 200_000, parallelism=cpus, **GEN))

        # min of REPS runs: the sandbox host shares CPUs with external
        # load and identical jobs vary several-fold wall-to-wall; the min
        # is the engine's number, the rest is the neighbors'
        reps = int(os.environ.get("BENCH_REPS", "2"))
        feed = changefeed_df(spark, n_events, parallelism=cpus * 2, **GEN)
        best_replay, best_inc = float("inf"), float("inf")
        for r in range(reps):
            engine = CdcEngine(spark, f"{tmp}/table{r}", n_buckets=cpus,
                               collect_metrics=False)
            t0 = time.time()
            engine.replay(feed)
            best_replay = min(best_replay, time.time() - t0)

            inc = changefeed_df(spark, n_events // 10, parallelism=cpus, **GEN)
            inc = inc.withColumn("seq", inc.seq + n_events)
            t0 = time.time()
            engine.apply_batch(inc, "inc-1")
            best_inc = min(best_inc, time.time() - t0)
        timings["cdc_replay_to_lake"] = round(best_replay, 3)
        extras["cdc_replay_events_per_sec"] = round(n_events / best_replay, 1)
        extras["cdc_replay_events"] = n_events
        timings["cdc_incremental_merge"] = round(best_inc, 3)
        extras["cdc_incremental_events_per_sec"] = round(
            n_events / 10 / best_inc, 1)

        # --- merge-on-read incremental: append winners, no state join;
        #     ingest cost O(batch) regardless of table size ---
        best_mor = float("inf")
        for r in range(reps):
            mor = CdcEngine(spark, f"{tmp}/mor{r}", n_buckets=cpus,
                            collect_metrics=False, write_mode="mor")
            mor.replay(feed)
            t0 = time.time()
            mor.apply_batch(inc, "inc-1")
            best_mor = min(best_mor, time.time() - t0)
        timings["cdc_mor_incremental"] = round(best_mor, 3)
        extras["cdc_mor_incremental_events_per_sec"] = round(
            n_events / 10 / best_mor, 1)

        # --- deletion-vector incremental: append only the CHANGED rows,
        #     mask superseded (file, position) addresses — write cost
        #     O(changed rows) like mor, read stays LWW-free like cow at
        #     the price of one broadcast anti-join against the mask ---
        dvt = CdcEngine(spark, f"{tmp}/dv", n_buckets=cpus,
                        collect_metrics=False, write_mode="dv")
        dvt.replay(feed)  # untimed base (cow-shaped initial replay)
        best_dv, t_read = float("inf"), None
        for r in range(reps):
            inc_dv = changefeed_df(spark, n_events // 10,
                                   parallelism=cpus, **GEN)
            inc_dv = inc_dv.withColumn("seq",
                                       inc_dv.seq + n_events * (2 + r))
            t0 = time.time()
            dvt.apply_batch(inc_dv, f"inc-dv-{r}")
            best_dv = min(best_dv, time.time() - t0)
            t0 = time.time()
            _materialize(dvt.state())
            t_read = (time.time() - t0 if t_read is None
                      else min(t_read, time.time() - t0))
        timings["cdc_dv_incremental"] = round(best_dv, 3)
        extras["cdc_dv_incremental_events_per_sec"] = round(
            n_events / 10 / best_dv, 1)
        extras["cdc_dv_masked_read_s"] = round(t_read, 3)

        # --- dv's design point: a SPARSE batch (~1% of the key space,
        #     but its keys hash into every bucket) over the same base —
        #     cow must rewrite every touched bucket's full contents,
        #     dv writes only the changed rows + a position mask. Same
        #     base via zero-copy shallow clones, same batch. ---
        from arlas_proc_spark.lake.table import LakeTable
        sparse = changefeed_df(spark, n_events // 100, parallelism=cpus,
                               n_repos=4, files_per_repo=1000)
        sparse = sparse.withColumn("seq", sparse.seq + n_events * 8)
        t_sparse = {}
        for mode in ("cow", "dv"):
            LakeTable.shallow_clone(spark, f"{tmp}/dv",
                                    f"{tmp}/sparse_{mode}")
            eng = CdcEngine(spark, f"{tmp}/sparse_{mode}",
                            collect_metrics=False, write_mode=mode)
            t0 = time.time()
            eng.apply_batch(sparse, "sparse-1")
            t_sparse[mode] = time.time() - t0
        extras["cdc_sparse_cow_merge_s"] = round(t_sparse["cow"], 3)
        extras["cdc_sparse_dv_merge_s"] = round(t_sparse["dv"], 3)

        # --- sparse-update incremental (patch_cols): the same 10% batch
        #     with payload columns nulled on a cadence, through the
        #     event-level fold (no winners-broadcast compaction; every
        #     event crosses the Arrow sha — the cost of sparse feeds) ---
        from pyspark.sql import functions as F
        best_patch = float("inf")
        for r in range(reps):
            peng = CdcEngine(spark, f"{tmp}/table{r}", n_buckets=cpus,
                             collect_metrics=False,
                             patch_cols=["lang", "content"])
            pinc = changefeed_df(spark, n_events // 10,
                                 parallelism=cpus, **GEN)
            pinc = (pinc
                    .withColumn("lang", F.when(
                        F.col("seq") % 3 == 0,
                        F.lit(None).cast("string")).otherwise(F.col("lang")))
                    .withColumn("content", F.when(
                        F.col("seq") % 5 == 0,
                        F.lit(None).cast("string")).otherwise(F.col("content")))
                    .withColumn("seq", F.col("seq") + 2 * n_events))
            t0 = time.time()
            peng.apply_batch(pinc, "inc-patch")
            best_patch = min(best_patch, time.time() - t0)
        timings["cdc_patch_incremental"] = round(best_patch, 3)
        extras["cdc_patch_incremental_events_per_sec"] = round(
            n_events / 10 / best_patch, 1)

        # --- incremental rebucketing: migrate the replayed table to 2x
        #     the bucket count in 4 frontier steps (each step reads only
        #     its slice of old buckets; ingest-compatible maintenance) ---
        mt = peng.table
        live_rows = mt.count_rows()   # metadata-only on a cow table
        mt.begin_rebucket(cpus * 2)
        t0 = time.time()
        while not mt.migrate_buckets(max(1, cpus // 4)).get("done"):
            pass
        mig_wall = time.time() - t0
        timings["cdc_rebucket_migration"] = round(mig_wall, 3)
        extras["cdc_rebucket_rows_per_sec"] = round(live_rows / mig_wall, 1)
        extras["cdc_rebucket_rows"] = live_rows

        # --- incremental view maintenance over the merge-emitted change
        #     log: fold a micro-batch into a per-(repo,lang) rollup in
        #     O(delta), vs the alternative a consumer without IVM runs
        #     per batch — full recompute + full rollup rewrite, O(table).
        #     Wider key space (≈4M keys) so the table side is visible;
        #     the increment is a 1% micro-batch. ---
        from arlas_proc_spark.lake.ivm import IncrementalAggView
        GEN_CDF = dict(n_repos=2000, files_per_repo=2000)
        n_cdf = n_events // 4  # setup cost only; refresh is flat in table size
        cdf = CdcEngine(spark, f"{tmp}/cdf", n_buckets=cpus,
                        collect_metrics=False, changefeed=True)
        cdf.replay(changefeed_df(spark, n_cdf, parallelism=cpus * 2,
                                 **GEN_CDF))
        view = IncrementalAggView(spark, f"{tmp}/view", cdf.table,
                                  ["repo", "lang"],
                                  {"sum_len": "length(content)"},
                                  n_buckets=cpus)
        view.refresh()  # bootstrap fold (untimed)
        n_inc = n_events // 100
        best_ivm = float("inf")
        for r in range(reps):
            inc_v = changefeed_df(spark, n_inc, parallelism=cpus, **GEN_CDF)
            inc_v = inc_v.withColumn(
                "seq", inc_v.seq + n_cdf * (2 + r))
            cdf.apply_batch(inc_v, f"ivm-inc-{r}")
            t0 = time.time()
            view.refresh()
            best_ivm = min(best_ivm, time.time() - t0)
        best_recompute = float("inf")
        for r in range(reps):
            t0 = time.time()
            (view.recompute_df().write.mode("overwrite")
             .parquet(f"{tmp}/view_naive"))
            best_recompute = min(best_recompute, time.time() - t0)
        # refresh latency is the operational number (rollup freshness lag
        # per micro-batch) and is FLAT in table size — O(delta + touched
        # groups) + ~1s of fixed job overhead. The naive recompute+rewrite
        # is O(source table); at bench SF the source scan is sub-second so
        # naive still wins locally — the crossover needs ≥10^8-row
        # sources (measured model in BENCH/BASELINE.md), which is exactly
        # the 10^10-event regime the engine targets.
        timings["cdc_ivm_refresh"] = round(best_ivm, 3)
        extras["cdc_ivm_refresh_events_per_sec"] = round(n_inc / best_ivm, 1)
        extras["cdc_ivm_recompute_rewrite_s"] = round(best_recompute, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # --- streaming WAL tail (the north-rule headline path): file-source
    #     tail → watermark dedup → foreachBatch merge, backlog-to-drain ---
    from arlas_proc_spark.sources.changefeed import write_changefeed_batches
    from arlas_proc_spark.streaming.ingest import StreamingIngest
    tmp2 = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        n_stream = n_events // 8
        # 8 single-file segments: the drain's file-source scan gets 8-way
        # decode parallelism (4 segments left the 2M-row scan on 4 tasks)
        write_changefeed_batches(spark, f"{tmp2}/wal", n_stream,
                                 n_batches=8, **GEN)

        def drain(tag: str, *, mfpt: int, mode: str = "cow", **kw) -> float:
            best = float("inf")
            # the host swings 3-5x on identical jobs; drains are short, so
            # an extra rep buys a much more honest min than it costs
            for r in range(max(reps, 3)):
                ing = StreamingIngest(spark, f"{tmp2}/{tag}{r}",
                                      n_buckets=cpus, collect_metrics=False,
                                      write_mode=mode, **kw)
                t0 = time.time()
                ing.run_to_completion(f"{tmp2}/wal", f"{tmp2}/ck_{tag}{r}",
                                      max_files_per_trigger=mfpt)
                best = min(best, time.time() - t0)
            return best

        # headline: production trigger sizing — one trigger drains the whole
        # backlog (at 10^10-event scale a trigger carries 10-100M events;
        # r01's 500k-event micro-batches paid ~2-3.5s each of state-store +
        # cow-merge fixed cost, dominating the 2M drain). Interleaved
        # min-of-4 A/B: mfpt=4 5.8s vs mfpt=2 9.4s vs batch-replay floor
        # 2.9s on the same feed — the streaming machinery (offsets, state
        # store dedup, checkpoint, ledger) costs ~2.8s over raw replay.
        # state store sized to 8 partitions here too: one trigger commits
        # the store once, so the saving is a ~1s fixed cost (interleaved
        # min-of-4: 7.19s vs 8.29s default; unlike the mfpt=2 lens it is
        # NOT an every-round winner — recorded in BENCH/BASELINE.md)
        best_stream = drain("t", mfpt=8, state_partitions=8)
        timings["cdc_stream_ingest"] = round(best_stream, 3)
        extras["cdc_stream_events_per_sec"] = round(n_stream / best_stream, 1)
        extras["cdc_stream_events"] = n_stream
        # secondary lenses on the same drain: small-batch cadence (the
        # per-batch-overhead stressor, r01's headline configuration) and
        # merge-on-read (ingest O(batch) — the shape for huge tables)
        # 500k-event batches (r01's size), dedup state store sized to 8
        # partitions: at this cadence each state partition pays a fixed
        # commit (store open + delta + fsync) per micro-batch, and the
        # interleaved A/B (BENCH/remeasure_smallbatch.py, min-of-4) had
        # sp=8 beating the 32-partition default EVERY round (1.37x on
        # mins); 4 lost dedup-stage parallelism. The dominant remaining
        # cost is inherent to cow at this key density — every batch
        # touches all buckets — which is what the mor lens below answers.
        best_small = drain("s", mfpt=2, state_partitions=8)
        timings["cdc_stream_smallbatch"] = round(best_small, 3)
        extras["cdc_stream_smallbatch_events_per_sec"] = round(
            n_stream / best_small, 1)
        best_smor = drain("m", mfpt=4, mode="mor", compact_every=8)
        timings["cdc_stream_mor"] = round(best_smor, 3)
        extras["cdc_stream_mor_events_per_sec"] = round(
            n_stream / best_smor, 1)
    finally:
        shutil.rmtree(tmp2, ignore_errors=True)

    # --- pure LWW + vectorized hash (no table IO) ---
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        _materialize(prepare_events(lww_resolve(
            changefeed_df(spark, n_events, parallelism=cpus * 2))))
        best = min(best, time.time() - t0)
    timings["cdc_lww_resolve"] = round(best, 3)

    # --- representative operator queries at the SF dir ---
    qs = {**entry.queries(), **entry.extra_queries()}
    for name in ["gap_sessions", "flow_fragments", "fragment_summary",
                 "pricing_summary", "revenue_by_nation", "salted_event_stats",
                 "hampel_outliers", "text_stats", "minhash_signatures",
                 "embedding_topk", "embedding_topk_lsh", "simhash_neardups",
                 "enriched_events", "tempo_summary", "course_states",
                 "viterbi_states", "asof_enrich", "pretrain_corpus",
                 "doc_chunks", "boilerplate_chunks", "pii_scrub",
                 "contamination", "repetition_stats", "embedding_topk_q8",
                 "embedding_topk_ivf_q8", "canonical_docs",
                 "incremental_dedup_pairs", "incremental_contamination"]:
        t0 = time.time()
        _materialize(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "cdc_ingest_and_operator_suite_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        **extras,
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
