"""Interleaved re-measure of the BENCH_r02 merge-path suspects (r2 VERDICT
What's wrong #2 / Next #2): cdc_lww_resolve (18.7s vs 4.2s in r1),
cdc_incremental_merge (206k vs 352k ev/s), cdc_mor_incremental (312k vs
495k ev/s). Those were driver single-shot numbers on a host that swings
4-6x on identical jobs; this protocol runs the three workloads
INTERLEAVED (round-robin, same session, fresh per-round batch ids) and
reports per-round walls + the min — the engine's number under the repo's
measurement rules (BENCH/BASELINE.md).

Workloads replicate bench.py exactly: 16M-event feed, 200x2000 key space,
n_buckets = cpus, 1.6M-event incremental batch on a 16M-row table.

Usage: python BENCH/remeasure_merge.py [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arlas_proc_spark.config import build_session  # noqa: E402


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_events = int(os.environ.get("BENCH_EVENTS", "16000000"))
    GEN = dict(n_repos=200, files_per_repo=2000)
    spark = build_session(app_name="remeasure-merge",
                          master=f"local[{cpus}]",
                          shuffle_partitions=cpus)
    from arlas_proc_spark.cdc.engine import CdcEngine, lww_resolve, prepare_events
    from arlas_proc_spark.sources.changefeed import changefeed_df

    tmp = tempfile.mkdtemp(prefix="remeasure_")
    walls: dict[str, list[float]] = {"lww": [], "inc": [], "mor": []}
    try:
        # warmup: compile codegen/Arrow paths (bench.py protocol)
        warm = CdcEngine(spark, f"{tmp}/warm", n_buckets=cpus,
                         collect_metrics=False)
        warm.replay(changefeed_df(spark, 200_000, parallelism=cpus, **GEN))

        feed = changefeed_df(spark, n_events, parallelism=cpus * 2, **GEN)
        cow = CdcEngine(spark, f"{tmp}/cow", n_buckets=cpus,
                        collect_metrics=False)
        cow.replay(feed)                                   # setup, untimed
        mor = CdcEngine(spark, f"{tmp}/mor", n_buckets=cpus,
                        collect_metrics=False, write_mode="mor")
        mor.replay(feed)                                   # setup, untimed

        for r in range(rounds):
            inc = changefeed_df(spark, n_events // 10, parallelism=cpus,
                                **GEN)
            inc = inc.withColumn("seq", inc.seq + n_events * (r + 1))

            t0 = time.time()
            prepare_events(lww_resolve(
                changefeed_df(spark, n_events,
                              parallelism=cpus * 2, **GEN))).count()
            walls["lww"].append(round(time.time() - t0, 3))

            t0 = time.time()
            cow.apply_batch(inc, f"inc-{r}")
            walls["inc"].append(round(time.time() - t0, 3))

            t0 = time.time()
            mor.apply_batch(inc, f"inc-{r}")
            walls["mor"].append(round(time.time() - t0, 3))
            print(json.dumps({"round": r,
                              "lww": walls["lww"][-1],
                              "inc": walls["inc"][-1],
                              "mor": walls["mor"][-1]}), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    out = {
        "protocol": f"interleaved round-robin x{rounds}, min-of-rounds, "
                    f"single session, local[{cpus}]",
        "walls": walls,
        "cdc_lww_resolve_s": min(walls["lww"]),
        "cdc_incremental_merge_s": min(walls["inc"]),
        "cdc_incremental_events_per_sec": round(
            n_events / 10 / min(walls["inc"]), 1),
        "cdc_mor_incremental_s": min(walls["mor"]),
        "cdc_mor_incremental_events_per_sec": round(
            n_events / 10 / min(walls["mor"]), 1),
        "r1_reference": {"lww_s": 4.19, "inc_ev_s": 352_000,
                         "mor_ev_s": 495_000},
        "r2_driver_singleshot": {"lww_s": 18.736, "inc_ev_s": 205_560,
                                 "mor_ev_s": 312_442},
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
