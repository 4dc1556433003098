"""spark-submit entrypoint: tail a WAL directory into a lake table.

Cluster usage (north rule: spark-submit --py-files on multi-executor
clusters at N and 4N executors):

    cd /root/repo && zip -r /tmp/arlas_proc_spark.zip arlas_proc_spark
    spark-submit --py-files /tmp/arlas_proc_spark.zip jobs/ingest_job.py \
        --wal s3a://bucket/wal --table /mnt/shared/table \
        --checkpoint s3a://bucket/ckpt --buckets 512 --continuous

Path schemes: ``--wal`` and ``--checkpoint`` go through Spark/Hadoop and
take any configured filesystem (s3a://, hdfs://, file://). ``--table``
uses the BUNDLED LakeTable backend, whose manifest commits are plain
POSIX file ops on the driver — it needs a driver-visible local or
shared-posix path (NFS etc.), NOT an object-store URI. For an
object-store table, inject the Iceberg backend instead
(lake/iceberg.py, CdcEngine(table_io=IcebergTableIO(...)); requires the
Iceberg runtime jar + catalog on the cluster).

Local replay (the sandbox mode):

    python jobs/ingest_job.py --wal /tmp/wal --table /tmp/table \
        --checkpoint /tmp/ckpt --generate 1000000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arlas_proc_spark.config import build_session  # noqa: E402
from arlas_proc_spark.streaming.ingest import StreamingIngest  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wal", required=True, help="WAL segment directory to tail")
    ap.add_argument("--table", required=True, help="lake table path")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--watermark", default="1 hour")
    ap.add_argument("--max-files-per-trigger", type=int, default=4)
    ap.add_argument("--wal-format", default="parquet",
                    choices=["parquet", "json", "csv", "debezium"],
                    help="WAL segment encoding; 'debezium' tails raw "
                         "JSONL of standard Debezium envelopes and "
                         "decodes them in-stream (undecodable lines go "
                         "to --quarantine with a _reason)")
    ap.add_argument("--quarantine", default=None, metavar="DIR",
                    help="route WAL-contract violators (null keys; "
                         "undecodable Debezium envelopes) to this side "
                         "store instead of failing/dropping")
    ap.add_argument("--continuous", action="store_true",
                    help="keep tailing (default: process backlog then stop)")
    ap.add_argument("--write-mode", choices=["cow", "mor"], default="cow",
                    help="cow = MERGE per batch; mor = append winners, "
                         "read-time LWW, O(batch) ingest")
    ap.add_argument("--compact-every", type=int, default=None,
                    help="fold a bucket's merge-on-read generations once "
                         "it reaches this many files")
    ap.add_argument("--changefeed", action="store_true",
                    help="emit per-commit change files (CDF) for "
                         "downstream replicas / incremental views")
    ap.add_argument("--bloom-bits", type=int, default=0,
                    help="per-file bloom sidecars over the key tuple at "
                         "this many bits/key (0 = off); point lookups "
                         "then skip generations inside a bucket")
    ap.add_argument("--state-partitions", type=int, default=None,
                    help="partition count for the watermark-dedup state "
                         "store (fewer = less per-batch commit overhead "
                         "at small triggers; pinned into the checkpoint "
                         "at first start)")
    ap.add_argument("--patch-cols", default=None, metavar="COL[,COL...]",
                    help="ingest the WAL as SPARSE updates: a null value "
                         "in these payload columns means 'unchanged' and "
                         "inherits the stored value (Debezium partial "
                         "events; cow mode only — 'content' implies its "
                         "derived content_sha256)")
    ap.add_argument("--migrate-per-batch", type=int, default=None,
                    help="advance an armed incremental rebucket "
                         "(maintenance_job --begin-rebucket) by this "
                         "many old buckets after every committed "
                         "micro-batch — re-partition the live table "
                         "inside the ingest loop itself")
    ap.add_argument("--catalog", default=None, metavar="DIR",
                    help="publish through this catalog: after every "
                         "committed micro-batch, one catalog transaction "
                         "flips the pins of this pipeline's registered "
                         "entries (the ingest table + its views/indexes) "
                         "so catalog readers never see them torn; "
                         "register the tables once with catalog_job.py "
                         "--register")
    ap.add_argument("--branch", default=None, metavar="NAME",
                    help="commit every micro-batch onto this branch "
                         "(create it first with maintenance_job "
                         "--create-branch): main never moves until "
                         "maintenance_job --fast-forward publishes the "
                         "whole ingest atomically")
    ap.add_argument("--generate", type=int, default=0,
                    help="generate N synthetic events into --wal first (demo)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    patch_cols = ([c.strip() for c in args.patch_cols.split(",")]
                  if args.patch_cols else None)
    if patch_cols and args.write_mode == "mor":
        ap.error("--patch-cols requires --write-mode cow: merge-on-read "
                 "resolves whole rows at read time and cannot fold "
                 "column-level sparse updates")
    if args.write_mode == "mor" and args.changefeed:
        ap.error("--write-mode mor cannot be combined with --changefeed: "
                 "merge-on-read commits emit no change rows, so CDF "
                 "consumers (replicas, incremental views) would silently "
                 "diverge; use --write-mode cow")

    spark = build_session(app_name="cdc-ingest", master=args.master)

    if args.generate:
        n_batches = max(args.generate // 250_000, 4)
        if args.wal_format == "debezium":
            from arlas_proc_spark.sources.debezium import write_debezium_batches
            write_debezium_batches(spark, args.wal, args.generate,
                                   n_batches=n_batches, fault_mod=97)
        elif args.wal_format == "parquet":
            from arlas_proc_spark.sources.changefeed import write_changefeed_batches
            write_changefeed_batches(spark, args.wal, args.generate,
                                     n_batches=n_batches)
        else:
            ap.error("--generate only writes parquet or debezium WAL "
                     "segments; use --wal-format parquet or debezium")

    ing = StreamingIngest(spark, args.table, n_buckets=args.buckets,
                          bloom_bits_per_key=args.bloom_bits,
                          watermark=args.watermark,
                          wal_format=args.wal_format,
                          quarantine_dir=args.quarantine,
                          write_mode=args.write_mode,
                          compact_every=args.compact_every,
                          changefeed=args.changefeed,
                          state_partitions=args.state_partitions,
                          patch_cols=patch_cols,
                          migrate_per_batch=args.migrate_per_batch,
                          branch=args.branch)
    if args.catalog:
        from arlas_proc_spark.lake.catalog import Catalog
        if not Catalog.exists(spark, args.catalog):
            ap.error(f"--catalog {args.catalog} does not exist; create and "
                     f"register tables with jobs/catalog_job.py first")
        ing.catalog = Catalog(spark, args.catalog)
    if args.continuous:
        q = ing.start(args.wal, args.checkpoint,
                      max_files_per_trigger=args.max_files_per_trigger,
                      available_now=False)
        q.awaitTermination()
    else:
        ing.run_to_completion(args.wal, args.checkpoint,
                              max_files_per_trigger=args.max_files_per_trigger,
                              timeout_s=24 * 3600)
        for m in ing.engine.lineage():
            print(json.dumps(m))
        print(json.dumps({"final_rows": ing.state().count()}))
    spark.stop()


if __name__ == "__main__":
    main()
