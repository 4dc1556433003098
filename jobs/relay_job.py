"""spark-submit entrypoint: stream a changefeed-enabled lake table's
change feed OUT as ordered JSONL segments of Debezium envelopes, so any
external CDC consumer (a Kafka producer shim, a search indexer, another
engine's ``StreamingIngest(wal_format='debezium')``) can tail the table
without knowing its change-file format.

Cluster usage:

    spark-submit --py-files /tmp/arlas_proc_spark.zip jobs/relay_job.py \
        --source /mnt/shared/table --out /mnt/shared/envelopes \
        --checkpoint /mnt/shared/relay_ckpt --continuous

``--source`` is a bundled-LakeTable path (driver-visible local or
shared-posix, like every jobs/ path); ``--out`` and ``--checkpoint`` go
through Spark and take any configured filesystem. Segments are
deterministic per micro-batch (``txn_<id>/``) and overwritten on
replay; the envelopes carry ``source.txid`` so downstream
compact-by-txid merges dedup redelivery end-to-end.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arlas_proc_spark.config import build_session  # noqa: E402
from arlas_proc_spark.lake.table import LakeTable  # noqa: E402
from arlas_proc_spark.streaming.consume import DebeziumStreamRelay  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="source lake table path")
    ap.add_argument("--out", required=True,
                    help="envelope segment output directory")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--max-files-per-trigger", type=int, default=8)
    ap.add_argument("--files-per-segment", type=int, default=1,
                    help="files per envelope segment (0 = keep the "
                         "drain's full write parallelism)")
    ap.add_argument("--since-version", type=int, default=-1,
                    help="skip transitions at or before this source "
                         "version (consumer seeded out-of-band; also "
                         "waives feed-gap refusal up to it)")
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = build_session(app_name="cdc-relay", master=args.master)
    relay = DebeziumStreamRelay(
        spark, LakeTable(spark, args.source), args.out,
        coalesce_segments=args.files_per_segment or None,
        since_version=args.since_version)
    if args.continuous:
        q = relay.start(args.checkpoint,
                        max_files_per_trigger=args.max_files_per_trigger,
                        available_now=False)
        q.awaitTermination()
    else:
        relay.run_to_completion(
            args.checkpoint,
            max_files_per_trigger=args.max_files_per_trigger,
            timeout_s=24 * 3600)
        print(json.dumps(
            {"segments": len(glob.glob(os.path.join(args.out, "txn_*")))}))
    spark.stop()


if __name__ == "__main__":
    main()
