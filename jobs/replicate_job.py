"""spark-submit entrypoint: keep a replica lake table in sync with a
changefeed-enabled source by tailing its emitted change files.

Cluster usage:

    spark-submit --py-files /tmp/arlas_proc_spark.zip jobs/replicate_job.py \
        --source /mnt/shared/table --replica /mnt/shared/replica \
        --checkpoint s3a://bucket/replica_ckpt --continuous

``--source``/``--replica`` are bundled-LakeTable paths: manifest commits
are POSIX file ops on the driver, so they need driver-visible local or
shared-posix paths (NFS etc.), not object-store URIs (the Iceberg
backend in lake/iceberg.py is the object-store path). ``--checkpoint``
goes through Spark and takes any configured filesystem.

The source must have been created with changefeed on
(``jobs/ingest_job.py --changefeed``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arlas_proc_spark.config import build_session  # noqa: E402
from arlas_proc_spark.lake.table import LakeTable  # noqa: E402
from arlas_proc_spark.streaming.replicate import ChangeLogReplicator  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="source lake table path")
    ap.add_argument("--replica", required=True, help="replica table path")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--buckets", type=int, default=None,
                    help="replica bucket count (default: source's)")
    ap.add_argument("--max-files-per-trigger", type=int, default=8)
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--seed", action="store_true",
                    help="(re)load the replica from a full source read "
                         "before tailing — the recovery path when the "
                         "source feed has a log-less commit "
                         "(append/overwrite); the seed version is "
                         "recorded durably in the replica")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = build_session(app_name="cdc-replicate", master=args.master)
    source = LakeTable(spark, args.source)
    seed_v = int(source.snapshot()["version"]) if args.seed else None
    rep = ChangeLogReplicator(spark, source, args.replica,
                              n_buckets=args.buckets,
                              seeded_at_version=seed_v)
    if args.seed:
        print(json.dumps({"seeded_at_version": rep.seed()}))
    if args.continuous:
        q = rep.start(args.checkpoint,
                      max_files_per_trigger=args.max_files_per_trigger,
                      available_now=False)
        q.awaitTermination()
    else:
        rep.run_to_completion(
            args.checkpoint,
            max_files_per_trigger=args.max_files_per_trigger,
            timeout_s=24 * 3600)
        print(json.dumps({"replica_rows": rep.state().count(),
                          "replica_version":
                              rep.target.snapshot()["version"]}))
    spark.stop()


if __name__ == "__main__":
    main()
