"""spark-submit entrypoint: maintain benchmark-contamination flags
against a keyed lake table's change feed and (optionally) export the
current quarantine list.

First run freezes the benchmark (``--benchmark`` parquet of eval items)
into the monitor's hash set; later runs need no benchmark and fold every
source commit past the cursor (net snapshot diff), exactly-once — the
cursor commits atomically with the flags merge, so a crashed run replays
safely, and a cursor older than the source's snapshot retention reseeds
from current state instead of failing:

    spark-submit --py-files /tmp/arlas_proc_spark.zip jobs/contamination_job.py \\
        --table /mnt/shared/table --monitor /mnt/shared/contam \\
        --benchmark /mnt/shared/eval_suite.parquet --bench-text-col question \\
        --flagged-out /mnt/shared/quarantine --threshold 0.2

``--table``/``--monitor`` are bundled-LakeTable paths: manifest commits
are POSIX file ops on the driver, so they need driver-visible local or
shared-posix paths (NFS etc.), not object-store URIs (use the Iceberg
backend in lake/iceberg.py for catalog/object-store tables).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arlas_proc_spark.cdc.contamination_monitor import (  # noqa: E402
    ContaminationMonitor,
)
from arlas_proc_spark.config import build_session  # noqa: E402
from arlas_proc_spark.lake.table import LakeTable  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True,
                    help="source lake table whose change feed to fold")
    ap.add_argument("--monitor", required=True,
                    help="monitor root (created on first run)")
    ap.add_argument("--benchmark", default=None,
                    help="parquet of eval items — REQUIRED on the first "
                         "run, ignored afterwards (the hash set is "
                         "frozen at creation)")
    ap.add_argument("--bench-text-col", default="text")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--id-expr", default=None,
                    help="SQL expression forming the doc id from source "
                         "columns (default: concat_ws('|', <key cols>))")
    ap.add_argument("--shingle", type=int, default=3,
                    help="word-n-gram shingle width (first run only)")
    ap.add_argument("--n-buckets", type=int, default=8,
                    help="flags table bucket count (first run only)")
    ap.add_argument("--flagged-out", default=None,
                    help="write docs with contamination >= --threshold "
                         "as parquet here (the training-set quarantine)")
    ap.add_argument("--threshold", type=float, default=0.2)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = build_session(app_name="cdc-contamination", master=args.master)
    src = LakeTable(spark, args.table)
    bench = (spark.read.parquet(args.benchmark)
             if args.benchmark else None)
    mon = ContaminationMonitor(spark, args.monitor, src,
                               benchmark=bench,
                               bench_text_col=args.bench_text_col,
                               text_col=args.text_col,
                               id_expr=args.id_expr,
                               n=args.shingle, n_buckets=args.n_buckets)
    report: dict = {"table": args.table, "monitor": args.monitor,
                    "cursor_before": mon.cursor()}
    report["refresh"] = mon.refresh()
    report["cursor_after"] = mon.cursor()
    if args.flagged_out:
        mon.flagged(args.threshold).write.mode("overwrite") \
            .parquet(args.flagged_out)
        report["flagged_rows"] = \
            spark.read.parquet(args.flagged_out).count()
        report["flagged_out"] = args.flagged_out
        report["threshold"] = args.threshold
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
