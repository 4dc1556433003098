"""spark-submit entrypoint: maintain a MinHash-LSH dedup index against a
keyed lake table's change feed and (optionally) export the current
candidate pairs.

Run on a schedule beside a continuous ingest — each run folds every
source commit past the index cursor (net snapshot diff), exactly-once
(the cursor commits atomically with the index merge, so a crashed run
replays safely):

    spark-submit --py-files /tmp/arlas_proc_spark.zip jobs/dedup_index_job.py \
        --table /mnt/shared/table --index /mnt/shared/dedup_idx \
        --text-col content --pairs-out /mnt/shared/pairs

``--table``/``--index`` are bundled-LakeTable paths: manifest commits are
POSIX file ops on the driver, so they need driver-visible local or
shared-posix paths (NFS etc.), not object-store URIs (use the Iceberg
backend in lake/iceberg.py for catalog/object-store tables).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arlas_proc_spark.cdc.dedup_index import DedupIndexRefresher  # noqa: E402
from arlas_proc_spark.config import build_session  # noqa: E402
from arlas_proc_spark.lake.table import LakeTable  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True,
                    help="source lake table whose change feed to fold")
    ap.add_argument("--index", required=True,
                    help="index root (created on first run)")
    ap.add_argument("--text-col", default="content")
    ap.add_argument("--id-expr", default=None,
                    help="SQL expression forming the doc id from source "
                         "columns (default: concat_ws('|', <key cols>))")
    ap.add_argument("--minhashes", type=int, default=8,
                    help="k minhash functions per doc (first run only; "
                         "later runs reuse the index's parameters)")
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--shingle", type=int, default=3,
                    help="word-n-gram shingle width")
    ap.add_argument("--n-buckets", type=int, default=16,
                    help="index table bucket count (first run only)")
    ap.add_argument("--pairs-out", default=None,
                    help="write the index's CURRENT candidate pairs "
                         "(id_a, id_b, n_bands_shared) as parquet here")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = build_session(app_name="cdc-dedup-index", master=args.master)
    src = LakeTable(spark, args.table)
    ref = DedupIndexRefresher(spark, args.index, src,
                              text_col=args.text_col, id_expr=args.id_expr,
                              n=args.shingle, k=args.minhashes,
                              bands=args.bands, n_buckets=args.n_buckets)
    report: dict = {"table": args.table, "index": args.index,
                    "cursor_before": ref.cursor()}
    res = ref.refresh()
    report["refresh"] = {k: v for k, v in res.items() if k != "pairs"}
    report["cursor_after"] = ref.cursor()
    if args.pairs_out:
        pairs = ref.pairs()
        pairs.write.mode("overwrite").parquet(args.pairs_out)
        report["pairs_rows"] = spark.read.parquet(args.pairs_out).count()
        report["pairs_out"] = args.pairs_out
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
