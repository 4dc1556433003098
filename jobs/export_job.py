"""spark-submit entrypoint: publish a frozen lake-table snapshot as a
plain parquet dataset — the corpus-release step.

Reads a pinned version (a tag set by maintenance_job --set-tag, or an
explicit --version; default CURRENT), optionally filtered/projected,
and writes vanilla parquet plus a _RELEASE.json sidecar (Hadoop-hidden name, so parquet readers of the dir skip it) recording the
source table, the exact snapshot version, the filters, and the row
count — enough for a consumer to audit which table state a training
corpus was built from, and for the producer to re-export byte-
equivalently while the tag lives (tags are GC-protected).

    python jobs/export_job.py --table /mnt/shared/table \
        --tag corpus-2026-08 --out /mnt/release/corpus-2026-08 \
        --columns repo,path,content --where "lang = 'en'"

The row count rides the single write action as an Observation metric —
no second scan. ``--table`` is a bundled-LakeTable path (driver-visible
posix, see maintenance_job.py); ``--out`` is any Spark-writable URI.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from arlas_proc_spark.config import build_session  # noqa: E402
from arlas_proc_spark.lake.table import LakeTable  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--tag", default=None,
                    help="export the snapshot pinned under this tag")
    ap.add_argument("--version", type=int, default=None,
                    help="export this exact snapshot version")
    ap.add_argument("--columns", default=None,
                    help="comma-separated projection (default: all)")
    ap.add_argument("--where", default=None,
                    help="SQL predicate applied to the exported rows")
    ap.add_argument("--coalesce", type=int, default=None,
                    help="cap output file count (small releases)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if args.tag is not None and args.version is not None:
        ap.error("--tag and --version are mutually exclusive")

    spark = build_session(app_name="corpus-export", master=args.master)
    t = LakeTable(spark, args.table)
    if args.tag is not None:
        tags = t.tags()
        if args.tag not in tags:
            raise SystemExit(f"tag {args.tag!r} does not exist "
                             f"(tags: {sorted(tags)})")
        # resolve the tag to a version ONCE and export that version: a
        # concurrent re-tag between two separate lookups could otherwise
        # make the sidecar record a different version than the data
        version = tags[args.tag]
        df = t.read_version(version)
    elif args.version is not None:
        version = args.version
        df = t.read_version(version)
    else:
        version = t.snapshot()["version"]
        df = t.read_version(version)
    if args.where:
        df = df.where(args.where)
    if args.columns:
        df = df.select(*[c.strip() for c in args.columns.split(",")])
    obs = Observation("export")
    df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    if args.coalesce:
        df = df.coalesce(args.coalesce)
    df.write.mode("error").parquet(args.out)  # a release is append-never

    release = {
        "source_table": os.path.abspath(args.table),
        "snapshot_version": int(version),
        "tag": args.tag,
        "where": args.where,
        "columns": (args.columns.split(",") if args.columns else None),
        "rows": obs.get["rows"],
    }
    # "_"-prefixed so Spark/Hadoop file indexes hide it from parquet
    # readers of the release dir; written through the Hadoop FileSystem
    # API so ANY Spark-writable --out URI works, not just local posix
    jpath = spark._jvm.org.apache.hadoop.fs.Path(
        os.path.join(args.out, "_RELEASE.json"))
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray(json.dumps(release, indent=2).encode()))
    finally:
        stream.close()
    print(json.dumps(release))
    spark.stop()


if __name__ == "__main__":
    main()
