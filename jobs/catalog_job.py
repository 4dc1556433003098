"""spark-submit entrypoint: catalog operations — register tables, flip
multi-table transactions, protect pins from table GC, inspect state.

A scheduler runs this after the per-table writers of one logical
transaction have committed (each table write is exactly-once by its own
batch ledger, so re-running a failed pipeline re-drives the writes as
no-ops and this job's flip lands once — ``--txn-id`` is the flip's own
exactly-once key):

    spark-submit --py-files /tmp/arlas_proc_spark.zip jobs/catalog_job.py \
        --catalog /mnt/shared/cat --commit-txn nightly-2026-08-19 --protect-pins

    python jobs/catalog_job.py --catalog /tmp/cat \
        --register src=/tmp/table --register stats=/tmp/stats

    python jobs/catalog_job.py --catalog /tmp/cat --show

``--catalog`` and every table path are bundled-LakeTable paths: commits
are POSIX file ops on the driver, so they need a driver-visible local
or shared-posix path (the same scope note as every jobs/ entrypoint).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arlas_proc_spark.config import build_session  # noqa: E402
from arlas_proc_spark.lake.catalog import Catalog  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--create", action="store_true",
                    help="create the catalog if it does not exist "
                         "(idempotent with --register reruns)")
    ap.add_argument("--register", action="append", default=[],
                    metavar="NAME=PATH[@VERSION]",
                    help="pin NAME to the table at PATH (its CURRENT "
                         "version unless @VERSION given); repeatable; "
                         "re-registering re-pins")
    ap.add_argument("--drop", action="append", default=[], metavar="NAME")
    ap.add_argument("--commit-txn", default=None, metavar="TXN_ID",
                    help="atomically advance every registered table's "
                         "pin to its current version in ONE catalog CAS "
                         "— the commit point of a multi-table "
                         "transaction; re-running the same id is a no-op")
    ap.add_argument("--protect-pins", action="store_true",
                    help="tag every pinned table version so table GC "
                         "(expire_snapshots) cannot remove a snapshot "
                         "the catalog still serves; re-runs move the "
                         "tags to the current pins")
    ap.add_argument("--show", action="store_true",
                    help="print the pinned table set and catalog version")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = build_session(app_name="cdc-catalog", master=args.master)
    if args.create and not Catalog.exists(spark, args.catalog):
        cat = Catalog.create(spark, args.catalog)
    else:
        cat = Catalog(spark, args.catalog)
    report: dict = {"catalog": args.catalog}
    for spec in args.register:
        name, sep, rest = spec.partition("=")
        if not sep or not name or not rest:
            ap.error("--register takes NAME=PATH[@VERSION]")
        path, vsep, ver = rest.partition("@")
        report.setdefault("registered", []).append(
            cat.register(name, path, version=int(ver) if vsep else None))
    for name in args.drop:
        report.setdefault("dropped", []).append(cat.drop(name))
    if args.commit_txn is not None:
        report["commit"] = cat.commit(args.commit_txn)
    if args.protect_pins:
        report["protect_pins"] = cat.protect_pins()
    if args.show:
        snap = cat.snapshot()
        report["version"] = snap["version"]
        report["tables"] = snap["tables"]
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
