"""spark-submit entrypoint: lake table maintenance — compaction,
snapshot/orphan expiry, optional bucket-count evolution.

Run on a schedule beside a continuous ingest (all operations commit
atomically and tolerate a concurrent writer — compaction and rebucket
are ledgered, expiry never touches the CURRENT pointer):

    spark-submit --py-files /tmp/arlas_proc_spark.zip jobs/maintenance_job.py \
        --table /mnt/shared/table --compact-over 8 \
        --tombstone-horizon 123456789 --keep-snapshots 4

    python jobs/maintenance_job.py --table /tmp/table --rebucket 128

``--table`` is a bundled-LakeTable path: manifest commits are POSIX file
ops on the driver, so it needs a driver-visible local or shared-posix
path (NFS etc.), not an object-store URI (use the Iceberg backend in
lake/iceberg.py for catalog/object-store tables).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arlas_proc_spark.config import build_session  # noqa: E402
from arlas_proc_spark.lake.table import LakeTable  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--compact-over", type=int, default=None,
                    help="rewrite buckets holding more than this many "
                         "files (key-sorted output)")
    ap.add_argument("--tombstone-horizon", type=int, default=None,
                    help="GC delete tombstones with seq <= this (the "
                         "stream's low-watermark) during compaction")
    ap.add_argument("--keep-snapshots", type=int, default=None,
                    help="expire all but the newest K snapshots and "
                         "remove orphan data/lineage/change files")
    ap.add_argument("--expire-older-than", type=float, default=None,
                    metavar="SECONDS",
                    help="age-based retention on top of --keep-snapshots:"
                         " snapshots committed within this window are "
                         "also retained (Iceberg expire_snapshots "
                         "older_than)")
    ap.add_argument("--expire-dry-run", action="store_true",
                    help="report what snapshot expiry would remove "
                         "without deleting anything (VACUUM DRY RUN)")
    ap.add_argument("--orphan-grace", type=float, default=3600.0,
                    help="spare unreferenced files younger than this many "
                         "seconds (an in-flight writer's staged files are "
                         "unreferenced until its snapshot commits); only "
                         "use 0 when no writer can be running")
    ap.add_argument("--rebucket", type=int, default=None,
                    help="rewrite the table under this bucket count")
    ap.add_argument("--target-file-rows", type=int, default=None,
                    help="cap rows per rewritten file during compaction/"
                         "rebucket (maxRecordsPerFile; size as "
                         "target_bytes / avg_row_bytes from bucket "
                         "stats); buckets with any oversize file become "
                         "compaction victims")
    ap.add_argument("--cluster-by", default=None, metavar="COL[,COL...]",
                    help="sort rewritten buckets by these columns instead "
                         "of the key (ZORDER-style layout for range "
                         "pruning); applies to --compact-over and "
                         "--rebucket rewrites")
    ap.add_argument("--cluster-mode", default="linear",
                    choices=["linear", "zorder"],
                    help="with --cluster-by: 'linear' sorts "
                         "lexicographically (tight ranges on the first "
                         "column only), 'zorder' Morton-interleaves all "
                         "cluster columns so filters on ANY of them "
                         "prune files")
    ap.add_argument("--dv-dead-ratio", type=float, default=None,
                    metavar="RATIO",
                    help="also compact any bucket whose deletion-vector "
                         "dead-row fraction reaches RATIO — dv merges "
                         "grow masks instead of file counts, so the "
                         "file-count criterion alone never reclaims "
                         "their space (Delta PURGE / Iceberg "
                         "rewrite_position_delete_files)")
    ap.add_argument("--delete-where", default=None, metavar="SQL_PREDICATE",
                    help="tombstone every live row matching this SQL "
                         "predicate (retention / GDPR erasure), e.g. "
                         "\"ts_s < 1700000000\"; one exactly-once merge "
                         "commit, idempotent per --delete-batch-id")
    ap.add_argument("--delete-batch-id", default=None,
                    help="exactly-once id for --delete-where (required "
                         "with it; re-running the same id is a no-op)")
    ap.add_argument("--rename-column", default=None, metavar="OLD=NEW",
                    help="metadata-only column rename (Iceberg ALTER "
                         "TABLE … RENAME COLUMN): one snapshot commit, "
                         "zero data rewritten; old files project "
                         "forward at read time")
    ap.add_argument("--shallow-clone-to", default=None, metavar="DEST",
                    help="zero-copy clone of the table into DEST (one "
                         "metadata commit, no data IO); the source "
                         "snapshot is tagged so its GC keeps the "
                         "referenced files until the tag is dropped")
    ap.add_argument("--begin-rebucket", default=None, type=int,
                    metavar="N",
                    help="arm an INCREMENTAL bucket-count migration to "
                         "N buckets (metadata-only); then drive "
                         "--migrate-buckets per maintenance pass while "
                         "ingest continues — the 100-TB alternative to "
                         "--rebucket's one-shot full rewrite")
    ap.add_argument("--migrate-buckets", default=None, type=int,
                    metavar="K",
                    help="move the next K old buckets of an in-progress "
                         "incremental rebucket; the step moving the "
                         "last bucket also finalizes (flips n_buckets)")
    ap.add_argument("--drop-column", default=None, metavar="NAME",
                    help="metadata-only column drop (Iceberg ALTER "
                         "TABLE … DROP COLUMN): one snapshot commit, "
                         "zero data rewritten; old files mask the "
                         "column at read time and the next compaction "
                         "removes the bytes")
    ap.add_argument("--set-tag", default=None, metavar="NAME[=VERSION]",
                    help="pin a snapshot under a name (GC-protected "
                         "until dropped); bare NAME pins CURRENT")
    ap.add_argument("--drop-tag", default=None, metavar="NAME")
    ap.add_argument("--restore-to-version", default=None, type=int,
                    help="RESTORE the table to a retained snapshot "
                         "version (one metadata-only commit; history "
                         "preserved, undone batch ids re-appliable)")
    ap.add_argument("--restore-to-timestamp", default=None,
                    metavar="ISO_OR_EPOCH",
                    help="RESTORE to the last commit at or before this "
                         "moment (ISO-8601 or epoch seconds; naive "
                         "times are UTC)")
    ap.add_argument("--create-branch", default=None,
                    metavar="NAME[=VERSION]",
                    help="fork a named branch (Iceberg branch ref — "
                         "multi-commit write-audit-publish); bare NAME "
                         "forks at CURRENT. Writers commit with "
                         "merge_batch(branch=NAME) / ingest "
                         "--branch=NAME; CURRENT never moves until "
                         "--fast-forward")
    ap.add_argument("--fast-forward", default=None, metavar="NAME",
                    help="publish a branch onto main as ONE atomic "
                         "commit (squash); refuses if main moved past "
                         "the fork base")
    ap.add_argument("--drop-branch", default=None, metavar="NAME",
                    help="abandon a branch (its staged files become "
                         "GC-able orphans)")
    ap.add_argument("--list-branches", action="store_true",
                    help="report existing branches (parent, commits, "
                         "head version)")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if (args.delete_where is None) != (args.delete_batch_id is None):
        ap.error("--delete-where and --delete-batch-id go together: the "
                 "id is what makes the retention delete exactly-once "
                 "across reruns")

    spark = build_session(app_name="cdc-maintenance", master=args.master)
    t = LakeTable(spark, args.table)
    report: dict = {"table": args.table,
                    "version_before": t.snapshot()["version"]}
    if args.restore_to_version is not None \
            or args.restore_to_timestamp is not None:
        # restore runs FIRST: every other action in the same pass then
        # operates on the restored state, not the one being undone
        ts = args.restore_to_timestamp
        if ts is not None:
            try:
                ts = float(ts)
            except ValueError:
                pass  # ISO-8601 string: restore() parses it
        report["restore"] = t.restore(args.restore_to_version,
                                      timestamp=ts)
    if args.delete_where is not None:
        # retention runs BEFORE compaction so the same maintenance pass
        # can fold the tombstones it just wrote
        report["delete_where"] = t.delete_where(
            args.delete_where, args.delete_batch_id, commit_retries=2)
    if (args.compact_over is not None or args.target_file_rows is not None
            or args.dv_dead_ratio is not None):
        # --target-file-rows alone still compacts (its help text promises
        # oversize buckets become victims); an omitted --compact-over
        # defers to compact()'s own default rather than restating it here
        kw = dict(tombstone_horizon_seq=args.tombstone_horizon,
                  target_rows_per_file=args.target_file_rows,
                  dv_dead_ratio=args.dv_dead_ratio,
                  cluster_by=([c.strip() for c in args.cluster_by.split(",")]
                              if args.cluster_by else None),
                  cluster_mode=args.cluster_mode)
        if args.compact_over is not None:
            kw["max_files_per_bucket"] = args.compact_over
        report["compact"] = t.compact(**kw)
    if args.rebucket is not None:
        report["rebucket"] = t.rebucket(
            args.rebucket, target_rows_per_file=args.target_file_rows,
            cluster_by=([c.strip() for c in args.cluster_by.split(",")]
                        if args.cluster_by else None),
            cluster_mode=args.cluster_mode)
    if args.rename_column is not None:
        old, sep, new = args.rename_column.partition("=")
        if not sep or not old or not new:
            ap.error("--rename-column takes OLD=NEW")
        report["rename_column"] = t.rename_column(old, new)
    if args.drop_column is not None:
        report["drop_column"] = t.drop_column(args.drop_column)
    if args.shallow_clone_to is not None:
        LakeTable.shallow_clone(spark, args.table, args.shallow_clone_to)
        report["shallow_clone_to"] = args.shallow_clone_to
    if args.begin_rebucket is not None:
        report["begin_rebucket"] = t.begin_rebucket(args.begin_rebucket)
    if args.migrate_buckets is not None:
        report["migrate_buckets"] = t.migrate_buckets(
            args.migrate_buckets,
            target_rows_per_file=args.target_file_rows)
    if args.create_branch is not None:
        name, _, v = args.create_branch.partition("=")
        report["create_branch"] = t.create_branch(
            name, int(v) if v else None)
    if args.fast_forward is not None:
        report["fast_forward"] = t.fast_forward(args.fast_forward)
    if args.drop_branch is not None:
        t.drop_branch(args.drop_branch)
        report["drop_branch"] = args.drop_branch
    if args.list_branches:
        report["branches"] = t.branches()
    if args.set_tag is not None:
        name, _, v = args.set_tag.partition("=")
        report["set_tag"] = t.set_tag(name, int(v) if v else None)
    if args.drop_tag is not None:
        report["drop_tag"] = t.drop_tag(args.drop_tag)
    if args.keep_snapshots is not None \
            or args.expire_older_than is not None or args.expire_dry_run:
        # any expiry flag triggers the run — silently ignoring
        # --expire-older-than / --expire-dry-run without --keep-snapshots
        # would leave an operator believing snapshots were expired (or a
        # dry-run report produced) when nothing happened
        report["expire"] = t.expire_snapshots(
            keep_last=args.keep_snapshots
            if args.keep_snapshots is not None else 2,
            orphan_grace_s=args.orphan_grace,
            older_than_s=args.expire_older_than,
            dry_run=args.expire_dry_run)
    report["version_after"] = t.snapshot()["version"]
    stats = t.bucket_stats()
    rows = [s["rows"] for s in stats] or [0]
    report["bucket_skew"] = {
        "buckets": len(stats), "rows_total": sum(rows),
        "rows_max": max(rows),
        "rows_mean": round(sum(rows) / max(len(rows), 1), 1)}
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
