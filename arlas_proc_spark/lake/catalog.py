"""Catalog — atomic multi-table visibility over LakeTables.

Why it exists: a CDC pipeline rarely ends at one table. The source
table, its incrementally-maintained views (lake/ivm.py), its dedup
index (cdc/dedup_index.py), and its contamination flags each commit
independently — so a reader joining two of them can observe one at
version N and the other at N-1: a torn read. Iceberg solves this with
multi-table transactions at the REST catalog; this module is that shape
over the same posix primitives LakeTable already uses.

Design (deliberately NOT two-phase commit):

- The catalog is one tiny JSON pointer set — ``{name: {path, version}}``
  — committed with the identical O_EXCL-create + fsync + rename-swap CAS
  as a table snapshot. Readers that resolve tables THROUGH the catalog
  (``read(name)``) get the pinned versions via the table's own
  time-travel read path, so one catalog state = one consistent cross-
  table snapshot, and catalog history = consistent cross-table TIME
  TRAVEL (``read(name, catalog_version=M)``).
- A multi-table transaction is: commit each table normally (their own
  exactly-once ledgers make replays no-ops), then ONE catalog CAS flips
  every pin together. The catalog flip is the only commit point a
  catalog reader can observe, so a crash anywhere before it leaves
  readers on the old consistent set — some tables' CURRENT may already
  be ahead, which is invisible through the catalog and converges when
  the transaction replays (committed batch ids no-op, the flip lands).
- ``commit(txn_id, ...)`` carries its own ledger so a replayed
  transaction's flip is also a no-op — exactly-once end to end without
  coordinator state, prepare files, or recovery scans.

The trade vs real 2PC: table CURRENT can transiently run ahead of the
catalog (direct-path readers see it early). That is Iceberg's trade
too — the catalog is the consistency boundary; bypassing it forfeits
the guarantee. At 100 TB the catalog object stays O(tables), never
O(files): versions are integers, all file-level state lives in the
tables' own sharded manifests.

Reference analog: the reference writes each ES index independently with
no cross-index atomicity at all (``sql/WritableDataFrame.scala:83-107``)
— a multi-sink pipeline there can always be observed torn.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession

from arlas_proc_spark.lake.cas import DEFAULT_CAS, CasConflict, CommitCAS
from arlas_proc_spark.lake.table import ConcurrentCommitError, LakeTable

_LEDGER_KEEP = 256


class Catalog:
    """See module docstring. All mutating calls are CAS commits; callers
    hitting ``ConcurrentCommitError`` re-read and retry (same contract
    as ``LakeTable``). The commit primitive is the injectable
    ``CommitCAS`` seam (lake/cas.py) — same as the tables'."""

    def __init__(self, spark: SparkSession, path: str,
                 cas: CommitCAS | None = None):
        self.spark = spark
        self.path = path
        self.meta_dir = os.path.join(path, "meta")
        self.cas = cas if cas is not None else DEFAULT_CAS

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def create(cls, spark: SparkSession, path: str,
               cas: CommitCAS | None = None) -> "Catalog":
        c = cls(spark, path, cas=cas)
        os.makedirs(c.meta_dir, exist_ok=True)
        c._commit({"version": 0, "tables": {},
                   "ledger": {"recent": []}}, expected_version=None)
        return c

    @classmethod
    def exists(cls, spark: SparkSession, path: str) -> bool:
        return os.path.exists(os.path.join(path, "meta", "CURRENT"))

    # ------------------------------------------------------------- snapshot
    def _current_name(self) -> str:
        return self.cas.read_pointer(os.path.join(self.meta_dir, "CURRENT"))

    def snapshot(self) -> dict:
        with open(os.path.join(self.meta_dir, self._current_name())) as f:
            return json.load(f)

    def snapshot_at(self, version: int) -> dict:
        target = os.path.join(self.meta_dir, f"c{version:010d}.json")
        if not os.path.exists(target):
            raise ValueError(f"catalog version {version} does not exist")
        with open(target) as f:
            return json.load(f)

    def _commit(self, snap: dict, expected_version: int | None) -> None:
        """The LakeTable snapshot CAS, verbatim semantics: O_EXCL create
        of the fsynced version file serializes same-version writers, the
        expected-version check catches a CURRENT that moved underneath,
        and the rename swap + directory fsync make the flip atomic and
        power-loss durable."""
        name = f"c{snap['version']:010d}.json"
        target = os.path.join(self.meta_dir, name)
        try:
            self.cas.create_exclusive(target, json.dumps(snap))
        except CasConflict:
            raise ConcurrentCommitError(
                f"catalog snapshot {name} already exists: another writer "
                f"committed this version; re-read and retry") from None
        try:
            self.cas.swing_pointer(
                os.path.join(self.meta_dir, "CURRENT"), name,
                expected=(f"c{expected_version:010d}.json"
                          if expected_version is not None else None))
        except CasConflict as e:
            self.cas.remove(target)
            raise ConcurrentCommitError(
                f"expected CURRENT=c{expected_version}, found {e.found}: "
                f"another writer committed; re-read and retry") from None

    # ------------------------------------------------------------- registry
    def register(self, name: str, table_path: str,
                 version: int | None = None) -> dict:
        """Pin ``name`` to a table (at its current version unless given).
        Registering an existing name re-pins it (path changes allowed —
        that is how a rebuilt/cloned table swaps in atomically)."""
        t = LakeTable(self.spark, table_path)
        v = int(t.snapshot()["version"]) if version is None else int(version)
        snap = self.snapshot()
        snap["tables"][name] = {"path": table_path, "version": v}
        prev, snap["version"] = snap["version"], snap["version"] + 1
        self._commit(snap, expected_version=prev)
        return {"name": name, "version": v,
                "catalog_version": snap["version"]}

    def drop(self, name: str) -> dict:
        snap = self.snapshot()
        if name not in snap["tables"]:
            raise ValueError(f"no table {name!r} in catalog "
                             f"(have {sorted(snap['tables'])})")
        del snap["tables"][name]
        prev, snap["version"] = snap["version"], snap["version"] + 1
        self._commit(snap, expected_version=prev)
        return {"dropped": name, "catalog_version": snap["version"]}

    def tables(self) -> dict[str, dict]:
        return dict(self.snapshot()["tables"])

    # ---------------------------------------------------------------- reads
    def table(self, name: str,
              catalog_version: int | None = None) -> tuple[LakeTable, int]:
        """(LakeTable handle, pinned table version) as of the catalog's
        CURRENT — or of an older catalog version: one integer addresses a
        CONSISTENT set of table versions, which is what makes cross-table
        time travel mean something."""
        snap = (self.snapshot() if catalog_version is None
                else self.snapshot_at(catalog_version))
        if name not in snap["tables"]:
            raise ValueError(f"no table {name!r} in catalog "
                             f"(have {sorted(snap['tables'])})")
        ent = snap["tables"][name]
        return LakeTable(self.spark, ent["path"]), int(ent["version"])

    def read(self, name: str, catalog_version: int | None = None,
             **kwargs) -> DataFrame:
        """The pinned snapshot of ``name`` — the table's own pruned
        time-travel read path (manifest min/max skipping included via
        ``filters=``), never the possibly-ahead table CURRENT."""
        t, v = self.table(name, catalog_version)
        return t.read_version(v, **kwargs)

    # --------------------------------------------------------- GC protection
    def protect_pins(self) -> dict:
        """Tag every pinned table version so ``expire_snapshots`` cannot
        GC a snapshot the catalog still points readers at (a table's
        retention window knows nothing about catalog lag). One
        version-qualified tag per table, named for this catalog; re-runs
        MOVE the tag to the current pin (the previously-protected
        snapshot becomes expirable again). Call it after ``commit`` at
        whatever cadence maintenance runs — protection lag only matters
        if retention is tighter than the maintenance interval. Tables
        whose pin already carries the tag are skipped (no empty
        commits)."""
        cat_id = hashlib.sha256(
            os.path.abspath(self.path).encode()).hexdigest()[:12]
        moved: dict[str, int] = {}
        for name, ent in sorted(self.snapshot()["tables"].items()):
            t = LakeTable(self.spark, ent["path"])
            tag = f"_catalog_{cat_id}_{name}"
            v = int(ent["version"])
            if t.tags().get(tag) != v:
                t.set_tag(tag, v)
                moved[name] = v
        return {"protected": moved}

    # ----------------------------------------------------------- multi-flip
    def commit(self, txn_id: str,
               versions: dict[str, int] | None = None) -> dict:
        """Atomically advance the pins of several tables in ONE catalog
        CAS — the commit point of a multi-table transaction whose table
        writes already landed (their own batch ledgers make a replayed
        transaction's merges no-ops; this makes its flip a no-op too).

        ``versions``: {name: table_version} to pin; None pins every
        registered table at its current CURRENT (the common "publish
        everything I just wrote" case). Pins never move BACKWARD — a
        replayed old transaction must not roll a pin back under readers;
        stale entries are simply kept at their newer value.
        """
        txn_id = str(txn_id)
        snap = self.snapshot()
        led = snap["ledger"]["recent"]
        if txn_id in led:
            return {"skipped": True, "txn_id": txn_id,
                    "catalog_version": snap["version"]}
        names = sorted(versions) if versions is not None \
            else sorted(snap["tables"])
        missing = [n for n in names if n not in snap["tables"]]
        if missing:
            raise ValueError(f"commit: unregistered tables {missing}")
        changed = False
        for n in names:
            ent = snap["tables"][n]
            v = (int(versions[n]) if versions is not None
                 else int(LakeTable(self.spark,
                                    ent["path"]).snapshot()["version"]))
            if v > int(ent["version"]):
                ent["version"] = v
                changed = True
        led.append(txn_id)
        del led[:-_LEDGER_KEEP]
        prev, snap["version"] = snap["version"], snap["version"] + 1
        self._commit(snap, expected_version=prev)
        return {"skipped": False, "txn_id": txn_id, "changed": changed,
                "catalog_version": snap["version"]}
