"""Z-order (Morton) interleave sort keys for multi-column file skipping.

Lexicographic ``cluster_by`` gives tight per-file ranges on the FIRST
sort column and near-full-range stats on every later one: a filter on
the second column alone prunes nothing. Z-ordering interleaves the bit
patterns of all cluster columns, so consecutive rows stay close in
EVERY dimension — each written file covers a small hyper-rectangle and
the manifest's per-file min/max prune on any clustered column (Delta
``OPTIMIZE ZORDER BY``, Iceberg's z-order rewrite strategy).

Shape (all JVM-side, zero extra shuffle — the z-value is a SORT
EXPRESSION inside the existing task-local write sort, never a stored
column):

1. Equi-depth bins per column: one bounded deterministic sample
   (top-``sample_rows`` by ``xxhash64`` of the cluster tuple — stable
   across partitionings, unlike ``df.sample``) collected to the driver,
   split points picked at equal ranks. Equi-depth beats equi-width under
   skew: each bin holds ~the same row count, so every z-curve cell is
   equally populated and file boundaries stay balanced. Works for any
   orderable type (strings included) because binning is comparison-based.
2. Bin assignment: ``size(filter(splits, s -> s <= col))`` — a ~2^bits
   element literal-array scan per row inside whole-stage codegen.
   NULLs bin to 0 (sort first, like NULLS FIRST).
3. Morton interleave: bit j of column i lands at position ``j*k + i``
   of a 63-bit long via ``shiftleft``/``bitwiseOR`` — ``bits*k`` codegen
   terms, no UDF.

At 100 TB this runs inside maintenance rewrites (``compact`` /
``rebucket`` with ``cluster_mode='zorder'``): the sample is one
TakeOrdered job over the victim rows, the z-value itself adds no
shuffle, and pruning pays back on every subsequent multi-column range
scan.

Reference analog: the reference has no multi-dimensional layout at all —
its ES sink relies on the index's own sorted segments
(``sql/WritableDataFrame.scala:83-107``); this is the lakehouse-native
equivalent for the bundled backend.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _equidepth_splits(values: list, n_bins: int) -> list:
    """Split points at equal ranks of the sorted sample — at most
    ``n_bins - 1``, strictly increasing (duplicates collapse, so a
    column dominated by one value wastes no bins on it)."""
    vals = sorted(v for v in values if v is not None)
    if not vals:
        return []
    out: list = []
    for i in range(1, n_bins):
        s = vals[min(len(vals) - 1, (i * len(vals)) // n_bins)]
        if not out or s > out[-1]:
            out.append(s)
    return out


def zorder_expr(df: DataFrame, cols: list[str], *, bits: int = 8,
                sample_rows: int = 65536) -> Column:
    """A Column computing the Morton z-value of ``cols`` for each row of
    ``df`` — pass it to a sort. Runs ONE bounded driver-side job (the
    split-point sample); the returned expression is pure codegen.

    ``bits``: bins per column = 2^bits, capped so the interleaved key
    fits 63 bits (k columns → at most 63//k bits each)."""
    if not cols:
        raise ValueError("zorder_expr needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"zorder column(s) {missing} not in "
                         f"{sorted(df.columns)}")
    k = len(cols)
    bits = max(1, min(int(bits), 63 // k))
    n_bins = 1 << bits
    # deterministic bounded sample: smallest sample_rows rows by hash of
    # the cluster tuple (TakeOrdered — no full sort, no collect of the
    # data, stable across partitionings and repeated runs)
    sample = (df.select(*[F.col(c) for c in cols])
              .orderBy(F.xxhash64(*[F.col(c) for c in cols]))
              .limit(int(sample_rows))
              .collect())
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        splits = _equidepth_splits([r[i] for r in sample], n_bins)
        if not splits:
            continue  # constant/all-null column: contributes bin 0
        arr = F.array(*[F.lit(s) for s in splits])
        bin_c = F.coalesce(
            F.size(F.filter(arr, lambda s: s <= F.col(c))),
            F.lit(0)).cast("long")
        for j in range(bits):
            z = z.bitwiseOR(F.shiftleft(
                F.shiftright(bin_c, j).bitwiseAND(F.lit(1)),
                j * k + i))
    return z
