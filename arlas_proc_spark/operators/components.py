"""Connected components over candidate-pair graphs, and duplicate-cluster
resolution on top of them.

Pair detectors (minhash_lsh_pairs, simhash_near_dups, embedding LSH — see
dedup_fuzzy.py) emit EDGES; an actual dedup pass needs the transitive
closure: which documents form one duplicate cluster, and which single doc
represents it. That closure is connected components — the one genuinely
iterative algorithm in the dedup family, so it cannot be a single
DataFrame expression.

Algorithm: min-label propagation with pointer jumping (the "hash-to-min"
family of CC-in-MapReduce algorithms — Rastogi et al., "Finding Connected
Components in Map-Reduce in Logarithmic Rounds", ICDE'13). Each round
every node takes the min label over itself and its neighbors, then jumps
its label to its label's label (path doubling). Labels are node ids and
only ever decrease toward the component's min id, so the rounds-to-
converge is O(log diameter) — dedup graphs are near-cliques (diameter
2-3), so 2-3 rounds in practice; a 64-node path converges in ~6.

Scale shape per round: one shuffle of the edge list by dst (neighbor-min
aggregation) and one self-join of the label table (pointer jump) — both
keyed on node id, high-cardinality, AQE-friendly. The label table is 2
longs per node (~16 B/node: 10^9 nodes ≈ 16 GB cluster-wide — small next
to the edges). Each round materializes via localCheckpoint: iterative
plans otherwise nest one join tree per round and Catalyst re-optimizes
the whole lineage every action. Convergence is detected with sum(label),
which strictly decreases until the fixpoint (labels are non-negative and
monotonically non-increasing) — one action per round, no extra
comparison join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arlas_proc_spark.operators.base import require_columns


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", *,
                         max_iter: int = 25) -> DataFrame:
    """Components of the undirected graph given by ``edges`` (long node
    ids). Output: one row per node appearing in any edge — ``node``,
    ``component`` (the component's minimum node id; deterministic).

    Null endpoints and self-loops are dropped. Raises after ``max_iter``
    rounds without convergence (log-rounds means 25 covers graphs far
    past any real candidate-pair set; hitting it indicates a bug, not a
    big graph)."""
    require_columns(edges, src, dst)
    e = (edges.select(F.col(src).cast("long").alias("a"),
                      F.col(dst).cast("long").alias("b"))
         .where(F.col("a").isNotNull() & F.col("b").isNotNull()
                & (F.col("a") != F.col("b"))))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.localCheckpoint(eager=False)

    lab = (sym.select("a").distinct()
           .select(F.col("a").alias("node"), F.col("a").alias("label"))
           .localCheckpoint(eager=False))
    prev_sum = None
    for _ in range(max_iter):
        nbr = (sym.join(lab, sym["b"] == lab["node"])
               .groupBy("a").agg(F.min("label").alias("_nl")))
        stepped = (lab.join(nbr, lab["node"] == nbr["a"], "left")
                   .select(lab["node"],
                           F.least("label", F.coalesce("_nl", "label"))
                           .alias("label")))
        ptr = stepped.select(F.col("node").alias("_pn"),
                             F.col("label").alias("_pl"))
        jumped = (stepped.join(ptr, stepped["label"] == ptr["_pn"], "left")
                  .select(stepped["node"],
                          F.coalesce("_pl", "label").alias("label"))
                  .localCheckpoint(eager=False))
        cur = jumped.agg(F.sum("label")).collect()[0][0]
        lab = jumped
        if cur == prev_sum:
            return lab.select("node", F.col("label").alias("component"))
        prev_sum = cur
    raise RuntimeError(f"connected_components did not converge in "
                       f"{max_iter} rounds")


def dedup_clusters(pairs: DataFrame, src: str = "id_a",
                   dst: str = "id_b") -> DataFrame:
    """Resolve candidate duplicate PAIRS into clusters: every doc that
    appears in a pair gets its cluster id (min doc id of the transitive
    cluster), the cluster's size, and an is_canonical flag electing the
    min-id doc as the cluster's keeper. Downstream dedup = anti-join the
    corpus against ``WHERE NOT is_canonical``.

    Min-id election is deterministic and needs no doc attributes; richer
    policies (longest content, highest quality score) are a join of this
    output back to the doc table + one argmax per cluster_id."""
    cc = connected_components(pairs, src, dst)
    w = Window.partitionBy("cluster_id")
    return (cc.select(F.col("node").alias("doc_id"),
                      F.col("component").alias("cluster_id"))
            .withColumn("cluster_size", F.count(F.lit(1)).over(w))
            .withColumn("is_canonical",
                        F.col("doc_id") == F.col("cluster_id")))
