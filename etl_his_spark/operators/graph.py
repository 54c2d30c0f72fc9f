"""Distributed connected components — near-dup cluster closure.

The dedup family (exact groups, Jaccard / MinHash-LSH / SimHash /
embedding pairs) emits *pairs*; collapsing a corpus needs *clusters*:
if A~B and B~C, all three are one duplicate group even when A~C never
scored above threshold. That closure is connected components over the
pair graph, with the canonical document = min doc id per component
(same keeper rule as ``exact_dedup_groups``).

Algorithm: iterative min-label propagation with path halving.

- init: every vertex labeled with its own id
- propagate: label(v) <- min(label(v), min over neighbors u of label(u))
  — one edge join + one groupBy-min = one shuffle per round
- path-halve: label(v) <- label(label(v)) — a self-join that doubles
  how far a small label has traveled, turning O(diameter) rounds into
  ~O(log diameter)
- stop when no label changed (checked distributedly: first diff found
  short-circuits via limit(1))

Scale: each round is shuffle-bound on |E|; near-dup graphs are sparse
(pairs above threshold), components are tiny (duplicate groups), so
rounds ~ log of the longest duplicate chain — 3-5 in practice. The
driver loop holds only iteration control, never data;
``localCheckpoint`` truncates lineage each round so plans stay
constant-size. This is the standard Spark formulation of the
small/large-star technique (Kiveris et al., "Connected Components in
MapReduce and Beyond") specialized to min-label.

Reference parity: the reference dedups only on exact natural keys via
in-memory caches (SURVEY.md §2.5, Command.php:112-114); transitive
content-level closure is part of this engine's training-data extension
surface (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "a_id",
    dst_col: str = "b_id",
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex with the min vertex id reachable from it.

    ``vertices``: one row per node (singletons allowed — they label
    themselves). ``edges``: undirected pair list. Returns
    ``(id_col, component)`` where component = min id in the node's
    connected component.
    """
    labels = vertices.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    )
    bidir = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).union(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))

    for _ in range(max_iter):
        nbr = (
            bidir.join(labels, bidir.u == labels.node)
            .groupBy("v")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(nbr, labels.node == nbr.v, "left").select(
            "node",
            F.least(
                F.col("label"), F.coalesce("nbr_label", F.col("label"))
            ).alias("label"),
        )
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        halved = stepped.join(
            parent, stepped.label == parent.p_node
        ).select("node", F.col("p_label").alias("label"))
        # Lazy: the convergence count() just below is the round's
        # action and materializes the checkpoint blocks — eager would
        # run a dedicated extra job per round for the same blocks.
        halved = halved.localCheckpoint(eager=False)
        changed = (
            halved.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = halved
        if changed == 0:
            break

    return labels.select(
        F.col("node").alias(id_col), F.col("label").alias("component")
    )
