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
- stop when no label changed — the changed-count rides each round's
  checkpoint-materializing action as an Observation metric, so
  convergence costs zero extra jobs and is known every round

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

import itertools

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

# Observation names must be unique among concurrently-live listeners:
# two in-flight observations sharing a name could cross-fill. The loop
# below consumes each observation before creating the next, but a
# caller may run two connected_components calls on parallel threads —
# a process-wide counter keeps every name distinct.
_OBS_SEQ = itertools.count()


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
    bidir = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).union(edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
    # The edge list joins into EVERY round's plan; without
    # materialization the upstream pair computation (e.g. the whole
    # prefix-filtered Jaccard pipeline) re-executes once per round.
    # Lazy, measured against eager: round 0's convergence count
    # materializes the blocks inline; eager's dedicated construction
    # pass measured ~30% slower for the full query despite round 0
    # referencing bidir from two stages.
    bidir = bidir.localCheckpoint(eager=False)

    # Iterate ONLY over edge endpoints: a vertex with no edges is its
    # own component and can never change, so it skips the loop and
    # unions back at the end. Near-dup graphs are sparse — at corpus
    # scale this shrinks the iterated frame from |V| (every document)
    # to ~2|E| (documents that matched anything), which is what keeps
    # k rounds of joins affordable when |V| is 10^11 and |E| is 10^7.
    labels = None

    for rnd in range(max_iter):
        if rnd == 0:
            # Round 0 FUSED: against the identity labeling, the
            # neighbor-min of node v is simply min(u) over its
            # incident edges — one aggregation over bidir, no initial
            # distinct and no edge⋈labels join (each of which is a
            # full shuffle of the edge list, the round's largest
            # frame). bidir is symmetric, so groupBy(v) covers every
            # endpoint node exactly once. Result is identical to the
            # generic round below applied to identity labels.
            stepped = bidir.groupBy("v").agg(
                F.min("u").alias("nbr_label")
            ).select(
                F.col("v").alias("node"),
                F.col("v").alias("__old"),
                F.least(F.col("v"), F.col("nbr_label")).alias("label"),
            )
        else:
            nbr = (
                bidir.join(labels, bidir.u == labels.node)
                .groupBy("v")
                .agg(F.min("label").alias("nbr_label"))
            )
            # The PREVIOUS label rides through the round as __old, so
            # convergence is a filter on the round's own output — no
            # separate halved-vs-labels join per round.
            stepped = labels.join(nbr, labels.node == nbr.v, "left").select(
                "node",
                F.col("label").alias("__old"),
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
        parent = stepped.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        halved = stepped.join(
            parent, stepped.label == parent.p_node
        ).select("node", "__old", F.col("p_label").alias("label"))
        # Lazy: the convergence action just below is the round's ONLY
        # job and materializes the checkpoint blocks — eager would run
        # a dedicated extra job per round for the same blocks.
        halved = halved.localCheckpoint(eager=False)
        # Convergence is FREE, not probed: the changed-count rides the
        # round's materializing action as an Observation metric
        # (CollectMetrics — accumulator-style, collected in-flight
        # while the count scans/creates the checkpoint blocks), so it
        # is known EVERY round at exactly one job per round. This
        # replaces the r6 probe-every-2nd-round cadence, which halved
        # job submissions but could execute one full extra
        # propagate+halve shuffle round after convergence — measured
        # costlier than the saved submissions at sf0.1 (r6 verdict
        # item 4). The observe MUST attach to the checkpointed frame
        # (downstream of the LogicalRDD): attached upstream, the
        # metric node executes inside RDD computation where no Dataset
        # action listener sees it, and the observation yields null.
        obs = Observation(f"cc_{next(_OBS_SEQ)}")
        halved.observe(
            obs,
            # coalesce: sum over an EMPTY frame (no edges at all) is
            # NULL, which must read as converged, not as != 0
            F.coalesce(
                F.sum((F.col("label") != F.col("__old")).cast("long")),
                F.lit(0),
            ).alias("changed"),
        ).count()
        labels = halved.drop("__old")
        if obs.get["changed"] == 0:
            break

    singletons = vertices.select(F.col(id_col).alias("node")).join(
        bidir.select(F.col("u").alias("node")).distinct(), "node", "left_anti"
    ).select("node", F.col("node").alias("label"))
    return labels.union(singletons).select(
        F.col("node").alias(id_col), F.col("label").alias("component")
    )
