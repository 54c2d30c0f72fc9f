"""Graph analytics over the trade graph: PageRank in fixed-point
integer arithmetic.

The supplier↔customer trade graph (who ships to whom, weighted by
lineitem count) is the TPC-H analog of a web/link graph; PageRank over
it ranks the most systemically-connected parties. Two design choices
make it exact-oracle verifiable and 100 TB-shaped:

* **Fixed-point integers, not doubles.** Ranks are micro-units
  (r₀ = 10⁶); per-edge contributions use integer floor division
  ``(r·w) div W_out`` and damping is ``150000 + (85·Σ) div 100`` —
  every intermediate is a BIGINT, so the cross-engine comparison is
  hash-exact with NO float-summation order hazard (a double PageRank
  sums contributions in engine-dependent row order). Production would
  use doubles; the floor-loss here is ≤ degree micro-units per node
  per iteration — noise at rank scale, and IDENTICAL in both engines.
* **Fixed iteration count, unrolled.** k=2 iterations as chained
  join→agg stages (the oracle unrolls the same two CTE rounds). Each
  iteration is exactly one shuffle of the edge list joined with the
  node-keyed rank frame — the iterative-algorithm shape of
  graph.connected_components, with the convergence loop replaced by a
  fixed horizon so the plan is static and SQL-expressible.

Undirected symmetrization (both edge directions) guarantees every
node has out-weight, so there is no dangling-mass term to model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import read_table

PR_ITERS = 2
PR_UNIT = 1_000_000  # r0 in micro-units
PR_BASE = 150_000    # (1 - d) * PR_UNIT with d = 0.85


def _pagerank_oracle(k: int) -> str:
    parts = [f"""
    base AS (
        SELECT 'S' || CAST(l_suppkey AS VARCHAR) AS s_node,
               'C' || CAST(o_custkey AS VARCHAR) AS c_node,
               CAST(count(*) AS BIGINT) AS w
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT s_node AS src, c_node AS dst, w FROM base
        UNION ALL
        SELECT c_node AS src, s_node AS dst, w FROM base
    ),
    outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wout
             FROM edges GROUP BY 1),
    r0 AS (SELECT src AS node, CAST({PR_UNIT} AS BIGINT) AS r FROM outw)"""]
    for s in range(1, k + 1):
        parts.append(f""",
    c{s} AS (
        SELECT e.dst AS node,
               CAST(sum((p.r * e.w) // o.wout) AS BIGINT) AS contrib
        FROM edges e JOIN r{s-1} p ON e.src = p.node
                     JOIN outw o ON e.src = o.src
        GROUP BY 1
    ),
    r{s} AS (SELECT node,
                    CAST({PR_BASE} + (85 * contrib) // 100 AS BIGINT) AS r
             FROM c{s})""")
    return (
        "WITH" + "".join(parts)
        + f"\n    SELECT node, r AS rank FROM r{k}"
    )


@register("graph_pagerank_trade", _pagerank_oracle(PR_ITERS))
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, k=2, fixed-point micro-units) over the
    undirected supplier↔customer trade graph — module docstring has
    the exactness/scale rationale."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias(
                "s_node"
            ),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias(
                "c_node"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    edges = base.select(
        F.col("s_node").alias("src"), F.col("c_node").alias("dst"), "w"
    ).unionByName(
        base.select(
            F.col("c_node").alias("src"), F.col("s_node").alias("dst"), "w"
        )
    )
    # edges feeds outw + one join per iteration: checkpoint once so no
    # consumer recomputes the base join. LAZY, measured (sf0.1, min of
    # 3 interleaved quiesced runs): lazy 3.9 s / eager 4.4 s / none
    # 4.2 s-with-12 s-spikes — unlike the dedup frames, the first
    # consumer here (outw) is a cheap serial agg, so lazy's
    # materialize-on-first-use costs nothing extra and skips eager's
    # blocking pass; no-checkpoint race-recomputes the join per
    # consumer (the spiky tail).
    edges = edges.localCheckpoint(eager=False)
    # outw feeds the rank init AND the ew join of EVERY iteration —
    # un-pinned it re-aggregated the edge list once per consumer (3
    # subtrees in the r12 physical plan). Node-dim-sized: pinning is
    # O(nodes) storage at any scale.
    outw = edges.groupBy("src").agg(
        F.sum("w").cast("long").alias("wout")
    ).localCheckpoint(eager=False)
    ranks = outw.select(
        F.col("src").alias("node"), F.lit(PR_UNIT).cast("long").alias("r")
    )
    # ew feeds one join per iteration: pin it so the edges⋈outw join
    # runs once, not once per unrolled iteration. Edge-sized — the
    # same O(|E|) storage class as the edges pin above.
    ew = edges.join(outw, "src").localCheckpoint(eager=False)
    for _ in range(PR_ITERS):
        contrib = (
            ew.join(ranks, ew.src == ranks.node)
            .select(
                "dst",
                F.expr("(r * w) div wout").cast("long").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").cast("long").alias("contrib"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            (
                F.lit(PR_BASE) + F.expr("(85 * contrib) div 100")
            ).cast("long").alias("r"),
        )
    return ranks.select("node", F.col("r").alias("rank"))


# ---------------------------------------------------------------------------
# Triangle counting over the near-dup graph
# ---------------------------------------------------------------------------

from .queries_dedup import _SIMHASH_CTE  # noqa: E402  (canonical simhash SQL)


@register(
    "graph_triangle_counts",
    f"""
    WITH {_SIMHASH_CTE},
    -- The MATERIALIZED hints below are load-bearing, not style:
    -- DuckDB inlines plain CTEs per reference, and this chain is
    -- referenced multiply (deg reads e twice, o reads e + deg twice,
    -- tri reads o three times transitively, the final UNION reads
    -- tri three times) — inlined, the whole simhash pipeline re-ran
    -- ~45x, which made the r10 sf0.1 closing audit sit an HOUR on
    -- this one oracle (25 GB spill). Materialized, sf0.1 runs in ~6 s.
    e AS MATERIALIZED (
        SELECT a.doc_id AS u, b.doc_id AS v
        FROM simsig a JOIN simsig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
    ),
    deg AS MATERIALIZED (
        SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT u AS node FROM e UNION ALL SELECT v FROM e
        ) GROUP BY 1
    ),
    o AS MATERIALIZED (
        -- orient every edge from the (degree, id)-smaller endpoint:
        -- a total order, so the oriented graph is a DAG and each
        -- triangle matches the (u→v, u→w, v→w) pattern exactly once
        SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END
                   AS src,
               CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END
                   AS dst
        FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    ),
    adj AS MATERIALIZED (
        SELECT src, list(dst) AS nbrs FROM o GROUP BY src
    ),
    tri AS MATERIALIZED (
        -- adjacency-intersect closure (the Spark side's r9 shape):
        -- for each oriented edge (a, b), every shared out-neighbor w
        -- closes exactly the (a→b, a→w, b→w) triangle of the wedge
        -- formulation — the same set, verified bit-identical against
        -- the wedge-join form at sf0.001/0.01, without materializing
        -- the wedge rows.
        SELECT o.src AS a, o.dst AS b,
               unnest(list_intersect(au.nbrs, av.nbrs)) AS c
        FROM o
        JOIN adj au ON au.src = o.src
        JOIN adj av ON av.src = o.dst
    )
    SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    ) GROUP BY 1
    """,
)
def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the SimHash near-dup graph —
    triangle density separates tight duplicate CLUSTERS (boilerplate
    families, template spam) from incidental pairwise matches, and is
    the classic bounded-wedge graph computation.

    Degree-ordered orientation (Schank-Wagner): every edge points
    from its (degree, id)-smaller endpoint, making the graph a DAG in
    which each triangle matches the wedge-plus-closure pattern
    exactly once, and bounding per-node wedge work by the oriented
    out-degree (O(m^1.5) total instead of Σdeg²) — the property that
    keeps triangle counting alive on power-law near-dup graphs at
    corpus scale.

    The closure is evaluated as adjacency-array intersection, not a
    wedge self-join: build each node's sorted out-neighbor array (one
    groupBy), attach both endpoints' arrays to every oriented edge
    (two keyed joins of m rows + arrays), and explode
    ``array_intersect(N⁺(src), N⁺(dst))`` — every common out-neighbor
    w closes triangle (src, dst, w) exactly once. The O(m·d̄) wedge
    set (3.6 M rows at sf0.1, all shuffled by the old
    wedge⋈closure) is never materialized; only true triangles leave
    the intersect (r9 A/B: tail 1.25 → 0.71 s, hash-identical).
    Arrays are oriented out-neighborhoods, so their size is bounded
    by the Schank-Wagner degree bound (≤ O(√m)), not raw degree —
    safe to carry through the joins even on power-law graphs."""
    from ..operators.dedup_approx import simhash_pairs_blocked
    from ..operators.graph import triangle_node_counts

    e = (
        simhash_pairs_blocked(read_table(spark, sf_dir, "documents"), 8)
        .select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
    )
    # Machinery factored to operators.graph.triangle_node_counts (r14,
    # verbatim move — the r13 single-pass emission unchanged) so the
    # planted power-law skew test exercises the same code path.
    return triangle_node_counts(e)
