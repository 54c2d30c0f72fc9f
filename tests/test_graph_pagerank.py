"""Fixed-point PageRank tests: hand-computed reference on a crafted
graph, plus mass invariants on the fixture trade graph."""

from __future__ import annotations

from collections import defaultdict

from etl_his_spark.plans.queries_graph import PR_BASE, PR_ITERS, PR_UNIT
from etl_his_spark.registry import QUERIES


def _ref_pagerank(edges, k):
    """edges: [(src, dst, w)] directed; integer fixed-point PageRank."""
    outw = defaultdict(int)
    for s, d, w in edges:
        outw[s] += w
    r = {n: PR_UNIT for n in outw}
    for _ in range(k):
        contrib = defaultdict(int)
        for s, d, w in edges:
            contrib[d] += (r[s] * w) // outw[s]
        r = {n: PR_BASE + (85 * c) // 100 for n, c in contrib.items()}
    return r


def test_pagerank_matches_reference(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    pairs = defaultdict(int)
    for row in li.join(o, li.l_orderkey == o.o_orderkey).collect():
        pairs[(f"S{row['l_suppkey']}", f"C{row['o_custkey']}")] += 1
    edges = []
    for (s, c), w in pairs.items():
        edges.append((s, c, w))
        edges.append((c, s, w))
    want = _ref_pagerank(edges, PR_ITERS)
    got = {
        r["node"]: r["rank"]
        for r in QUERIES["graph_pagerank_trade"](spark, sf_dir).collect()
    }
    assert got == want


def test_pagerank_mass_invariants(spark, sf_dir):
    rows = QUERIES["graph_pagerank_trade"](spark, sf_dir).collect()
    n = len(rows)
    total = sum(r["rank"] for r in rows)
    # every node keeps the damping floor; floor-division only loses mass
    assert all(r["rank"] >= PR_BASE for r in rows)
    assert total <= n * PR_UNIT
    # losses are bounded: ≤ degree micro-units/node/iter ≪ 1% of mass
    assert total >= int(n * PR_UNIT * 0.98)


def test_triangle_counts_match_reference(spark, sf_dir):
    from collections import defaultdict

    from etl_his_spark.registry import QUERIES

    pairs = QUERIES["dedup_simhash_pairs"](spark, sf_dir).collect()
    edges = {(min(r["a_id"], r["b_id"]), max(r["a_id"], r["b_id"]))
             for r in pairs}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    # enumerate each triangle once as a < b < c; credit all three nodes
    want = defaultdict(int)
    nodes = sorted(adj)
    for a in nodes:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    want[a] += 1
                    want[b] += 1
                    want[c] += 1
    got = {
        r["node"]: r["n_triangles"]
        for r in QUERIES["graph_triangle_counts"](spark, sf_dir).collect()
    }
    assert got == dict(want)
