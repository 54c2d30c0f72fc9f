"""Embedding clustering — the Lloyd assignment step as map-only columns.

K-means over a 100 TB embedding table decomposes into (a) an
assignment pass (every vector → nearest centroid) and (b) a centroid
update (per-cluster mean). Both are Spark-natural: the centroids are
k·d doubles — always driver/broadcast-sized — so assignment needs NO
join and NO shuffle at all (the distances to all k centroids are
column expressions, argmin is a ``least`` over (distance, id) structs),
and the update is one groupBy(cluster).avg. This module implements the
deterministic pieces a pipeline composes: iteration count and
convergence policy stay with the caller.

Determinism: centroid INIT is "the k vectors with the smallest ids" —
reproducible across engines and runs (k-means++ trades determinism for
quality; seed-pinned sampling would still be engine-specific). The
argmin tie-break is (distance rounded to 6, centroid index), matching
the SQL oracle bit for bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import to_double_array


def _sq_dist(a, b_lit: list[float]):
    """Squared L2 between an array column and a centroid literal —
    sequential fold, deterministic order (functions/vector.dot).
    Squares by plain multiplication, not ``**``: Math.pow is only
    1-ulp-accurate, which is enough to flip a round(d2, 6) at a
    boundary against the oracle's (a-b)*(a-b).

    zip_with, not transform+element_at (r13): the previous form did
    two positional array lookups into the centroid literal per
    element; zip_with walks both arrays once. Same (x−y)·(x−y) values
    folded in the same index order — bit-identical result.

    Dimension assumption (ADVICE r13): zip_with null-pads when the
    two arrays differ in length, so a vector SHORTER than the
    centroid yields a NULL distance (the old element_at form silently
    ignored extra centroid dims instead). Fine here by construction —
    every centroid in this module is derived from (or validated
    against) the same fixed-dim vectors — and a NULL distance on a
    genuinely ragged vector is the better failure mode: it surfaces
    in the oracle comparison instead of scoring a truncated match."""
    diffs = F.zip_with(a, F.lit(b_lit), lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def kmeans_assign(
    vectors: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(id, cluster_id, d2) — one Lloyd assignment pass.

    ``centroids=None`` uses the deterministic lowest-id init (the k
    centroid FETCH is the one driver action — k rows, bounded like the
    packing offsets); an iterating caller passes the previous
    ``kmeans_update`` output back in. Either way the pass itself is a
    pure projection: k distance expressions + a ``least`` over
    structs, zero joins, zero shuffles, whole-stage-codegen friendly.
    """
    if centroids is None:
        centroids = [
            list(row["e"])
            for row in (
                vectors.select(id_col, to_double_array(vec_col).alias("e"))
                .orderBy(id_col)
                .limit(k)
                .collect()
            )
        ]
    # Spread a narrow scan before the CPU-heavy projection (r13): the
    # assignment is k·d interpreted array ops per row, and a small
    # parquet file arrives as ONE scan split — byte-cheap but
    # CPU-bound, the case AQE's byte-based coalescing cannot see.
    # Conditional: at cluster scale the scan is already ≥ cores wide
    # and this is a no-op (dedup_approx.spread_small_input).
    from .dedup_approx import spread_small_input

    v = spread_small_input(
        vectors.select(id_col, to_double_array(vec_col).alias("e"))
    )
    candidates = [
        F.struct(
            F.round(_sq_dist(F.col("e"), c), 6).alias("d2"),
            F.lit(i).alias("cluster_id"),
        )
        for i, c in enumerate(centroids)
    ]
    best = F.least(*candidates)
    return v.select(
        id_col,
        best["cluster_id"].alias("cluster_id"),
        best["d2"].alias("d2"),
    )


def kmeans_update(
    assigned: DataFrame,
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cluster_id, centroid, n) — the mean-update step: one
    cluster-keyed aggregation over position-exploded components (k·d
    cells out, map-side combined)."""
    v = vectors.select(id_col, to_double_array(vec_col).alias("e"))
    joined = assigned.select(id_col, "cluster_id").join(v, id_col)
    comps = joined.select(
        "cluster_id", F.posexplode("e").alias("dim", "x")
    )
    per_dim = comps.groupBy("cluster_id", "dim").agg(
        F.avg("x").alias("m"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_dim.groupBy("cluster_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "m"))
            ).alias("__dm"),
            F.max("n").alias("n"),
        )
        .select(
            "cluster_id",
            F.transform("__dm", lambda s: s.m).alias("centroid"),
            "n",
        )
    )
