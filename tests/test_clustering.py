"""Lloyd-step pins: assignment correctness, update means, and the
inertia-never-increases property over a real iteration."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_his_spark.operators.clustering import kmeans_assign, kmeans_update
from etl_his_spark.sources.readers import read_table


def test_assign_picks_nearest_with_deterministic_ties(spark):
    vecs = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),   # centroid 0
            (1, [10.0, 0.0]),  # centroid 1
            (2, [1.0, 0.0]),   # near centroid 0
            (3, [9.0, 0.0]),   # near centroid 1
            (4, [5.0, 0.0]),   # EXACTLY between -> lower cluster id wins
        ],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in kmeans_assign(vecs, k=2).collect()}
    assert rows[2]["cluster_id"] == 0 and rows[2]["d2"] == 1.0
    assert rows[3]["cluster_id"] == 1 and rows[3]["d2"] == 1.0
    assert rows[4]["cluster_id"] == 0 and rows[4]["d2"] == 25.0


def test_update_means_match_manual(spark):
    vecs = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [4.0, 0.0]), (2, [1.0, 1.0]), (3, [3.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    assigned = kmeans_assign(vecs, k=2)
    cents = {
        r["cluster_id"]: (r["centroid"], r["n"])
        for r in kmeans_update(assigned, vecs).collect()
    }
    # cluster 0 = {0, 2}, cluster 1 = {1, 3} by nearest-of-first-two
    assert cents[0] == ([0.5, 0.5], 2)
    assert cents[1] == ([3.5, 0.5], 2)


def test_lloyd_iteration_never_increases_inertia(spark, sf_dir):
    """assign -> update -> assign-on-new-centroids: total squared
    distance is non-increasing (the k-means convergence argument),
    exercised on the real embeddings table."""
    emb = read_table(spark, sf_dir, "embeddings")
    a1 = kmeans_assign(emb, k=8)
    inertia1 = a1.agg(F.sum("d2")).collect()[0][0]
    cents = sorted(
        kmeans_update(a1, emb).collect(), key=lambda r: r["cluster_id"]
    )
    a2 = kmeans_assign(emb, centroids=[list(r["centroid"]) for r in cents])
    inertia2 = a2.agg(F.sum("d2")).collect()[0][0]
    assert inertia2 <= inertia1 + 1e-6
    assert a2.count() == a1.count()


def test_semantic_cells_match_numpy_reference(spark, sf_dir):
    """dedup_semantic_cells: within-cell cosine>=0.4 pairs equal the
    numpy reference (centroids = 8 lowest-id vectors, assignment by
    (rounded d2, cluster_id)); no pair spans two cells by shape."""
    import numpy as np
    import pyarrow.parquet as pq

    from etl_his_spark.registry import QUERIES

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pylist()
    tbl.sort(key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in tbl]
    X = np.array([[float(x) for x in r["embedding"]] for r in tbl])
    C = X[:8]
    # sequential-fold distances, rounded like both engines
    d2 = np.round(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), 6)
    assign = np.argmin(d2, axis=1)  # argmin takes first on ties = id tie-break
    want = set()
    sims = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if assign[i] != assign[j]:
                continue
            cos = X[i] @ X[j] / (np.linalg.norm(X[i]) * np.linalg.norm(X[j]))
            if cos >= 0.4:
                a, b = sorted((ids[i], ids[j]))
                want.add((int(assign[i]), a, b))
                sims[(a, b)] = cos
    out = QUERIES["dedup_semantic_cells"](spark, sf_dir).collect()
    got = {(r["cell"], r["a_id"], r["b_id"]) for r in out}
    assert got == want
    for r in out:
        assert abs(r["sim"] - sims[(r["a_id"], r["b_id"])]) < 1e-5
