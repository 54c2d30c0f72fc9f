"""Arrow/numpy vector kernels — the Pandas-UDF fast lane.

The expression-based cosine (functions/vector.py) is exact and
oracle-parity-stable, but Spark's higher-order array functions are
interpreted per element — fine for correctness gates, slow for bulk
similarity. This module is the documented scale path: Arrow batches →
numpy matrix products (BLAS), ~10-100× the per-element expression
throughput.

Trade-off, stated explicitly: numpy's pairwise summation produces
slightly different low-order float bits than the sequential fold, so
these kernels are NOT used for oracle-checked queries — results agree
to ~1e-12, which only matters to bit-exact comparison, not to any
real similarity threshold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _auto_blocks(vectors: DataFrame) -> int:
    """Pick the block count from the INPUT SIZE, not the core count.

    Blocking exists to bound per-task memory (each block-pair task
    holds ~2·bytes/n_blocks of float64 matrix, ~4× the on-disk float32
    parquet bytes after decompression+widening), so the right n_blocks
    scales with data volume: ``ceil(bytes / 32 MiB)`` keeps every task
    under ~256 MiB of matrix. The old ``defaultParallelism // 4``
    heuristic sized blocks by CPU count instead — on a 2 MB input that
    manufactured 36 near-empty Arrow tasks whose scheduling overhead
    DOUBLED the query time (measured r6: 8 blocks 0.60-0.65 s vs
    4 blocks 0.47-0.50 s at sf0.1; the r3→r5 bench regression).
    Floor 4 (10 block-pair tasks — parallel enough for any input this
    small to finish in well under a second), cap 1024 (at the cap,
    shuffle replication is n_blocks× the input — beyond ~32 GiB of
    raw vectors the banded-LSH path, not all-pairs, is the tool).
    File-size metadata is free (Hadoop-FS getFileStatus — works on
    s3a/hdfs/abfs, not just local paths); frames with no file lineage
    fall back to the parallelism heuristic.
    """
    import math

    from ..sources.readers import input_size_bytes

    size = input_size_bytes(vectors)
    if size:
        return min(1024, max(4, math.ceil(size / (32 << 20))))
    return max(vectors.sparkSession.sparkContext.defaultParallelism // 4, 4)


PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("a_id", T.LongType()),
        T.StructField("b_id", T.LongType()),
        T.StructField("sim", T.DoubleType()),
    ]
)


def embedding_neardup_numpy(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
) -> DataFrame:
    """All near-dup pairs (cosine ≥ threshold) via block-matrix products.

    Fully distributed — nothing is collected to the driver. Vectors are
    hashed into ``n_blocks`` row blocks; every unordered block pair
    (i ≤ j) becomes one task holding only its two sub-blocks
    (~2·N/n_blocks vectors), which one BLAS call multiplies. Each
    vector is shipped to n_blocks tasks, so shuffle volume is
    N·n_blocks rows while per-task memory shrinks as N/n_blocks —
    pick n_blocks ~ √(N·d / task_mem) at corpus scale and no executor
    ever materializes the full matrix. Output pairs are canonicalized
    to a_id < b_id, matching the expression-based operator exactly
    (up to the documented low-order float bits).
    """
    spark = vectors.sparkSession
    if n_blocks is None:
        n_blocks = _auto_blocks(vectors)

    v = vectors.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).alias("blk"),
    )
    # Replicate each vector to every block pair it participates in:
    # block k joins pairs (min(k,j), max(k,j)) for all j.
    pair_structs = F.array_distinct(
        F.array(
            *[
                F.struct(
                    F.least(F.col("blk"), F.lit(j)).alias("bi"),
                    F.greatest(F.col("blk"), F.lit(j)).alias("bj"),
                )
                for j in range(n_blocks)
            ]
        )
    )
    replicated = v.select(
        "vid", "vec", "blk", F.explode(pair_structs).alias("p")
    ).select("vid", "vec", "blk", F.col("p.bi").alias("bi"), F.col("p.bj").alias("bj"))

    def block_pairs(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = key
        ids = pdf["vid"].to_numpy(dtype=np.int64)
        mat = np.array(pdf["vec"].tolist(), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        blk = pdf["blk"].to_numpy()
        if bi == bj:
            a_idx = np.arange(len(ids))
            b_idx = a_idx
        else:
            a_idx = np.flatnonzero(blk == bi)
            b_idx = np.flatnonzero(blk == bj)
        if len(a_idx) == 0 or len(b_idx) == 0:
            return pd.DataFrame({"a_id": [], "b_id": [], "sim": []}).astype(
                {"a_id": np.int64, "b_id": np.int64, "sim": np.float64}
            )
        sims = mat[a_idx] @ mat[b_idx].T  # one BLAS call per block pair
        ai, bi_ = np.nonzero(sims >= threshold)
        a_ids = ids[a_idx][ai]
        b_ids = ids[b_idx][bi_]
        if bi == bj:
            # full symmetric matrix: keep one triangle (drops self pairs)
            keep = a_ids < b_ids
            a_ids, b_ids = a_ids[keep], b_ids[keep]
            s = np.round(sims[ai, bi_][keep], 6)
        else:
            # each cross pair appears once — canonicalize order, drop none
            s = np.round(sims[ai, bi_], 6)
            a_ids, b_ids = np.minimum(a_ids, b_ids), np.maximum(a_ids, b_ids)
        return pd.DataFrame({"a_id": a_ids, "b_id": b_ids, "sim": s})

    return replicated.groupBy("bi", "bj").applyInPandas(block_pairs, PAIRS_SCHEMA)


GRAM_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField("j", T.IntegerType()),
        T.StructField("gram_milli2", T.LongType()),
    ]
)


# d cap for gram_matrix_exact / pca_project: the operator shuffles d²
# cells per partition and pca_project COLLECTS d² rows onto the driver
# for the O(d³) eigensolve — all fine for embedding-sized d (64-1024:
# ≤ 1M cells, ≤ ~24 MB collected) and hostile beyond it. Like the
# all-pairs baselines (guards.py), the docstring's "d is small by
# construction" is now asserted, not trusted (r11 verdict item 7).
GRAM_MAX_DIM = 1024


def gram_matrix_exact(
    vectors: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """The d×d Gram matrix Σ xᵀx over all vectors — the input to PCA /
    whitening / covariance — computed EXACTLY and therefore
    oracle-hashable: components are fixed-pointed to milli units
    (round(x·1000) as int64) inside each Arrow batch, the per-batch
    Gram partial is ONE integer matmul (numpy int64 ``q.T @ q`` —
    exact, no float accumulation anywhere), and partials merge by
    integer addition in a d²-cell groupBy.

    Scale shape: per-partition work is a single BLAS-free integer
    matmul over that partition's rows; the shuffle moves d² = 4096
    cells per partition regardless of row count (the CMS discipline).
    Overflow headroom: |q| ≲ 3·10³ ⇒ per-pair product ≲ 10⁷; int64
    holds ~9·10¹⁸, so ~10¹¹ rows fit before any partial could wrap.

    Guarded (r12): raises above ``GRAM_MAX_DIM`` — the d²-cell shuffle
    and the driver-side d² collect in ``pca_project`` are only
    scale-safe while d stays embedding-sized.
    """
    if dim > GRAM_MAX_DIM:
        raise ValueError(
            f"gram_matrix_exact is bounded at dim <= {GRAM_MAX_DIM}"
            f" (got {dim}): it shuffles dim² cells per partition and"
            " its pca_project consumer collects dim² rows onto the"
            " driver. For wider features, reduce dimensionality first"
            " (jl_project) or use a blocked covariance path."
        )

    def batches(it):
        for pdf in it:
            arr = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            if arr.size == 0:
                continue
            y = arr * 1000.0
            # HALF-AWAY-FROM-ZERO to match the oracle's ROUND exactly
            # (np.rint is half-even — a .5-boundary component would
            # silently flip one milli unit between engines)
            q = np.copysign(np.floor(np.abs(y) + 0.5), y).astype(np.int64)
            g = q.T @ q  # exact integer matmul
            ii, jj = np.meshgrid(
                np.arange(dim, dtype=np.int32),
                np.arange(dim, dtype=np.int32),
                indexing="ij",
            )
            yield pd.DataFrame(
                {
                    "i": ii.ravel(),
                    "j": jj.ravel(),
                    "gram_milli2": g.ravel(),
                }
            )

    return (
        vectors.select(vec_col)
        .mapInPandas(batches, GRAM_SCHEMA)
        .groupBy("i", "j")
        .agg(F.sum("gram_milli2").alias("gram_milli2"))
    )


def pca_project(
    vectors: DataFrame,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Project every vector onto the top-k principal axes.

    Decomposition strategy at scale: the d×d Gram matrix is computed
    DISTRIBUTED and exactly (``gram_matrix_exact`` — one pass, d²-cell
    shuffle), then eigen-decomposed on the DRIVER (d×d is 32 KiB at
    d=64 — always driver-sized, like k-means centroids), and the top-k
    eigenvectors ride back into a map-only projection expression.
    Nothing large ever leaves the executors; the eigensolve cost is
    O(d³) once, independent of row count.

    No SQL oracle by design: LAPACK eigenvector low-order bits are not
    cross-engine-standardizable — the operator is pinned instead by
    variance-ordering and reconstruction tests (pytest), the repo's
    declared policy for libm-dependent lanes.
    """
    gram_rows = gram_matrix_exact(vectors, vec_col=vec_col, dim=dim).collect()
    g = np.zeros((dim, dim), dtype=np.float64)
    for r in gram_rows:
        g[r["i"], r["j"]] = r["gram_milli2"] / 1e6
    evals, evecs = np.linalg.eigh(g)  # ascending; symmetric input
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order]  # d×k
    # sign convention: largest-magnitude entry positive → deterministic
    for c in range(k):
        col = comps[:, c]
        if col[np.argmax(np.abs(col))] < 0:
            comps[:, c] = -col
    from ..functions.vector import to_double_array

    v = vectors.select(id_col, to_double_array(vec_col).alias("e"))
    proj_cols = []
    for c in range(k):
        w = [float(x) for x in comps[:, c]]
        dot_expr = F.aggregate(
            F.zip_with(F.col("e"), F.lit(w), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        proj_cols.append(dot_expr.alias(f"pc{c + 1}"))
    return v.select(id_col, *proj_cols)
