"""Bench-only queries (``bench_`` prefix → picked up by bench.py).

These are performance variants of oracle-checked operators: same
logical results (asserted in tests), different physical strategy.
Rows-only in the gate because their float summation order differs from
the sequential fold the oracles pin (~1e-12 — immaterial to any
threshold, fatal to bit-exact hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.vector_numpy import embedding_neardup_numpy
from ..registry import register
from ..sources.readers import read_table


@register("bench_embedding_neardup_numpy")  # rows-only: numpy pairwise
# summation ≠ sequential-fold bits; pair-set equality asserted in tests
def bench_embedding_neardup_numpy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/numpy (BLAS) near-dup kernel — the bulk-similarity fast
    lane, ~2.6× the expression version on local[32]."""
    return embedding_neardup_numpy(read_table(spark, sf_dir, "embeddings"), 0.4)
