"""Vector math as Column expressions — JVM-side, no Python UDFs.

Embeddings arrive as ``array<float>``; every computation casts to
double first and folds sequentially (``aggregate``), which makes the
result bit-identical to DuckDB's ``list_cosine_similarity`` — verified
empirically — so similarity queries get exact oracles.

At scale these run inside whole-stage codegen over Arrow-backed parquet
vectors; a Pandas-UDF path is deliberately absent because the builtin
higher-order functions already vectorize.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; inputs must already be double arrays."""
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(col: Column | str, bits: int = 4) -> Column:
    """Deterministic coarse quantizer: sign bits of the first ``bits``
    dimensions packed into an int — a random-hyperplane-LSH special
    case (axis-aligned planes). Used to prune ANN search to one bucket.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.lit(0)
    for j in range(bits):
        bit = F.when(F.element_at(c, j + 1) > 0, F.lit(1)).otherwise(F.lit(0))
        out = out + F.shiftleft(bit, j)
    return out
