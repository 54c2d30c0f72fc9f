"""Key-based deduplication — the reference's only aggregation-shaped work.

D1 (patients): the reference keeps the FIRST row encountered per
trimmed document number while iterating in ``ORDER BY FechaAlta DESC``
order (src/Command/EtlHisTurnosCommand.php:113,121-151,321). The
in-memory ``[documento => id]`` cache is exactly what a hash aggregate
computes; the deterministic Spark form is a row_number window — NOT
``dropDuplicates``, which is nondeterministic about the survivor
(SURVEY.md §2.5 D1, §7.3).

D2 (procedures): one row per distinct trimmed name
(Command.php:114,176-193) → plain ``distinct``.

Scale: the window partitions by the dedup key, so it is one shuffle on
that key and streams within each partition — no global sort, no driver
state. Skewed keys are handled by AQE skew-join/partition splitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_first_per_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[Column],
) -> DataFrame:
    """Keep exactly one row per key: the first under ``order_cols``.

    ``order_cols`` must be a total order within each key for full
    determinism (the reference has none — SURVEY.md §7.3 documents the
    tie-break we add).
    """
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_distinct_key(df: DataFrame, key_expr: Column, out_name: str) -> DataFrame:
    """Distinct values of one (computed) key — D2's shape."""
    return df.select(key_expr.alias(out_name)).distinct()
