"""Skew-resilient aggregation and join.

At 100 TB a handful of hot keys (one hospital, one mega-customer, one
viral document) can stall a shuffle stage on a single reducer. Two
standard remedies, both pure DataFrame ops:

- ``salted_agg`` — two-phase aggregation: add a random-free,
  DETERMINISTIC salt (hash of a secondary column mod N), partially
  aggregate on (key, salt), then finish on key. The second shuffle
  moves only N rows per hot key. Works for any algebraic aggregate
  (sum/count/min/max); results are identical to the direct groupBy.
- ``salted_broadcast_left`` — replicate the small side N times with a
  salt column and salt the big side the same way, turning one hot
  partition into N; only needed when AQE's skew-join splitting cannot
  apply (e.g. aggregations, or non-sort-merge paths).

AQE (`spark.sql.adaptive.skewJoin`) already splits skewed SORT-MERGE
join partitions automatically — these helpers cover the cases it
doesn't.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    salt_source: Column,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name -> (function, input column) with
    function in {sum, count, min, max}. The salt is
    ``hash(salt_source) mod n_salts`` — deterministic, so results are
    reproducible run to run (no rand()).
    """
    first_phase = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    second_phase = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn(
        "__salt", F.pmod(F.hash(salt_source), F.lit(n_salts))
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[
            first_phase[fn](col).alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            second_phase[fn](name).alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
) -> DataFrame:
    """Left join a skewed big side to a small side, salting both.

    The small side is exploded n_salts× (still small), the big side
    gets a deterministic row-salt, and the join key becomes
    (key, salt) — hot keys spread over n_salts partitions. Result
    equals ``big.join(small, on, "left")``.
    """
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("__salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "__salt",
        F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts)),
    )
    out = big_salted.join(small_rep, [on, "__salt"], "left")
    return out.drop("__salt")
