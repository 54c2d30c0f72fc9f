"""Count-min sketch as plain DataFrame aggregation.

A CMS answers "how often does key k appear?" in fixed memory with a
one-sided (over-)estimate: DEPTH independent hash rows × WIDTH
counters; estimate(k) = min over rows of counter[h_s(k) % WIDTH].

The build is ONE aggregation with at most DEPTH×WIDTH output cells —
map-side partial aggregation collapses every partition to ≤ 32 K cells
before the (tiny, fixed-size) shuffle, no matter how many trillions of
stream rows went in, and sketches from different days/sources merge by
cell-wise addition (``merge_cms``). The probe side broadcasts the
counter table. Hashing is the repo-wide cross-engine md5 convention
(``seeded_hash60``), so a SQL oracle reproduces the sketch cell for
cell — estimates are deterministic, collisions and all, on both
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup_approx import seeded_hash60

CMS_DEPTH = 4
CMS_WIDTH = 8192


def _seed_buckets(key: Column, depth: int, width: int) -> Column:
    """array<struct<seed, bucket>> — the key's cell per hash row."""
    return F.array(
        *[
            F.struct(
                F.lit(s).alias("seed"),
                (seeded_hash60(key, F.lit(s)) % width).alias("bucket"),
            )
            for s in range(depth)
        ]
    )


def count_min_build(
    stream: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(seed, bucket, cnt) counter cells over the stream of keys."""
    return (
        stream.select(
            F.explode(_seed_buckets(F.col(key_col), depth, width)).alias("sb")
        )
        .groupBy(F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_cms(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum — CMS is a monoid, so per-partition/per-day
    sketches combine losslessly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("seed", "bucket").agg(F.sum("cnt").alias("cnt"))


def count_min_probe(
    keys: DataFrame,
    counters: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Input keys + ``est_n`` (≥ true count, deterministic). The
    counter table is ≤ depth×width rows — broadcast, so probing any
    number of keys is one map-side join plus a key-local min.

    LEFT join + coalesce(0): a CMS answers for ANY key — a key whose
    cells were never touched estimates 0, it does not vanish from the
    output (an inner join would silently drop it)."""
    probe = keys.select(
        "*", F.explode(_seed_buckets(F.col(key_col), depth, width)).alias("sb")
    ).select("*", F.col("sb.seed").alias("seed"), F.col("sb.bucket").alias("bucket"))
    return (
        probe.join(F.broadcast(counters), ["seed", "bucket"], "left")
        .groupBy(*keys.columns)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_n"))
    )
