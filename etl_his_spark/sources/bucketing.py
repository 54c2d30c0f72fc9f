"""Bucketed tables — co-located joins without a shuffle.

The 100 TB join strategy for repeated big-big joins (fact ⋈ fact,
fact ⋈ large dim): write both sides bucketed by the join key into the
warehouse; Spark then hash-partitions ON WRITE, and a later join on
the bucket key needs NO Exchange on either side (verify: the physical
plan shows SortMergeJoin with no Exchange below it).

This is the Spark analog of the reference's only physical-design move —
its secondary indexes (PostgresSchemaBuilder.php:88-91) — applied to
join locality instead of point lookups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int = 16,
    sort_by: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange —
    the thing bucketed joins exist to eliminate."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan
