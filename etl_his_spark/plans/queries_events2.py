"""More event-time + sketch queries: hopping windows, per-window top-k,
approximate sketches (HLL / quantile)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import read_table


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


@register(
    "events_hopping_window",
    """
    WITH assigned AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start,
               event_type, value
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
               event_type, value
        FROM events
    )
    SELECT window_start, event_type, count(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
             AS sum_value
    FROM assigned GROUP BY 1, 2
    """,
)
def events_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 1-hour width, 30-minute slide — each
    event lands in exactly two windows. Spark's window generator emits
    the assignments; the oracle derives the same two bucket starts."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(_cents("value")).cast("double") / 100).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_topk_per_window",
    """
    WITH hourly AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, user_id,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY window_start ORDER BY cents DESC, user_id
        ) AS rnk
        FROM hourly
    )
    SELECT window_start, user_id,
           CAST(cents AS DOUBLE) / 100 AS total_value,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def events_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users by value inside every hourly window (grouped top-k:
    agg + ranked window, deterministic tie-break)."""
    e = read_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.window("ts", "1 hour").alias("w"), "user_id"
    ).agg(F.sum(_cents("value")).alias("cents"))
    w = Window.partitionBy("w").orderBy(F.desc("cents"), F.asc("user_id"))
    return (
        hourly.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("w.start").alias("window_start"),
            "user_id",
            (F.col("cents").cast("double") / 100).alias("total_value"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


@register("sketch_approx_distinct")  # rows-only: HLL estimates are
# engine-specific by design; accuracy asserted in tests vs exact counts
def sketch_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type — the sketch
    that replaces COUNT(DISTINCT) at 100 TB (mergeable, fixed memory)."""
    e = read_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("sketch_approx_quantiles")  # rows-only: t-digest-style
# estimates are engine-specific; accuracy asserted in tests
def sketch_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 of event value per type
    (fixed-memory mergeable quantile sketch)."""
    e = read_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("quantiles")
    )
