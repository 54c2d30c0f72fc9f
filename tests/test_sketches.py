"""Accuracy tests for approximate sketches (rows-only gate queries)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_his_spark.plans.queries_events2 import (
    sketch_approx_distinct,
    sketch_approx_quantiles,
)
from etl_his_spark.sources.readers import read_table


def test_approx_distinct_within_tolerance(spark, sf_dir):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in sketch_approx_distinct(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(2, 0.05 * exact[k]), (
            k, approx[k], exact[k],
        )


def test_approx_quantiles_ordered_and_bounded(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    bounds = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in e.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in sketch_approx_quantiles(spark, sf_dir).collect():
        p50, p95, p99 = r["quantiles"]
        lo, hi = bounds[r["event_type"]]
        assert lo <= p50 <= p95 <= p99 <= hi
