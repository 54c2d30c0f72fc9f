"""Bucketed co-located join: the join must run with no shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_his_spark.sources.bucketing import (
    plan_has_exchange,
    read_bucketed,
    write_bucketed,
)
from etl_his_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # orphaned warehouse dirs (location without metastore entry) block
    # saveAsTable with LOCATION_ALREADY_EXISTS — clear both defensively
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8,
                   sort_by=["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], n_buckets=8, sort_by=["o_orderkey"],
    )
    return "b_orders", "b_lineitem"


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    bo, bl = bucketed_tables
    joined = read_bucketed(spark, bo).join(read_bucketed(spark, bl), "o_orderkey")
    # co-located: neither side needs an Exchange
    assert not plan_has_exchange(joined)
    assert joined.count() > 0


def test_unbucketed_join_has_shuffle_for_contrast(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    joined = o.join(
        l.hint("merge"), o.o_orderkey == l.l_orderkey
    )  # force sort-merge so the contrast is Exchange presence, not join type
    assert plan_has_exchange(joined)


def test_bucketed_join_correctness(spark, sf_dir, bucketed_tables):
    bo, bl = bucketed_tables
    bucketed_count = (
        read_bucketed(spark, bo).join(read_bucketed(spark, bl), "o_orderkey").count()
    )
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    plain_count = o.join(l, o.o_orderkey == l.l_orderkey).count()
    assert bucketed_count == plain_count
