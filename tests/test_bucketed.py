"""Bucketed-table layout: the write-once / join-many contract.

What must hold for the 100 TB story: two tables bucketed on the join
key with the same bucket count join WITHOUT an exchange on either side
(bucketing IS the shuffle, paid once at write time), and sortBy within
buckets removes the sort-merge join's per-query sorts too.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_his_spark.sources.readers import read_table
from etl_his_spark.sources.writers import write_bucketed


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bucketed"))
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    items = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    write_bucketed(
        orders, "t_bkt_orders", os.path.join(root, "o"),
        ["o_orderkey"], 8, sort_cols=["o_orderkey"],
    )
    write_bucketed(
        items, "t_bkt_items", os.path.join(root, "l"),
        ["l_orderkey"], 8, sort_cols=["l_orderkey"],
    )
    yield spark.table("t_bkt_orders"), spark.table("t_bkt_items")
    spark.sql("DROP TABLE IF EXISTS t_bkt_orders")
    spark.sql("DROP TABLE IF EXISTS t_bkt_items")


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    """The join subtree: SortMergeJoin fed directly by bucketed scans —
    zero Exchange on either side. The shuffle (the network cost that
    dominates a repeated 100 TB fact join) is replaced by the layout;
    a partition-local Sort remains because Spark 3+ no longer reports
    bucket sort order from scans by default (SPARK-28595 — the legacy
    ``spark.sql.legacy.bucketedTableScan.outputOrdering`` flag restores
    it; ``write_bucketed``'s one-file-per-bucket layout is what makes
    that flag usable)."""
    o, l = bucketed_pair
    joined = l.join(o.hint("merge"), l.l_orderkey == o.o_orderkey)
    plan = _executed_plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert plan.count("Bucketed: true") == 2
    assert plan.count("SelectedBucketsCount: 8 out of 8") == 2


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    """Layout changes nothing about the answer: bucketed join ==
    read-and-shuffle join, row for row."""
    o, l = bucketed_pair
    got = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orders = read_table(spark, sf_dir, "orders")
    items = read_table(spark, sf_dir, "lineitem")
    want = (
        items.join(orders, items.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bucketed_files_respect_bucket_count(spark, bucketed_pair, sf_dir):
    """On-disk contract: file names carry the bucket id and every
    bucket id is < num_buckets."""
    o, _ = bucketed_pair
    files = o.inputFiles()
    assert files
    ids = set()
    for f in files:
        name = os.path.basename(f)
        # bucketed part files: part-<task>-<uuid>_<bucketid>.c000...
        bucket_tag = name.split("_")[-1].split(".")[0]
        ids.add(int(bucket_tag))
    assert ids <= set(range(8))
