"""Row-level maintenance: MERGE / DELETE / SCD2 invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_his_spark.operators.merge import (
    merge_delete,
    merge_upsert,
    scd2_from_events,
)
from etl_his_spark.sources.writers import publish_atomic, read_published


def test_merge_upsert_updates_win_inserts_land(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    updates = spark.createDataFrame(
        [(2, "B"), (9, "Z")], "k long, v string"
    )
    got = {(r.k, r.v) for r in merge_upsert(target, updates, ["k"]).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (9, "Z")}


def test_merge_delete_removes_only_matching_keys(spark):
    target = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    deletes = spark.createDataFrame([(2, "ignored")], "k long, x string")
    got = {(r.k, r.v) for r in merge_delete(target, deletes, ["k"]).collect()}
    assert got == {(1, "a"), (3, "c")}


def test_merge_then_publish_atomic(spark, tmp_path):
    """The incremental-load loop: published table + delta -> merged
    publish; readers see old or new, never a mix."""
    root = str(tmp_path / "pub")
    publish_atomic(
        {"t": spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")},
        root,
    )
    delta = spark.createDataFrame([(2, "B"), (5, "e")], "k long, v string")
    merged = merge_upsert(read_published(spark, root, "t"), delta, ["k"])
    publish_atomic({"t": merged}, root)
    got = {(r.k, r.v) for r in read_published(spark, root, "t").collect()}
    assert got == {(1, "a"), (2, "B"), (5, "e")}


def test_scd2_intervals_partition_timeline(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hist = scd2_from_events(
        o, "o_custkey", ["o_orderpriority"], "o_orderdate", "o_orderkey"
    )
    # exactly one open (current) version per key
    open_versions = hist.filter(F.col("valid_to").isNull())
    assert open_versions.count() == o.select("o_custkey").distinct().count()
    # intervals never invert, and each key's row count is preserved
    assert hist.filter(F.col("valid_to") < F.col("valid_from")).count() == 0
    assert hist.count() == o.count()
