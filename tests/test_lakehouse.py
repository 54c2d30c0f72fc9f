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


def test_changelog_ops_and_payload_sides(spark):
    """I/U/D classification, payload sourcing (new for I/U, old for D),
    unchanged-row suppression, and NULL-safe column comparison."""
    from etl_his_spark.operators.merge import changelog

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),      # unchanged -> suppressed
            (2, "B", 20),      # updated string
            (3, None, 30),     # unchanged incl. NULL column -> suppressed
            (5, "e", 50),      # inserted
        ],                      # 4 -> deleted
        "k long, s string, v long",
    )
    rows = {r["k"]: r for r in changelog(old, new, ["k"], ["s", "v"]).collect()}
    assert set(rows) == {2, 4, 5}
    assert rows[2]["op"] == "U" and rows[2]["s"] == "B"
    assert rows[4]["op"] == "D" and rows[4]["s"] == "d" and rows[4]["v"] == 40
    assert rows[5]["op"] == "I" and rows[5]["s"] == "e"


def test_changelog_null_vs_sentinel_distinct(spark):
    """The digest's NULL sentinel never collides with a real value:
    NULL -> '' and '' -> NULL transitions are both updates."""
    from etl_his_spark.operators.merge import changelog

    old = spark.createDataFrame([(1, None), (2, "")], "k long, s string")
    new = spark.createDataFrame([(1, ""), (2, None)], "k long, s string")
    rows = {r["k"]: r["op"] for r in changelog(old, new, ["k"], ["s"]).collect()}
    assert rows == {1: "U", 2: "U"}


def test_incremental_refresh_handles_group_moves_and_births(spark):
    """Updates that MOVE a row between groups subtract from the old
    group and add to the new; a group emptied by deletes disappears; a
    never-seen group appears — and the refreshed aggregate equals
    re-aggregating the new snapshot."""
    from etl_his_spark.operators.merge import (
        changelog,
        incremental_group_refresh,
    )

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
        "k long, grp string, cents long",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),   # unchanged
            (2, "b", 20),   # group move a -> b
            # 3 deleted -> but b gains 2, so b survives
            (4, "c", 40),   # new group c born
        ],
        "k long, grp string, cents long",
    )
    old_agg = old.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total")
    )
    changes = changelog(old, new, ["k"], ["grp", "cents"], include_old=True)
    got = {
        r["grp"]: (r["n"], r["total"])
        for r in incremental_group_refresh(
            old_agg, changes, "grp", "cents"
        ).collect()
    }
    want = {
        r["grp"]: (r["n"], r["total"])
        for r in new.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total"))
        .collect()
    }
    assert got == want == {"a": (1, 10), "b": (1, 20), "c": (1, 40)}


def test_incremental_refresh_group_death(spark):
    """Deleting every row of a group removes the group entirely."""
    from etl_his_spark.operators.merge import (
        changelog,
        incremental_group_refresh,
    )

    old = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 7)], "k long, grp string, cents long"
    )
    new = spark.createDataFrame([(2, "b", 7)], "k long, grp string, cents long")
    old_agg = old.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total")
    )
    changes = changelog(old, new, ["k"], ["grp", "cents"], include_old=True)
    got = {
        r["grp"]: (r["n"], r["total"])
        for r in incremental_group_refresh(
            old_agg, changes, "grp", "cents"
        ).collect()
    }
    assert got == {"b": (1, 7)}
