"""Compaction + manifest-publish protocol tests.

Covers the small-file story: streaming appends / repeated republishes
accumulate files; compact_published rewrites ONE table into few files
while every other table carries over metadata-only, and retention
never deletes a staging dir the manifest still references.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from etl_his_spark.sources.writers import (
    compact_published,
    prune_old_publishes,
    publish_atomic,
    read_published,
    resolve_current,
    resolve_manifest,
)


def _parquet_files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if not os.path.basename(f).startswith(("_", "."))
    ]


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    root = str(tmp_path / "pub")
    # 40 shuffle partitions -> many small files
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2).repartition(40)
    publish_atomic({"t": df, "other": spark.range(5)}, root)
    before_files = _parquet_files(resolve_manifest(root)["t"])
    assert len(before_files) >= 40
    before_rows = sorted(
        tuple(r) for r in read_published(spark, root, "t").collect()
    )

    dst = compact_published(spark, root, "t", target_bytes=1 << 30)
    assert len(_parquet_files(dst)) == 1
    after_rows = sorted(
        tuple(r) for r in read_published(spark, root, "t").collect()
    )
    assert after_rows == before_rows


def test_compact_carries_other_tables_metadata_only(spark, tmp_path):
    root = str(tmp_path / "pub")
    first_staging = publish_atomic(
        {"a": spark.range(100), "b": spark.range(7)}, root
    )
    compact_published(spark, root, "a", target_bytes=1 << 30)

    manifest = resolve_manifest(root)
    # b was NOT rewritten: still points into the first staging dir
    assert manifest["b"].startswith(first_staging)
    assert manifest["a"].startswith(resolve_current(root))
    assert read_published(spark, root, "b").count() == 7

    # retention must not delete the old staging while b lives there
    removed = prune_old_publishes(root, keep=0)
    assert first_staging not in removed
    assert read_published(spark, root, "b").count() == 7


def test_legacy_plain_pointer_still_readable(spark, tmp_path):
    root = str(tmp_path / "pub")
    staging = publish_atomic({"t": spark.range(12)}, root)
    # rewrite the pointer in the legacy bare-path format
    with open(os.path.join(root, "_CURRENT"), "w", encoding="utf-8") as fh:
        fh.write(staging)
    assert resolve_current(root) == staging
    assert read_published(spark, root, "t").count() == 12


def test_compact_partitioned_table(spark, tmp_path):
    root = str(tmp_path / "pub")
    df = (
        spark.range(0, 2_000)
        .withColumn("bucket", (F.col("id") % 4).cast("int"))
        .repartition(16)
    )
    publish_atomic({"t": df}, root, partition_by={"t": ["bucket"]})
    dst = compact_published(
        spark, root, "t", target_bytes=1 << 30, partition_by=["bucket"]
    )
    # partition layout preserved, rows intact
    assert sorted(os.listdir(dst) + []).count("bucket=0") + sorted(
        os.listdir(dst)
    ).count("bucket=1") >= 0
    got = read_published(spark, root, "t")
    assert got.count() == 2_000
    assert {r.bucket for r in got.select("bucket").distinct().collect()} == {
        0, 1, 2, 3,
    }
    assert any(d.startswith("bucket=") for d in os.listdir(dst))


def test_time_travel_across_publishes(spark, tmp_path):
    from etl_his_spark.sources.writers import list_publishes, read_published_at

    root = str(tmp_path / "pub")
    publish_atomic({"t": spark.range(10)}, root)
    publish_atomic({"t": spark.range(99)}, root)
    history = list_publishes(root)
    assert len(history) == 2
    first, second = history[0]["token"], history[1]["token"]
    assert read_published_at(spark, root, "t", first).count() == 10
    assert read_published_at(spark, root, "t", second).count() == 99
    # current == newest snapshot
    assert read_published(spark, root, "t").count() == 99
    # compaction is a commit in the history too
    compact_published(spark, root, "t", target_bytes=1 << 30)
    assert len(list_publishes(root)) == 3
    assert read_published_at(spark, root, "t", first).count() == 10


def test_prune_drops_unreadable_snapshots(spark, tmp_path):
    from etl_his_spark.sources.writers import list_publishes

    root = str(tmp_path / "pub")
    publish_atomic({"t": spark.range(10)}, root)
    publish_atomic({"t": spark.range(20)}, root)
    publish_atomic({"t": spark.range(30)}, root)
    assert len(list_publishes(root)) == 3
    removed = prune_old_publishes(root, keep=2)  # current counts toward keep
    assert len(removed) == 1
    left = list_publishes(root)
    assert len(left) == 2  # pruned snapshot's manifest dropped with it
    assert read_published(spark, root, "t").count() == 30


def test_partition_pruning_reads_only_matching_dirs(spark, sf_dir, tmp_path):
    """write_table(partition_by=...) is the reference's index analog
    (Builder.php:90 turno(fecha) index) — prove the pruning actually
    happens: a filtered read touches ONLY the matching partition dirs."""
    from etl_his_spark.sources.writers import write_table

    out = str(tmp_path / "orders_by_year")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_table(
        o.withColumn("anio", F.year("o_orderdate")), out, partition_by=["anio"]
    )
    pruned = spark.read.parquet(out).filter(F.col("anio") == 1996)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the filter must land in the scan's PartitionFilters (dir-level
    # pruning), not as a post-scan data filter
    assert "PartitionFilters" in plan and "anio" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    expect = (
        o.filter(F.year("o_orderdate") == 1996).count()
    )
    assert pruned.count() == expect and expect > 0
    # and the dataset genuinely has more than one year on disk
    assert len([d for d in os.listdir(out) if d.startswith("anio=")]) > 1


def test_dynamic_partition_pruning_on_fact_dim_join(spark, sf_dir, tmp_path):
    """DPP: joining a partitioned fact to a FILTERED dim must prune the
    fact's partitions at runtime via the dim's keys (the mechanism that
    turns a date-dim filter into a fact scan skip at 100 TB)."""
    from etl_his_spark.sources.writers import write_table

    out = str(tmp_path / "orders_by_year")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_table(
        o.withColumn("anio", F.year("o_orderdate")), out, partition_by=["anio"]
    )
    fact = spark.read.parquet(out)
    dim = (
        o.select(F.year("o_orderdate").alias("anio"))
        .distinct()
        .filter(F.col("anio").isin(1996, 1997))
    )
    joined = fact.join(dim, "anio")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "DynamicPruning" in plan
    expect = o.filter(F.year("o_orderdate").isin(1996, 1997)).count()
    assert joined.count() == expect and expect > 0
