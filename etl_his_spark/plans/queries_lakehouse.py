"""Row-level maintenance gate queries: MERGE upsert/delete and SCD2.

The update/delete batches are derived deterministically from the
orders table itself, so both engines construct identical inputs and
the merged outputs hash-compare exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.merge import merge_delete, merge_upsert, scd2_from_events
from ..registry import register
from ..sources.readers import read_table

# Update batch: every 7th order gets a 10% price bump (exact cents);
# plus synthetic NEW orders (key shifted past the key space) from every
# 1000th order. Whole-row schema: (key, status, totalprice).
_UPDATES_CTE = """
    updates AS (
        SELECT o_orderkey,
               'X' AS o_orderstatus,
               CAST(CAST(ROUND(o_totalprice * 110) AS BIGINT) AS DOUBLE) / 100
                 AS o_totalprice
        FROM orders WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey + 100000000, 'N', o_totalprice
        FROM orders WHERE o_orderkey % 1000 = 1
    )
"""


@register(
    "merge_upsert_orders",
    f"""
    WITH {_UPDATES_CTE}
    SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
    FROM orders o
    WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM updates)
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM updates
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (update-or-insert by key) as one anti join
    + union — the incremental-load verb the reference's full-reload
    design lacks. The plan is a single hash anti-join keyed on the
    merge key; with a small daily delta the anti join broadcasts."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    bump = (
        F.round(F.col("o_totalprice") * 110).cast("long").cast("double") / 100
    )
    updates = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            F.lit("X").alias("o_orderstatus"),
            bump.alias("o_totalprice"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 1000 == 1).select(
                (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                F.col("o_totalprice"),
            )
        )
    )
    return merge_upsert(o, updates, ["o_orderkey"])


@register(
    "merge_delete_orders",
    """
    SELECT o_orderkey, o_custkey
    FROM orders
    WHERE NOT (o_orderkey % 13 = 0 AND o_orderstatus = 'F')
    """,
)
def merge_delete_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-wise DELETE (GDPR-style row retraction) as an anti join:
    drop every 13th finished order."""
    o = read_table(spark, sf_dir, "orders")
    deletes = o.filter(
        (F.col("o_orderkey") % 13 == 0) & (F.col("o_orderstatus") == "F")
    )
    return merge_delete(
        o.select("o_orderkey", "o_custkey"), deletes, ["o_orderkey"]
    ).select("o_orderkey", "o_custkey")


@register(
    "scd2_customer_priority",
    """
    SELECT o_custkey,
           o_orderpriority,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS valid_to
    FROM orders
    """,
)
def scd2_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 SCD derivation: each order is a version of the
    customer's priority attribute; validity runs until the next
    version (NULL = current). One lead() window per customer —
    parallel across the dimension, the standard warehouse history
    build."""
    o = read_table(spark, sf_dir, "orders")
    return scd2_from_events(
        o, "o_custkey", ["o_orderpriority"], "o_orderdate", "o_orderkey"
    )


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------

from ..operators.zorder import (  # noqa: E402
    interleave_bits_sql,
    value_bin_sql,
    zorder_keys,
)

_ZX = value_bin_sql("o_totalprice", "xmin", "xmax")
_ZY = value_bin_sql("o_days", "ymin", "ymax")


@register(
    "lakehouse_zorder",
    f"""
    WITH d AS (
        SELECT o_orderkey, o_totalprice,
               datediff('day', DATE '1970-01-01', o_orderdate) AS o_days
        FROM orders
    ),
    ext AS (
        SELECT min(o_totalprice) AS xmin, max(o_totalprice) AS xmax,
               min(o_days) AS ymin, max(o_days) AS ymax
        FROM d
    ),
    b AS (
        SELECT o_orderkey, {_ZX} AS x_bin, {_ZY} AS y_bin FROM d, ext
    )
    SELECT o_orderkey, x_bin, y_bin,
           {interleave_bits_sql("x_bin", "y_bin")} AS zval
    FROM b
    """,
)
def lakehouse_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (price, order-date):
    value-range bins interleaved bitwise. The oracle runs the LITERAL
    same bin/interleave SQL (shared builder), so parity is by
    construction. See operators/zorder.py for the layout rationale;
    ``zorder_file_ids`` + tests/test_zorder.py show the 2-D pruning
    win over row-order layout."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.expr("datediff(o_orderdate, DATE '1970-01-01')").alias("o_days"),
    )
    return zorder_keys(o, "o_totalprice", "o_days").select(
        "o_orderkey", "x_bin", "y_bin", "zval"
    )


@register(
    "table_diff_changelog",
    """
    WITH old AS (
        SELECT o_orderkey AS k, o_orderstatus AS estado,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    new AS (
        -- deterministic next snapshot: %97 keys deleted, %13 keys
        -- repriced (+150 cents), %31 keys cloned as fresh inserts
        SELECT k, estado,
               CASE WHEN k % 13 = 0 THEN cents + 150 ELSE cents END AS cents
        FROM old WHERE k % 97 <> 0
        UNION ALL
        SELECT k + 10000000, estado, cents FROM old WHERE k % 31 = 0
    )
    SELECT CASE WHEN o.k IS NULL THEN 'I'
                WHEN n.k IS NULL THEN 'D'
                ELSE 'U' END AS op,
           COALESCE(n.k, o.k) AS o_orderkey,
           CASE WHEN n.k IS NULL THEN o.estado ELSE n.estado END AS estado,
           CASE WHEN n.k IS NULL THEN o.cents ELSE n.cents END AS cents
    FROM new n FULL OUTER JOIN old o ON n.k = o.k
    WHERE o.k IS NULL OR n.k IS NULL
       OR n.estado IS DISTINCT FROM o.estado
       OR n.cents IS DISTINCT FROM o.cents
    """,
)
def table_diff_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two table snapshots: one co-partitioned full-outer
    join emitting only the |changes|-sized I/U/D feed (inserts/updates
    carry the new payload, deletes the old) — what an incremental
    downstream refresh consumes instead of re-reading the table. The
    "next snapshot" is derived deterministically from orders (keys
    %97 deleted, %13 repriced, %31 cloned as inserts) so the oracle
    reproduces it exactly; the digest-based change probe in
    ``operators/merge.changelog`` must agree with the oracle's direct
    column comparison."""
    from ..operators.merge import changelog

    old = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_orderstatus").alias("estado"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    k = F.col("o_orderkey")
    new = old.filter(k % 97 != 0).withColumn(
        "cents",
        F.when(k % 13 == 0, F.col("cents") + 150).otherwise(F.col("cents")),
    ).unionByName(
        old.filter(k % 31 == 0).withColumn("o_orderkey", k + 10000000)
    )
    return changelog(old, new, ["o_orderkey"], ["estado", "cents"])


@register(
    "schema_evolution_read",
    """
    WITH b1 AS (
        SELECT o_orderpriority AS prioridad,
               CAST(NULL AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 2 = 0
    ),
    b2 AS (
        SELECT o_orderpriority AS prioridad,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 2 = 1
    ),
    unioned AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2)
    SELECT prioridad,
           count(*) AS n_rows,
           CAST(count(cents) AS BIGINT) AS n_with_cents,
           CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS total_cents
    FROM unioned
    GROUP BY 1
    """,
)
def schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across file batches: batch 1 is written
    WITHOUT the cents column, batch 2 (a later pipeline version) adds
    it; a single ``mergeSchema`` read unifies them — old rows surface
    NULL for the new column instead of poisoning the table. This is
    the on-disk reality of any long-lived 100 TB dataset (columns
    arrive mid-life; a rewrite of history is not an option). The gate
    hash-checks the merged read end to end: row counts per group, how
    many rows carry the new column, and its sum.

    mergeSchema is a FOOTER-ONLY operation (schema union across file
    footers at planning time, per-file projection at scan time) — no
    data is rewritten, reading stays embarrassingly parallel.

    WRITE-EFFECTFUL: writes both batches under the managed per-process
    temp root, overwriting per invocation.
    """
    import os

    from .queries_misc import _publish_gate_root

    root = os.path.join(_publish_gate_root(), "evolved")
    orders = read_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    v1 = orders.filter(k % 2 == 0).select(
        F.col("o_orderpriority").alias("prioridad")
    )
    v2 = orders.filter(k % 2 == 1).select(
        F.col("o_orderpriority").alias("prioridad"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    v1.write.mode("overwrite").parquet(os.path.join(root, "batch=1"))
    v2.write.mode("overwrite").parquet(os.path.join(root, "batch=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "batch=1"), os.path.join(root, "batch=2")
    )
    return merged.groupBy("prioridad").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("cents").alias("n_with_cents"),
        F.coalesce(F.sum("cents"), F.lit(0)).cast("long").alias("total_cents"),
    )


@register(
    "incremental_agg_refresh",
    """
    WITH old AS (
        SELECT o_orderkey AS k, o_orderpriority AS grp,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    new AS (
        SELECT k, grp,
               CASE WHEN k % 13 = 0 THEN cents + 150 ELSE cents END AS cents
        FROM old WHERE k % 97 <> 0
        UNION ALL
        SELECT k + 10000000, grp, cents FROM old WHERE k % 31 = 0
    )
    SELECT grp, count(*) AS n, CAST(SUM(cents) AS BIGINT) AS total
    FROM new GROUP BY 1
    """,
)
def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-aggregate maintenance in O(delta): the old
    per-priority (count, cents) aggregate plus the snapshot changelog
    (same deterministic next-snapshot rule as ``table_diff_changelog``)
    refreshed through ± delta rows — while the ORACLE re-aggregates
    the new snapshot from scratch. Hash-equality of the two is the
    whole point: the incremental path must be indistinguishable from
    recomputation, at |changes| cost instead of |table| cost. Updates
    contribute −old/+new (group moves included), emptied groups
    disappear, new groups appear."""
    from ..operators.merge import changelog, incremental_group_refresh

    old = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey"),
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    k = F.col("o_orderkey")
    new = old.filter(k % 97 != 0).withColumn(
        "cents",
        F.when(k % 13 == 0, F.col("cents") + 150).otherwise(F.col("cents")),
    ).unionByName(
        old.filter(k % 31 == 0).withColumn("o_orderkey", k + 10000000)
    )
    old_agg = old.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("total")
    )
    changes = changelog(
        old, new, ["o_orderkey"], ["grp", "cents"], include_old=True
    )
    return incremental_group_refresh(old_agg, changes, "grp", "cents")


@register(
    "fact_scd2_asof_join",
    """
    WITH hist AS (
        SELECT o_custkey AS custkey,
               o_orderpriority AS prioridad,
               o_orderdate AS valid_from,
               lead(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS valid_to
        FROM orders
    )
    SELECT o.o_orderkey, o.o_custkey,
           (o.o_orderdate - INTERVAL 30 DAY)::DATE AS probe_date,
           h.prioridad AS prior_priority
    FROM orders o
    JOIN hist h
      ON h.custkey = o.o_custkey
     AND h.valid_from <= (o.o_orderdate - INTERVAL 30 DAY)::DATE
     AND (h.valid_to IS NULL
          OR (o.o_orderdate - INTERVAL 30 DAY)::DATE < h.valid_to)
    """,
)
def fact_scd2_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (AS OF) join of facts against a type-2 dimension
    history: each order probes the customer's priority AS IT WAS 30
    days earlier, matching the SCD2 validity interval
    ``[valid_from, valid_to)`` (NULL = current). The join is an EQUI
    join on the entity key with an interval residual — fan-out bounded
    by versions-per-entity, so it scales like any keyed join, no
    range-partitioning machinery needed. Probes before an entity's
    first version drop out (inner semantics), matching the oracle.
    The standard point-in-time-correctness device for training-data
    assembly (feature values as of label time, no leakage)."""
    from ..operators.merge import scd2_from_events

    o = read_table(spark, sf_dir, "orders")
    hist = scd2_from_events(
        o, "o_custkey", ["o_orderpriority"], "o_orderdate", "o_orderkey"
    ).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("prior_priority"),
        "valid_from",
        "valid_to",
    )
    probe = F.date_sub(F.col("o_orderdate"), 30)
    return (
        o.select("o_orderkey", "o_custkey", probe.alias("probe_date"))
        .join(
            hist,
            (F.col("o_custkey") == F.col("custkey"))
            & (F.col("valid_from") <= F.col("probe_date"))
            & (
                F.col("valid_to").isNull()
                | (F.col("probe_date") < F.col("valid_to"))
            ),
        )
        .select("o_orderkey", "o_custkey", "probe_date", "prior_priority")
    )
