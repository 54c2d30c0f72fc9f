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
