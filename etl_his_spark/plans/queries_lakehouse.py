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
