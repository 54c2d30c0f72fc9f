"""Incremental-load shape as a gate query.

The full pipeline is full-reload (the reference's semantics); the
incremental twin (P4 existence probe as left-anti + id continuation)
is exercised here on driver tables: 'existing' = the dimension built
from the first half of the key space, 'incoming' = everything; output
= only the genuinely new keys, with surrogate ids continuing after the
existing maximum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.surrogate import dense_ids_small
from ..registry import register
from ..sources.readers import read_table


@register(
    "incremental_new_keys",
    """
    WITH existing AS (
        SELECT c_custkey,
               row_number() OVER (ORDER BY c_custkey) AS id
        FROM customer WHERE c_custkey % 2 = 0
    ),
    incoming AS (SELECT DISTINCT c_custkey, c_name FROM customer),
    misses AS (
        SELECT i.c_custkey, i.c_name
        FROM incoming i
        WHERE NOT EXISTS (
            SELECT 1 FROM existing e WHERE e.c_custkey = i.c_custkey
        )
    )
    SELECT row_number() OVER (ORDER BY c_custkey)
             + (SELECT max(id) FROM existing) AS id,
           c_custkey AS cliente_key, c_name AS nombre_raw
    FROM misses
    """,
)
def incremental_new_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dimension load: left-anti against the existing dim,
    fresh ids continuing after max(existing.id) — the set-oriented form
    of the reference's per-row probe-then-insert (Command.php:130-146)."""
    c = read_table(spark, sf_dir, "customer")
    existing = dense_ids_small(
        c.filter(F.col("c_custkey") % 2 == 0).select("c_custkey"),
        [F.col("c_custkey")],
        "id",
    )
    incoming = c.select("c_custkey", "c_name").distinct()
    misses = incoming.join(existing.select("c_custkey"), "c_custkey", "left_anti")
    start = existing.agg(F.max("id")).first()[0] or 0
    return dense_ids_small(misses, [F.col("c_custkey")], "id").select(
        (F.col("id") + F.lit(start)).alias("id"),
        F.col("c_custkey").alias("cliente_key"),
        F.col("c_name").alias("nombre_raw"),
    )
