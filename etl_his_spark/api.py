"""SQL-text API — the engine accepts SQL, not just DataFrames.

The reference's user-facing query surface is SQL text executed by a
remote engine (src/Command/EtlHisTurnosCommand.php:254-322); here the
same surface is served by Catalyst: register the tables as temp views
and run any ANSI SQL against them. DataFrame and SQL plans compile to
identical logical plans, so every optimizer property (pushdown,
broadcast, AQE) holds for both entry points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.readers import read_table

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Expose the scale-factor tables as temp views for SQL queries,
    plus the engine's named functions (limpiar_nombres, primer_nombre,
    es_no_vacio, gender_lookup)."""
    from .functions.registry import register_functions

    register_functions(spark)
    for name in tables or TESTDATA_TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run SQL text against the engine (views registered on demand)."""
    register_views(spark, sf_dir)
    return spark.sql(query)
