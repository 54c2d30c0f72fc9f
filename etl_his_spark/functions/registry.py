"""Named function registry — F1/F3/F4 callable from SQL text.

The reference's 'UDFs' are private PHP methods (SURVEY.md §2.9); this
engine exposes them as named SQL functions so the SQL entry point
(api.sql) can use them like builtins. Spark 4 SQL UDFs (CREATE
FUNCTION ... RETURN <expr>) stay pure Catalyst expressions — same
codegen as the Column versions, zero Python.

F4 (gender) is data, not an expression — it registers as a temp VIEW
(the dictionary) plus the documented join idiom.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .gender import gender_lookup_df

SQL_FUNCTIONS: dict[str, str] = {
    # F1 — mirrors functions.text.limpiar_nombres exactly
    "limpiar_nombres": r"""
        CREATE OR REPLACE TEMPORARY FUNCTION limpiar_nombres(s STRING)
        RETURNS STRING
        RETURN upper(trim(regexp_replace(s, '\\s+', ' ')))
    """,
    # F3 — first token of a cleaned name
    "primer_nombre": r"""
        CREATE OR REPLACE TEMPORARY FUNCTION primer_nombre(s STRING)
        RETURNS STRING
        RETURN substring_index(s, ' ', 1)
    """,
    # P3/F6 — non-empty predicate
    "es_no_vacio": r"""
        CREATE OR REPLACE TEMPORARY FUNCTION es_no_vacio(s STRING)
        RETURNS BOOLEAN
        RETURN s IS NOT NULL AND trim(s) <> ''
    """,
}


def register_functions(spark: SparkSession) -> None:
    """Install the named functions + the gender dictionary view."""
    for ddl in SQL_FUNCTIONS.values():
        spark.sql(ddl)
    gender_lookup_df(spark).createOrReplaceTempView("gender_lookup")
