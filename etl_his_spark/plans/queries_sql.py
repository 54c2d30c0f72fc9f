"""SQL-entry-point + TPC-H-style analytical queries.

``sql_entry_*`` queries run through the engine's SQL-text surface
(api.sql) — same Catalyst plans as the DataFrame API, proving both
entry points. The TPC-H-style shapes (Q3/Q5/Q10 analogs on the
available columns) stress join ordering, broadcast selection and
partial aggregation; money math is exact integer cents so the oracle
is hash-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..api import sql
from ..functions.gender import GENDER_LOOKUP_ROWS, inferir_sexo
from ..registry import register
from ..sources.readers import read_table

# Shared SQL text: the Spark side runs the SAME string through
# spark.sql; the oracle is the string itself (both are ANSI) — the
# only divergence allowed is none.

_Q5_STYLE = """
SELECT n.n_name AS nacion,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
            AS BIGINT)) AS DOUBLE) / 100 AS ingreso
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""

_Q3_STYLE = """
SELECT l.l_orderkey AS orden_id,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
            AS BIGINT)) AS DOUBLE) / 100 AS ingreso,
       CAST(o.o_orderdate AS DATE) AS fecha
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
ORDER BY SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
         DESC, l.l_orderkey
LIMIT 20
"""

_Q10_STYLE = """
SELECT c.c_custkey AS cliente_key, n.n_name AS nacion,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100)
            AS BIGINT)) AS DOUBLE) / 100 AS perdida
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, n.n_name
ORDER BY SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
         DESC, c.c_custkey
LIMIT 20
"""


@register("sql_q5_national_revenue", _Q5_STYLE)
def sql_q5_national_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape through the SQL-text entry point: 6-table join,
    region filter pushed to the broadcast dim, exact-cents revenue."""
    return sql(spark, sf_dir, _Q5_STYLE)


@register("sql_q3_shipping_priority", _Q3_STYLE)
def sql_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → top-k with
    deterministic tie-break (TakeOrderedAndProject, no global sort)."""
    return sql(spark, sf_dir, _Q3_STYLE)


@register("sql_q10_returned_items", _Q10_STYLE)
def sql_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: fact filter + customer rollup + top-k."""
    return sql(spark, sf_dir, _Q10_STYLE)


# ---------------------------------------------------------------------------
# F4 gender inference as an oracle-checked query: the dictionary is a
# constant table, so the oracle inlines it as VALUES and both sides
# derive the same pseudo-name per customer (deterministic modulo pick).
# ---------------------------------------------------------------------------

_GENDER_VALUES = ",\n        ".join(
    f"({i}, '{name}', '{label}')"
    for i, (name, label) in enumerate(GENDER_LOOKUP_ROWS)
)

_GENDER_ORACLE = f"""
    WITH dict(idx, first_name, gender) AS (
        VALUES {_GENDER_VALUES}
    ),
    named AS (
        SELECT c_custkey AS cliente_key,
               (SELECT first_name FROM dict
                WHERE idx = c_custkey % {len(GENDER_LOOKUP_ROWS) + max(8, len(GENDER_LOOKUP_ROWS) // 8)}) AS primer_nombre
        FROM customer
    )
    SELECT n.cliente_key, n.primer_nombre, d.gender AS sexo_inferido
    FROM named n LEFT JOIN dict d ON n.primer_nombre = d.first_name
"""


@register("gender_inference", _GENDER_ORACLE)
def gender_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 (Command.php:359-375) as a broadcast lookup join.

    Each customer gets a deterministic pseudo first-name from the
    dictionary (modulo over a range ~12.5% wider than the dictionary,
    so ~11% of rows miss and yield NULL — the unknown-name path)."""
    c = read_table(spark, sf_dir, "customer")
    n = len(GENDER_LOOKUP_ROWS)
    dict_df = spark.createDataFrame(
        [(i, name) for i, (name, _) in enumerate(GENDER_LOOKUP_ROWS)],
        "idx long, primer_nombre string",
    )
    named = (
        c.select(
            F.col("c_custkey").alias("cliente_key"),
            (F.col("c_custkey") % (n + max(8, n // 8))).alias("idx"),
        )
        .join(F.broadcast(dict_df), "idx", "left")
        .select("cliente_key", "primer_nombre")
    )
    return inferir_sexo(named, "primer_nombre").select(
        "cliente_key", "primer_nombre", "sexo_inferido"
    )
