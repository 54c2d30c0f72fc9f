"""HIS-shaped analogs on the driver's tables — gate-checked via DuckDB.

The literal HIS pipeline runs on HIS-shaped fixtures in tests/ (the
driver's DuckDB gate only has the TPC-H-ish tables), so these queries
re-create its distinctive SHAPES on orders/customer/lineitem/part:

- the multi-role + dead-left-join extraction (J1-J13 analog),
- the 11-positional-slot wide table and its U1 unpivot (J14-J24/U1),
- the full dim+fact+bridge derivation (D1/D2/K1/K2) over those slots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.unpivot import unpivot_slots
from ..registry import register
from ..sources.readers import read_table


# ---------------------------------------------------------------------------
# Extraction analog: inner joins + multi-role dim + DEAD left-join chain
# ---------------------------------------------------------------------------


@register(
    "his_extraction_shape",
    """
    SELECT t.o_orderkey AS turno_id,
           p.c_name AS paciente_nombre,
           n.n_name AS nacion,
           (n.n_name || ' ' || r.r_name) AS nacion_region,
           t.o_orderstatus AS estado
    FROM orders t
    JOIN customer p ON t.o_custkey = p.c_custkey
    JOIN nation n ON p.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    LEFT JOIN lineitem ot ON ot.l_orderkey = t.o_orderkey
        AND ot.l_linenumber <= 2
    LEFT JOIN part inf ON inf.p_partkey = ot.l_partkey
    """,
)
def his_extraction_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-J13 shape: fact ⋈ identity ⋈ broadcast catalogs + a dead
    left-join chain that projects NOTHING but fans out rows (lineitem is
    non-unique per order — the OrdenDeTrabajo hazard, SURVEY.md §4.1).
    The chain must not be eliminated: row multiplicity is the output."""
    t = read_table(spark, sf_dir, "orders")
    p = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    ot = read_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    inf = read_table(spark, sf_dir, "part")
    return (
        t.join(p, t.o_custkey == p.c_custkey)
        .join(F.broadcast(n), p.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(ot, ot.l_orderkey == t.o_orderkey, "left")
        .join(inf, inf.p_partkey == ot.l_partkey, "left")
        .select(
            F.col("o_orderkey").alias("turno_id"),
            F.col("c_name").alias("paciente_nombre"),
            F.col("n_name").alias("nacion"),
            F.concat(F.col("n_name"), F.lit(" "), F.col("r_name")).alias(
                "nacion_region"
            ),
            F.col("o_orderstatus").alias("estado"),
        )
    )


# ---------------------------------------------------------------------------
# 11-slot wide table (built from lineitem) + U1 unpivot round trip
# ---------------------------------------------------------------------------

_N = 11


def _wide_slots_sql() -> str:
    cases = ",\n           ".join(
        f"MAX(CASE WHEN l_linenumber = {i + 1} THEN l_partkey END) AS slot{i:02d}"
        for i in range(_N)
    )
    unions = "\n    UNION ALL\n".join(
        f"    SELECT orden_id, {i} AS slot, slot{i:02d} AS prestacion_fk "
        f"FROM wide WHERE slot{i:02d} IS NOT NULL"
        for i in range(_N)
    )
    return f"""
    -- MATERIALIZED: wide is read once per slot (11 UNION ALL branches);
    -- inlined, DuckDB re-runs the lineitem pivot per branch (the
    -- triangle-oracle lesson, r10).
    WITH wide AS MATERIALIZED (
        SELECT l_orderkey AS orden_id,
           {cases}
        FROM lineitem
        GROUP BY l_orderkey
    )
{unions}
    """


def _wide_slots_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot lineitem into the reference's positional-slot wide shape:
    slot k = partkey of line number k+1 (NULL when absent), exactly like
    IdPrestacionAsignada/IdPrestacionRealizable01..10."""
    l = read_table(spark, sf_dir, "lineitem")
    aggs = [
        F.max(
            F.when(F.col("l_linenumber") == i + 1, F.col("l_partkey"))
        ).alias(f"slot{i:02d}")
        for i in range(_N)
    ]
    return l.groupBy(F.col("l_orderkey").alias("orden_id")).agg(*aggs)


@register("his_unpivot_slots", _wide_slots_sql())
def his_unpivot_slots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 on the 11-slot wide shape: stack → (slot, fk) rows, NULLs
    dropped (Command.php:172-201). One generate node, no extra shuffle
    beyond the wide pivot's own groupBy."""
    wide = _wide_slots_df(spark, sf_dir)
    return unpivot_slots(
        wide,
        ["orden_id"],
        [f"slot{i:02d}" for i in range(_N)],
        slot_name="slot",
        value_name="prestacion_fk",
        drop_null=True,
    ).select("orden_id", "slot", "prestacion_fk")


@register(
    "his_bridge_derivation",
    f"""
    WITH slot_rows AS ({_wide_slots_sql()}),
    named AS (
        SELECT s.orden_id, s.slot,
               upper(trim(regexp_replace(p.p_name, '\\s+', ' ', 'g'))) AS nombre
        FROM slot_rows s JOIN part p ON s.prestacion_fk = p.p_partkey
    ),
    dim AS (
        SELECT nombre, row_number() OVER (ORDER BY nombre) AS prestacion_id
        FROM (SELECT DISTINCT nombre FROM named)
    )
    SELECT n.orden_id AS turno_id, d.prestacion_id, n.slot
    FROM named n JOIN dim d ON n.nombre = d.nombre
    """,
)
def his_bridge_derivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full bridge derivation: U1 unpivot → join dim ONCE (the inverted
    J14-J24) → D2 distinct cleaned names → K1 dense ids → K2 FK
    resolution. The complete prestacion/prestacion_x_turno path
    (Command.php:172-201) on driver tables."""
    from ..functions.text import limpiar_nombres
    from ..operators.surrogate import dense_ids_small, resolve_fk

    slot_rows = his_unpivot_slots(spark, sf_dir)
    part = read_table(spark, sf_dir, "part")
    named = (
        slot_rows.join(
            F.broadcast(part), slot_rows.prestacion_fk == part.p_partkey, "inner"
        )
        .select(
            "orden_id",
            "slot",
            limpiar_nombres("p_name").alias("nombre"),
        )
    )
    dim = dense_ids_small(
        named.select("nombre").distinct(), [F.col("nombre")], "prestacion_id"
    )
    bridge = resolve_fk(
        named, dim, ["nombre"], "prestacion_id", dim_id_col="prestacion_id"
    )
    return bridge.select(
        F.col("orden_id").alias("turno_id"), "prestacion_id", "slot"
    )
