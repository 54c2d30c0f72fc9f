"""Scale-realistic HIS-shaped source tables derived from the testdata.

The literal HIS pipeline (``plans.his_pipeline.run_pipeline`` —
extract→transform→atomic 4-table publish, reference parity with
EtlHisTurnosCommand.php:104-213) is correctness-tested on hand-written
fixtures in ``tests/his_fixtures.py``. Those fixtures are a few dozen
rows: perfect for pinning semantics, useless for a wall-time number.

This module derives the full ``schemas.HIS_SCHEMAS`` table set from
the driver-generated TPC-H-ish parquet at any scale factor, purely
deterministically (key arithmetic only, no randomness), so the
flagship reference-parity path has a tracked perf number at sf0.1
(r7 verdict item 7). Mapping:

- ``Personas``   ← customer (patients) ∪ supplier (user-persons, ids
  offset by 10^9 so the two roles never collide)
- ``turnos``     ← orders: one appointment per order; the 11
  positional prestación slots (Command.php:309-319) are keyed off
  o_orderkey with a deterministic NULL/blank pattern so unpivot and
  non-empty-filter paths do real work
- ``OrdenDeTrabajo``/``Informes`` ← lineitem (line 1-2): reproduces
  the dead-left-join fan-out hazard (SURVEY.md §4.1) at scale
- ``Prestaciones`` ← part (first 200 keys, upper-cased names with
  whitespace noise so limpiarNombres has something to clean)
- small catalogs (Recursos, Servicios, …) ← generated dims sized like
  a hospital's (50 resources, 20 services, …)

Everything is lazy DataFrames over the parquet scans — building the
dict costs nothing; consumers pay only for what they join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import PRESTACION_SLOT_COLUMNS
from .readers import read_table

# Catalog sizes (hospital-plausible, all broadcast-class).
_N_RECURSOS = 50
_N_RECURSO_TIPOS = 5
_N_SERVICIOS = 20
_N_CENTROS = 10
_N_ESTADOS = 3
_N_TIPOS = 2
_N_PRESTACIONES = 200

_USER_PERSONA_OFFSET = 1_000_000_000


def _catalog(spark: SparkSession, n: int, prefix: str) -> DataFrame:
    return spark.range(1, n + 1).select(
        F.col("id").alias("Id"),
        F.concat(F.lit(prefix + " "), F.col("id").cast("string")).alias(
            "Nombre"
        ),
    )


def his_tables_from_testdata(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """The ``extract_wide`` input dict at testdata scale."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    part = read_table(spark, sf_dir, "part")
    lineitem = read_table(spark, sf_dir, "lineitem")

    ok = F.col("o_orderkey")
    # 11 slot columns: slot i is NULL when (o_orderkey + i) % 3 == 0
    # (so P3's non-empty filter drops ~a third of slots) else a
    # prestación id in 1.._N_PRESTACIONES.
    slots = [
        F.when(
            (ok + i) % 3 == 0, F.lit(None).cast("long")
        ).otherwise((ok * 7 + i * 13) % _N_PRESTACIONES + 1).alias(col)
        for i, col in enumerate(PRESTACION_SLOT_COLUMNS)
    ]
    n_users = 100  # plausible count of scheduling users
    turnos = orders.select(
        ok.alias("Id"),
        (ok % _N_RECURSOS + 1).alias("IdRecurso"),
        (ok % _N_SERVICIOS + 1).alias("IdServicio"),
        (ok % _N_CENTROS + 1).alias("IdCentroAtencion"),
        F.col("o_custkey").alias("IdPersona"),
        (ok % _N_ESTADOS + 1).alias("IdTurno_Estado"),
        (ok % n_users + 1).alias("IdUsuario_Otorgo"),
        (ok % _N_TIPOS + 1).alias("IdTurno_TipoPrevisto"),
        F.to_date("o_orderdate").alias("FechaTurno"),
        F.format_string("%02d:%02d:00", (ok % 10 + 8), (ok % 4) * 15).alias(
            "HoraTurno"
        ),
        ((ok % 4 + 1) * 15).cast("int").alias("DuracionMinutos"),
        (ok % 7 == 0).alias("EsSobreTurno"),
        (F.col("o_orderdate") - F.make_interval(days=F.lit(1)))
        .cast("timestamp")
        .alias("FechaAlta"),
        *slots,
    )

    pacientes = customer.select(
        F.col("c_custkey").alias("Id"),
        # whitespace + case noise exercises limpiarNombres (F1)
        F.concat(F.lit("  "), F.lower("c_name")).alias("Nombres"),
        F.concat(F.col("c_mktsegment"), F.lit("  ")).alias("Apellido"),
        F.col("c_custkey").cast("string").alias("Documento_Numero"),
    )
    user_personas = supplier.select(
        (F.col("s_suppkey") + _USER_PERSONA_OFFSET).alias("Id"),
        F.col("s_name").alias("Nombres"),
        F.concat(F.lit("NAC"), F.col("s_nationkey").cast("string")).alias(
            "Apellido"
        ),
        (F.col("s_suppkey") + _USER_PERSONA_OFFSET)
        .cast("string")
        .alias("Documento_Numero"),
    )
    personas = pacientes.unionByName(user_personas)

    usuarios = spark.range(1, n_users + 1).select(
        F.col("id").alias("Id"),
        (
            (F.col("id") - 1) % 100 + 1 + _USER_PERSONA_OFFSET
        ).alias("IdPersona"),
        F.concat(F.lit("user"), F.col("id").cast("string")).alias(
            "NombreInicioSesion"
        ),
    )

    lk = F.col("l_orderkey")
    ot = lineitem.filter(F.col("l_linenumber") <= 2).select(
        (lk * 10 + F.col("l_linenumber")).alias("Id"),
        lk.alias("IdTurno"),
        (lk % _N_ESTADOS + 1).alias("IdEstado"),
    )
    informes = lineitem.filter(F.col("l_linenumber") == 1).select(
        (lk * 100 + 1).alias("Id"),
        (lk * 10 + 1).alias("IdOrdenDeTrabajo"),
        (lk % _N_ESTADOS + 1).alias("IdEstadoActual"),
    )

    prestaciones = part.filter(F.col("p_partkey") <= _N_PRESTACIONES).select(
        F.col("p_partkey").alias("Id"),
        # trailing blanks: D2's trimmed-distinct has real work to do
        F.concat(F.upper("p_name"), F.lit("  ")).alias("Nombre"),
    )

    recursos = spark.range(1, _N_RECURSOS + 1).select(
        F.col("id").alias("Id"),
        (F.col("id") % _N_RECURSO_TIPOS + 1).alias("IdRecurso_Tipo"),
    )

    return {
        "turnos": turnos,
        "Personas": personas,
        "Recursos": recursos,
        "Recurso_Tipos": _catalog(spark, _N_RECURSO_TIPOS, "TIPO"),
        "Servicios": _catalog(spark, _N_SERVICIOS, "SERVICIO"),
        "CentrosAtencion": _catalog(spark, _N_CENTROS, "CENTRO"),
        "Turno_Estados": _catalog(spark, _N_ESTADOS, "ESTADO"),
        "Usuarios": usuarios,
        "Turno_Tipos": _catalog(spark, _N_TIPOS, "TIPO_TURNO"),
        "Prestaciones": prestaciones,
        "OrdenDeTrabajo": ot,
        "Informes": informes,
    }
