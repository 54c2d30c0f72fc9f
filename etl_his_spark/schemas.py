"""Explicit StructTypes — schema is declared, never inferred.

Mirrors the reference's fixed-schema stance: the extraction schema is
implied by SELECT aliases (src/Command/EtlHisTurnosCommand.php:255-291)
and the target schema is explicit DDL
(src/Service/PostgresSchemaBuilder.php:60-113). SURVEY.md §1.2 maps each
reference type to the Spark type used here.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Driver-provided TPC-H-ish tables (/root/testdata/sf*/, see TESTDATA.md)
# ---------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), False),
        T.StructField("r_name", T.StringType(), True),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), False),
        T.StructField("n_name", T.StringType(), True),
        T.StructField("n_regionkey", T.IntegerType(), True),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), False),
        T.StructField("c_name", T.StringType(), True),
        T.StructField("c_nationkey", T.IntegerType(), True),
        T.StructField("c_acctbal", T.DoubleType(), True),
        T.StructField("c_mktsegment", T.StringType(), True),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), False),
        T.StructField("s_name", T.StringType(), True),
        T.StructField("s_nationkey", T.IntegerType(), True),
        T.StructField("s_acctbal", T.DoubleType(), True),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), False),
        T.StructField("p_name", T.StringType(), True),
        T.StructField("p_brand", T.StringType(), True),
        T.StructField("p_type", T.StringType(), True),
        T.StructField("p_size", T.IntegerType(), True),
        T.StructField("p_retailprice", T.DoubleType(), True),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
        T.StructField("o_orderpriority", T.StringType(), True),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), True),
        T.StructField("l_suppkey", T.LongType(), True),
        T.StructField("l_linenumber", T.IntegerType(), True),
        T.StructField("l_quantity", T.DoubleType(), True),
        T.StructField("l_extendedprice", T.DoubleType(), True),
        T.StructField("l_discount", T.DoubleType(), True),
        T.StructField("l_tax", T.DoubleType(), True),
        T.StructField("l_returnflag", T.StringType(), True),
        T.StructField("l_linestatus", T.StringType(), True),
        T.StructField("l_shipdate", T.TimestampType(), True),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---------------------------------------------------------------------------
# HIS-shaped source tables (FIXTURES.md §B; mirror the extraction SQL's
# sources, src/Command/EtlHisTurnosCommand.php:293-319)
# ---------------------------------------------------------------------------

_PRESTACION_SLOTS = ["IdPrestacionAsignada"] + [
    f"IdPrestacionRealizable{i:02d}" for i in range(1, 11)
]
PRESTACION_SLOT_COLUMNS = _PRESTACION_SLOTS

TURNOS = T.StructType(
    [
        T.StructField("Id", T.LongType(), False),
        T.StructField("IdRecurso", T.LongType(), True),
        T.StructField("IdServicio", T.LongType(), True),
        T.StructField("IdCentroAtencion", T.LongType(), True),
        T.StructField("IdPersona", T.LongType(), True),
        T.StructField("IdTurno_Estado", T.LongType(), True),
        T.StructField("IdUsuario_Otorgo", T.LongType(), True),
        T.StructField("IdTurno_TipoPrevisto", T.LongType(), True),
        T.StructField("FechaTurno", T.DateType(), True),
        # TIME(0): no stable TimeType in PySpark — 'HH:mm:ss' string
        # (SURVEY.md §1.2, PostgresSchemaBuilder.php:78)
        T.StructField("HoraTurno", T.StringType(), True),
        T.StructField("DuracionMinutos", T.IntegerType(), True),
        T.StructField("EsSobreTurno", T.BooleanType(), True),
        T.StructField("FechaAlta", T.TimestampType(), True),
    ]
    + [T.StructField(c, T.LongType(), True) for c in _PRESTACION_SLOTS]
)

PERSONAS = T.StructType(
    [
        T.StructField("Id", T.LongType(), False),
        T.StructField("Nombres", T.StringType(), True),
        T.StructField("Apellido", T.StringType(), True),
        T.StructField("Documento_Numero", T.StringType(), True),
    ]
)


def _catalog(name_col: str = "Nombre") -> T.StructType:
    return T.StructType(
        [
            T.StructField("Id", T.LongType(), False),
            T.StructField(name_col, T.StringType(), True),
        ]
    )


RECURSOS = T.StructType(
    [
        T.StructField("Id", T.LongType(), False),
        T.StructField("IdRecurso_Tipo", T.LongType(), True),
    ]
)
RECURSO_TIPOS = _catalog()
SERVICIOS = _catalog()
CENTROS_ATENCION = _catalog()
TURNO_ESTADOS = _catalog()
TURNO_TIPOS = _catalog()
PRESTACIONES = _catalog()

USUARIOS = T.StructType(
    [
        T.StructField("Id", T.LongType(), False),
        T.StructField("IdPersona", T.LongType(), True),
        T.StructField("NombreInicioSesion", T.StringType(), True),
    ]
)

ORDEN_DE_TRABAJO = T.StructType(
    [
        T.StructField("Id", T.LongType(), False),
        T.StructField("IdTurno", T.LongType(), True),
        T.StructField("IdEstado", T.LongType(), True),
    ]
)

INFORMES = T.StructType(
    [
        T.StructField("Id", T.LongType(), False),
        T.StructField("IdOrdenDeTrabajo", T.LongType(), True),
        T.StructField("IdEstadoActual", T.LongType(), True),
    ]
)

HIS_SCHEMAS: dict[str, T.StructType] = {
    "turnos": TURNOS,
    "Personas": PERSONAS,
    "Recursos": RECURSOS,
    "Recurso_Tipos": RECURSO_TIPOS,
    "Servicios": SERVICIOS,
    "CentrosAtencion": CENTROS_ATENCION,
    "Turno_Estados": TURNO_ESTADOS,
    "Usuarios": USUARIOS,
    "Turno_Tipos": TURNO_TIPOS,
    "Prestaciones": PRESTACIONES,
    "OrdenDeTrabajo": ORDEN_DE_TRABAJO,
    "Informes": INFORMES,
}

# ---------------------------------------------------------------------------
# Target analytical schema (PostgresSchemaBuilder.php:60-113)
# ---------------------------------------------------------------------------

PACIENTE = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("nombre", T.StringType(), True),
        T.StructField("apellido", T.StringType(), True),
        T.StructField("documento_identidad", T.StringType(), False),
        T.StructField("sexo_inferido", T.StringType(), True),
    ]
)

TURNO = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("paciente_id", T.LongType(), False),
        T.StructField("fecha", T.DateType(), True),
        T.StructField("hora", T.StringType(), True),
        T.StructField("duracion_minutos", T.IntegerType(), True),
        T.StructField("sobreturno", T.BooleanType(), True),
        T.StructField("estado", T.StringType(), True),
        T.StructField("fecha_alta", T.TimestampType(), True),
        T.StructField("usuario_alta", T.StringType(), True),
    ]
)

PRESTACION = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("nombre", T.StringType(), False),
    ]
)

PRESTACION_X_TURNO = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("turno_id", T.LongType(), False),
        T.StructField("prestacion_id", T.LongType(), False),
    ]
)
