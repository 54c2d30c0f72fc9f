"""Deterministic HIS-shaped fixtures (FIXTURES.md §B).

Pins every subtle semantic listed under "Required data properties":
duplicate patients with differing FechaAlta, dirty/accented/NULL names,
whitespace-padded documents, variable prestacion slot fill, the
OrdenDeTrabajo fan-out hazard, left-join misses, a NULL-Apellido user
person, and gender-inference inputs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from etl_his_spark.schemas import HIS_SCHEMAS, PRESTACION_SLOT_COLUMNS


def _d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def his_tables(spark: SparkSession) -> dict[str, DataFrame]:
    personas = [
        # patients (duplicate docs with different spellings + FechaAlta)
        (1, "  maría  josé ", "lópez", " 111 "),
        (2, "MARIA JOSE", " LÓPEZ ", "111"),
        (3, "juan carlos", "gómez", "222"),
        (4, None, "sinnombre", "333"),
        (5, "ana", None, "444"),
        (6, "ZZZUNKNOWN", "pérez", "555"),
        # user-persons (role #2 via Usuarios)
        (100, "Admin", "Uno", "900"),
        (101, "Admin", None, "901"),  # NULL Apellido → concat NULL (P2)
    ]
    usuarios = [(10, 100, "admin1"), (11, 101, "admin2")]
    recursos = [(1, 1), (2, 2)]
    recurso_tipos = [(1, "EQUIPO RX"), (2, "CONSULTORIO")]
    servicios = [(1, "RADIOLOGIA"), (2, "CLINICA")]
    centros = [(1, "CENTRAL"), (2, "ANEXO")]
    turno_estados = [(1, "ATENDIDO"), (2, "AUSENTE"), (3, "CANCELADO")]
    turno_tipos = [(1, "PROGRAMADO"), (2, "ESPONTANEO")]
    prestaciones = [
        (1, "RX TORAX"),
        (2, "  RX TORAX  "),   # same name after trim via different id
        (3, "ECOGRAFIA"),
        (4, "TOMOGRAFIA"),
        (5, "LABORATORIO"),
        (6, ""),               # blank → P3 must skip
    ]

    def turno(
        tid, persona, estado, fecha, hora, alta, slots: list[int | None]
    ):
        slots = (slots + [None] * 11)[:11]
        return tuple(
            [tid, 1, 1, 1, persona, estado, 10, 1, _d(fecha), hora, 30,
             tid % 2 == 0, _ts(alta)] + slots
        )

    turnos = [
        # doc 111 seen twice: t2 later FechaAlta → survivor is persona 2
        turno(1, 1, 1, "2024-01-10", "08:00:00", "2024-01-01T10:00:00",
              [1, 3, None, 4]),
        turno(2, 2, 2, "2024-01-11", "09:30:00", "2024-02-01T10:00:00",
              [2]),  # "  RX TORAX  " → dedups with "RX TORAX" after trim
        turno(3, 3, 1, "2024-02-01", "10:00:00", "2024-01-15T08:00:00",
              [None] * 11),  # zero slots
        turno(4, 4, 3, "2024-02-02", "11:15:00", "2024-01-20T09:00:00",
              [5, 5]),  # same prestacion twice in one turno
        turno(5, 5, 1, "2024-02-03", "12:00:00", "2024-01-25T09:30:00",
              [1, 2, 3, 4, 5, 1, 2, 3, 4, 5, 1]),  # all 11 slots
        turno(6, 6, 2, "2024-02-04", "13:45:00", "2024-01-26T11:00:00",
              [6, 3]),  # blank-name prestacion in slot 0 → skipped
        # user 11 (NULL-apellido person) grants this one
        tuple([7, 2, 2, 2, 3, 1, 11, 2, _d("2024-02-05"), "14:00:00", 45,
               False, _ts("2024-01-27T12:00:00")] + [3] + [None] * 10),
    ]

    # fan-out hazard: turno 1 has TWO OrdenDeTrabajo rows (dup IdTurno);
    # turno 2 has one; others none (left-join misses)
    ordenes = [(1, 1, 1), (2, 1, 2), (3, 2, 1)]
    # orden 1 has an informe; orden 2/3 none
    informes = [(1, 1, 2)]

    data = {
        "turnos": turnos,
        "Personas": personas,
        "Recursos": recursos,
        "Recurso_Tipos": recurso_tipos,
        "Servicios": servicios,
        "CentrosAtencion": centros,
        "Turno_Estados": turno_estados,
        "Usuarios": usuarios,
        "Turno_Tipos": turno_tipos,
        "Prestaciones": prestaciones,
        "OrdenDeTrabajo": ordenes,
        "Informes": informes,
    }
    return {
        name: spark.createDataFrame(rows, HIS_SCHEMAS[name])
        for name, rows in data.items()
    }


N_SLOT_COLUMNS = len(PRESTACION_SLOT_COLUMNS)
