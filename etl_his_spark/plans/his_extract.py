"""HIS extraction — the reference's 22-table join (J1-J24) Spark-first.

Reproduces the single big SELECT at src/Command/EtlHisTurnosCommand.php:
254-322 as a declarative DataFrame plan over per-table sources:

- J1-J9: inner equi-joins; small catalogs broadcast (SURVEY.md §2.3).
- J8: Personas joined twice (patient + user's person) via aliases.
- J10-J13: the dead left-join chain (RIS OrdenDeTrabajo/Informes +
  Turno_Estados in two more roles). No column from them is projected,
  but they are kept because a non-unique `IdTurno` fans out fact rows —
  Catalyst cannot eliminate them and neither may we (SURVEY.md §4.1).
- J14-J24: the reference joins Prestaciones ELEVEN times, once per
  positional slot. We invert: unpivot the 11 FK slots to rows first,
  then join the dimension ONCE (broadcast). ``extract_wide`` keeps the
  reference's literal 27-column wide shape (with the 11 name columns)
  for parity checks; the pipeline consumes the unpivoted form.

At scale: turnos is the only large table; every dimension join is a
broadcast hash join (zero shuffle), and the dead chain joins shuffle
only if RIS tables outgrow the broadcast threshold — exactly the plan
SQL Server's optimizer would pick, chosen here by Catalyst/AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import usuario_nombre_concat
from ..operators.unpivot import unpivot_slots
from ..schemas import PRESTACION_SLOT_COLUMNS


def extract_wide(t: dict[str, DataFrame]) -> DataFrame:
    """The full extraction row — 27 aliased columns, reference parity.

    ``t`` maps HIS table names (schemas.HIS_SCHEMAS keys) to DataFrames.
    Mirrors the SELECT list at Command.php:255-291 and the join list at
    :293-319, including the ORDER BY FechaAlta DESC at :321 (exposed by
    the caller when row order matters; dedup downstream is
    window-deterministic instead — SURVEY.md §2.6 O1).
    """
    turnos = t["turnos"].alias("t")
    recursos = t["Recursos"].alias("r")
    recurso_tipos = t["Recurso_Tipos"].alias("rt")
    servicios = t["Servicios"].alias("s")
    centros = t["CentrosAtencion"].alias("ca")
    personas_p = t["Personas"].alias("p")      # role: patient (J5)
    turno_estados = t["Turno_Estados"].alias("te")
    usuarios = t["Usuarios"].alias("usu")
    personas_per = t["Personas"].alias("per")  # role: user's person (J8)
    turno_tipos = t["Turno_Tipos"].alias("ttprevisto")
    ot = t["OrdenDeTrabajo"].alias("ot")
    informes = t["Informes"].alias("inf")
    te_ot = t["Turno_Estados"].alias("te_ot")      # role 2 (J12)
    te_inf = t["Turno_Estados"].alias("te_inf")    # role 3 (J13)
    prestaciones = t["Prestaciones"]

    joined = (
        turnos
        # J1: turnos ⋈ Recursos (Command.php:294)
        .join(recursos, F.col("r.Id") == F.col("t.IdRecurso"), "inner")
        # J2: ⋈ Recurso_Tipos (:295), broadcast catalog
        .join(
            F.broadcast(recurso_tipos),
            F.col("rt.Id") == F.col("r.IdRecurso_Tipo"),
            "inner",
        )
        # J3: ⋈ Servicios (:296)
        .join(F.broadcast(servicios), F.col("s.Id") == F.col("t.IdServicio"), "inner")
        # J4: ⋈ CentrosAtencion (:297)
        .join(
            F.broadcast(centros), F.col("ca.Id") == F.col("t.IdCentroAtencion"), "inner"
        )
        # J5: ⋈ Personas p — patient (:298)
        .join(personas_p, F.col("p.Id") == F.col("t.IdPersona"), "inner")
        # J6: ⋈ Turno_Estados te (:299)
        .join(
            F.broadcast(turno_estados),
            F.col("te.Id") == F.col("t.IdTurno_Estado"),
            "inner",
        )
        # J7: ⋈ Usuarios usu (:300)
        .join(usuarios, F.col("usu.Id") == F.col("t.IdUsuario_Otorgo"), "inner")
        # J8: ⋈ Personas per — same table, second role (:301)
        .join(personas_per, F.col("per.Id") == F.col("usu.IdPersona"), "inner")
        # J9: ⋈ Turno_Tipos (:303)
        .join(
            F.broadcast(turno_tipos),
            F.col("ttprevisto.Id") == F.col("t.IdTurno_TipoPrevisto"),
            "inner",
        )
        # J10-J13: dead left-join chain (:304-307) — kept for fan-out
        # semantics (SURVEY.md §4.1: not removable without uniqueness)
        .join(ot, F.col("ot.IdTurno") == F.col("t.Id"), "left")
        .join(informes, F.col("inf.IdOrdenDeTrabajo") == F.col("ot.Id"), "left")
        .join(F.broadcast(te_ot), F.col("te_ot.Id") == F.col("ot.IdEstado"), "left")
        .join(
            F.broadcast(te_inf),
            F.col("te_inf.Id") == F.col("inf.IdEstadoActual"),
            "left",
        )
    )

    # J14-J24 as unpivot-then-join would lose the wide shape; for the
    # literal 27-column parity we join Prestaciones 11 times broadcast
    # (Catalyst-cheap: same hashed relation reused).
    for i, slot in enumerate(PRESTACION_SLOT_COLUMNS):
        pres = prestaciones.alias(f"pres{i}")
        joined = joined.join(
            F.broadcast(pres),
            F.col(f"pres{i}.Id") == F.col(f"t.{slot}"),
            "left",
        )

    select_cols = [
        F.col("t.Id").alias("turno_id"),
        F.col("t.FechaTurno").alias("turno_fecha"),
        F.col("t.HoraTurno").alias("turno_hora"),
        F.col("t.DuracionMinutos").alias("turno_duracion"),
        F.col("t.EsSobreTurno").alias("turno_sobreturno"),
        F.col("t.FechaAlta").alias("turnos_fecha_alta"),
        F.col("te.Nombre").alias("turno_estado"),
        F.col("ttprevisto.Nombre").alias("turno_tipo"),
        F.col("rt.Nombre").alias("recurso_tipo"),
        F.col("s.Nombre").alias("servicio"),
        F.col("ca.Nombre").alias("centro_atencion"),
        F.col("p.Nombres").alias("paciente_nombres"),
        F.col("p.Apellido").alias("paciente_apellido"),
        F.col("p.Documento_Numero").alias("paciente_documento"),
        F.col("usu.Id").alias("usuario_alta_id"),
        # P2: NULL-propagating concat (SQL Server `+`, Command.php:278)
        usuario_nombre_concat(F.col("per.Nombres"), F.col("per.Apellido")).alias(
            "usuario_alta_nombre"
        ),
        # 28th reference column (Command.php:277): the LOGIN NAME — this,
        # not the concat display name, is what the load consumes as
        # usuario_alta (Command.php:164).
        F.col("usu.NombreInicioSesion").alias("usuario_alta_usuario"),
    ] + [
        F.col(f"pres{i}.Nombre").alias(f"prestacion{i}")
        for i in range(len(PRESTACION_SLOT_COLUMNS))
    ]
    return joined.select(*select_cols)


def extract_unpivoted(t: dict[str, DataFrame]) -> DataFrame:
    """J14-J24 inverted: unpivot 11 FK slots → rows, join Prestaciones once.

    The Spark-idiomatic replacement for the reference's 11 repeated
    dimension joins (SURVEY.md §2.3): one generate node + one broadcast
    join instead of eleven joins. Emits (turno_id, slot, prestacion_id,
    prestacion_nombre) for non-NULL slots.
    """
    slots = unpivot_slots(
        t["turnos"],
        ["Id"],
        PRESTACION_SLOT_COLUMNS,
        slot_name="slot",
        value_name="prestacion_fk",
        drop_null=True,
    ).withColumnRenamed("Id", "turno_id")
    pres = t["Prestaciones"].select(
        F.col("Id").alias("prestacion_fk"), F.col("Nombre").alias("prestacion_nombre")
    )
    return slots.join(F.broadcast(pres), "prestacion_fk", "left").select(
        "turno_id", "slot", "prestacion_fk", "prestacion_nombre"
    )
