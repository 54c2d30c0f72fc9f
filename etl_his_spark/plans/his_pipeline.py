"""HIS transform + load — the full reference pipeline, set-oriented.

The reference's per-row loop (src/Command/EtlHisTurnosCommand.php:
120-205) becomes four DataFrame derivations and one atomic publish
(SURVEY.md §3.3):

- ``paciente``  — D1 dedup by trimmed document (survivor = latest
  FechaAlta, Command.php:121-151 + ORDER BY :321), F1-cleaned names,
  F3 first token, F4 gender lookup, K1 dense ids.
- ``turno``     — ONE ROW PER EXTRACTION ROW with a fresh sequential id
  (the SERIAL insert at Command.php:154-165). If the dead left joins
  J10-J13 fan out, duplicate extraction rows each get their own turno
  id — exactly like the reference's loop — so multiplicity is
  preserved, not deduped away.
- ``prestacion`` — D2 distinct trimmed names from the U1 unpivot of the
  extraction rows, K1 ids.
- ``prestacion_x_turno`` — bridge rows, one per (extraction row ×
  non-empty slot) (P3 filter, Command.php:172-201), FKs resolved by
  natural-key joins. Derived from the WIDE rows so fan-out multiplies
  bridge rows just as the reference's inner loop does.

Output shapes match the target DDL (PostgresSchemaBuilder.php:60-113);
load is stage-then-publish (S5 atomicity, SURVEY.md §2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.gender import inferir_sexo
from ..functions.text import limpiar_nombres, nonempty, primer_nombre
from ..operators.dedup import dedup_first_per_key
from ..operators.surrogate import dense_ids, dense_ids_small, resolve_fk
from ..operators.unpivot import unpivot_slots
from ..schemas import PRESTACION_SLOT_COLUMNS
from ..sources.writers import publish_atomic
from .his_extract import extract_unpivoted, extract_wide

_N_SLOTS = len(PRESTACION_SLOT_COLUMNS)


def _with_row_ids(wide: DataFrame) -> DataFrame:
    """Mint the SERIAL turno id: one sequential id per extraction row.

    Fan-out duplicates are bit-identical rows (the dead joins project
    nothing), so any order among duplicates is equivalent; ranking by
    turno_id makes ids deterministic up to that equivalence.

    NARROW-PROXY scheme (r14, guide §8 "decide with small rows, move
    big rows once"): the id decision depends only on ``turno_id``, yet
    the r13 form ran ``dense_ids`` directly on the 40-column
    extraction — the full payload was locally checkpointed twice
    (input pin + ranged pin), range-exchanged through the sampler, and
    sorted per partition, ~12 s of the 20-30 s publish at sf0.1. Now:

    1. Pin the payload ONCE. The pinned partitions make
       ``monotonically_increasing_id`` (partition id << 33 | position)
       a stable per-row address across separate reads of the frame —
       the §8 "record scan partition + position" device.
    2. Rank a two-column proxy ``(turno_id, __mid)`` through the same
       parallel two-phase ``dense_ids`` — the range exchange, both
       internal pins, and the per-partition sort now carry 16 bytes a
       row instead of the whole extraction.
    3. Re-attach by ``__mid`` equi-join. One exchange carries the
       payload (the unavoidable move; the r13 form paid exactly one
       too, as the range exchange), SHUFFLE_HASH-hinted so neither
       side is sorted: the 1:1 build side is (mid, uid) pairs.

    Ordering ties (fan-out duplicates) break by ``__mid`` instead of
    the window sort's arbitrary order — a different representative of
    the same equivalence class; every id set per turno_id group is
    unchanged (tests pin ids 1..N dense with fan-out duplicates
    distinct).

    The single-point work is unchanged: summing ≤ ``buckets`` counts
    on the driver. At 100 TB the payload crosses the wire once and
    every other pass (checkpoint writes, sampling, sort) is
    proxy-sized.
    """
    wide = wide.localCheckpoint(eager=False)
    proxy = wide.select("turno_id").withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    idmap = dense_ids(
        proxy, [F.col("turno_id"), F.col("__mid")], "turno_uid", buckets=64
    ).select("__mid", "turno_uid")
    return (
        wide.withColumn("__mid", F.monotonically_increasing_id())
        .join(idmap.hint("SHUFFLE_HASH"), "__mid")
        .drop("__mid")
    )


def build_paciente(wide: DataFrame) -> DataFrame:
    """Patient dimension: trim-key dedup → clean → infer sex → ids."""
    keyed = wide.withColumn(
        "documento_identidad", F.trim(F.col("paciente_documento"))  # F2
    )
    survivors = dedup_first_per_key(
        keyed,
        ["documento_identidad"],
        [F.col("turnos_fecha_alta").desc(), F.col("turno_id").desc()],
    )
    cleaned = survivors.select(
        "documento_identidad",
        limpiar_nombres("paciente_nombres").alias("nombre"),      # F1
        limpiar_nombres("paciente_apellido").alias("apellido"),   # F1
    ).withColumn("primer_nombre", primer_nombre(F.col("nombre")))  # F3
    sexed = inferir_sexo(cleaned, "primer_nombre")                 # F4
    return dense_ids_small(
        sexed, [F.col("documento_identidad")], "id"
    ).select("id", "nombre", "apellido", "documento_identidad", "sexo_inferido")


def build_turno(wide_ids: DataFrame, paciente: DataFrame) -> DataFrame:
    """Fact table with resolved paciente FK (K2); id = per-row serial."""
    with_key = wide_ids.withColumn(
        "documento_identidad", F.trim(F.col("paciente_documento"))
    )
    resolved = resolve_fk(
        with_key,
        paciente,
        ["documento_identidad"],
        "paciente_id",
        dim_id_col="id",
        broadcast_dim=False,  # patient dim can be large; let AQE decide
    )
    return resolved.select(
        F.col("turno_uid").alias("id"),
        "paciente_id",
        F.col("turno_fecha").alias("fecha"),
        F.col("turno_hora").alias("hora"),
        F.col("turno_duracion").alias("duracion_minutos"),
        F.col("turno_sobreturno").alias("sobreturno"),
        F.col("turno_estado").alias("estado"),
        F.col("turnos_fecha_alta").alias("fecha_alta"),
        # Command.php:164 loads usuario_alta_usuario (the login name),
        # NOT the Nombres+Apellido display concat — which exists only as
        # a projection-parity column in the extraction.
        F.col("usuario_alta_usuario").alias("usuario_alta"),
    )


def unpivot_wide_slots(wide_ids: DataFrame) -> DataFrame:
    """U1 over the extraction rows: 11 name columns → (slot, nombre)."""
    return unpivot_slots(
        wide_ids,
        ["turno_uid"],
        [f"prestacion{i}" for i in range(_N_SLOTS)],
        slot_name="slot",
        value_name="prestacion_nombre",
        drop_null=True,
    ).filter(nonempty("prestacion_nombre"))  # P3: NULL-or-blank skip


def build_prestacion(slot_rows: DataFrame) -> DataFrame:
    """Procedure dimension: D2 distinct trimmed names + K1 ids."""
    names = slot_rows.select(
        F.trim(F.col("prestacion_nombre")).alias("nombre")
    ).distinct()
    return dense_ids_small(names, [F.col("nombre")], "id").select("id", "nombre")


def build_bridge(slot_rows: DataFrame, prestacion: DataFrame) -> DataFrame:
    """Bridge: one row per (extraction row, non-empty slot).

    Slot position is not persisted — the reference's bridge has no
    position column (PostgresSchemaBuilder.php:103-109) — but it is the
    deterministic tie-break for the bridge's own serial id.
    """
    rows = slot_rows.select(
        "turno_uid", F.trim(F.col("prestacion_nombre")).alias("nombre"), "slot"
    )
    resolved = resolve_fk(
        rows, prestacion, ["nombre"], "prestacion_id", dim_id_col="id"
    )
    # bridge rows are fact-scale × slots — parallel id minting, never a
    # single-partition window (SURVEY.md §7.3 K1 note)
    with_ids = dense_ids(
        resolved, [F.col("turno_uid"), F.col("slot")], "id", buckets=64
    )
    return with_ids.select(
        "id", F.col("turno_uid").alias("turno_id"), "prestacion_id"
    )


def run_pipeline(
    tables: dict[str, DataFrame], output_root: str | None = None
) -> dict[str, DataFrame]:
    """Full E/T/(L): returns the 4 outputs; optionally publishes them
    atomically (stage-then-publish) under ``output_root``."""
    # The 22-table extraction is pinned INSIDE _with_row_ids (once —
    # the narrow-proxy id mint needs stable partitions for its per-row
    # address; dense_ids' own input/ranged pins now carry only the
    # 16-byte proxy, not the extraction — r14, guide §8).
    wide_ids = _with_row_ids(extract_wide(tables))
    # One pass feeds all four outputs; materialize the id-assigned
    # extraction rather than recompute the offset map per derivation.
    # Lazy localCheckpoint, not persist(): blocks die with the frame
    # instead of leaking a CacheManager entry per call
    # (packing.running_total has the full rationale, including the
    # fault tradeoff). Lazy, not eager: the first consuming action
    # populates the same blocks eager would have — without a
    # dedicated pass.
    wide_ids = wide_ids.localCheckpoint(eager=False)
    slot_rows = unpivot_wide_slots(wide_ids)
    paciente = build_paciente(wide_ids)
    turno = build_turno(wide_ids, paciente)
    prestacion = build_prestacion(slot_rows)
    bridge = build_bridge(slot_rows, prestacion)
    outputs = {
        "paciente": paciente,
        "turno": turno,
        "prestacion": prestacion,
        "prestacion_x_turno": bridge,
    }
    if output_root is not None:
        # The turno(fecha) index analog (PostgresSchemaBuilder.php:90)
        # at MONTH grain: date-grain dirs put one directory per date on
        # the filesystem/metastore (2,405 at sf0.1; tens of thousands
        # at 100 TB — the partition-explosion anti-pattern, and 12-17 s
        # of pure directory traffic in the r11 write profile, width-
        # insensitive). Month dirs (~80) plus fecha-sorted row groups
        # give the same day-grain pruning — directory pruning to the
        # month, then parquet min/max skips to the date — at 2.2 s
        # (measured r11, same box, same data). fecha_mes is a
        # write-layout column, added only on the publish path; the
        # returned frames keep the DDL schema.
        publish = dict(outputs)
        publish["turno"] = outputs["turno"].withColumn(
            "fecha_mes", F.date_format("fecha", "yyyy-MM")
        )
        publish_atomic(
            publish,
            output_root,
            partition_by={"turno": ["fecha_mes"]},
            sort_within={"turno": ["fecha"]},
        )
    return outputs


def incremental_paciente(
    existing: DataFrame, wide_new: DataFrame
) -> DataFrame:
    """Incremental dimension load — the P4 existence probe, set-oriented.

    The reference probes per row (`SELECT id FROM paciente WHERE
    documento_identidad = ?`, Command.php:130-132) and inserts only
    misses. At scale that is one left-anti join: new batch's deduped
    patients minus already-present documents, with fresh surrogate ids
    continuing after the existing maximum. Existing rows are never
    rewritten — the incremental twin of the full-reload pipeline.
    """
    new_dim = build_paciente(wide_new)
    misses = new_dim.join(
        existing.select("documento_identidad"), "documento_identidad", "left_anti"
    )
    start = existing.agg(F.max("id")).first()[0] or 0
    renumbered = dense_ids_small(
        misses.drop("id"), [F.col("documento_identidad")], "id"
    ).withColumn("id", F.col("id") + F.lit(start))
    return renumbered.select(
        "id", "nombre", "apellido", "documento_identidad", "sexo_inferido"
    )


__all__ = [
    "run_pipeline",
    "incremental_paciente",
    "build_paciente",
    "build_turno",
    "build_prestacion",
    "build_bridge",
    "unpivot_wide_slots",
    "extract_wide",
    "extract_unpivoted",
]
