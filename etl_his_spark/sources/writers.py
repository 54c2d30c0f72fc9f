"""Sinks: overwrite writers + atomic multi-table publish.

The reference loads 4 tables inside ONE PostgreSQL transaction and rolls
back on any error (src/Command/EtlHisTurnosCommand.php:104,208,213-216);
the schema is dropped and recreated each run
(src/Service/PostgresSchemaBuilder.php:45-58) — i.e. full-reload
overwrite semantics with all-or-nothing visibility.

Spark writes are not multi-table transactional, so atomicity is
reproduced with stage-then-publish (SURVEY.md §2.1 S5): write every
table under ``{root}/_staging_{token}/``, then flip a tiny
``_CURRENT`` pointer file as the single commit point. Readers resolve
the pointer first, so a crash mid-write leaves the previous publish
fully intact. This protocol is object-store friendly (no directory
renames on the data itself) and scales to any table count.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_CURRENT"


def write_table(
    df: DataFrame,
    path: str,
    *,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet overwrite write; optional partition columns.

    ``partition_by`` is the Spark analog of the reference's secondary
    indexes (PostgresSchemaBuilder.php:88-91 indexes turno(fecha) etc.):
    partition pruning serves the same frequent-query access paths.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def publish_atomic(
    tables: dict[str, DataFrame],
    root: str,
    *,
    partition_by: dict[str, list[str]] | None = None,
) -> str:
    """Write all tables to a staging dir, then atomically publish.

    Returns the staging directory that became current. Readers use
    ``resolve_current`` to find it. If any write fails, the pointer is
    never moved — the previous publish stays visible (matches the
    reference's rollback-on-error, Command.php:213-216).
    """
    token = uuid.uuid4().hex[:12]
    staging = os.path.join(root, f"_staging_{token}")
    partition_by = partition_by or {}
    for name, df in tables.items():
        write_table(df, os.path.join(staging, name), partition_by=partition_by.get(name))
    # Single commit point: atomic pointer replace.
    tmp = os.path.join(root, f"._pointer_{token}")
    os.makedirs(root, exist_ok=True)
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(staging)
    os.replace(tmp, os.path.join(root, _POINTER))
    return staging


def prune_old_publishes(root: str, keep: int = 2) -> list[str]:
    """Remove all but the newest ``keep`` staging dirs (never the
    current one). Returns the removed paths.

    Old publishes are what make the pointer swap safe (readers mid-scan
    on the previous publish keep working), so retention is explicit and
    conservative — prune only after downstream consumers have moved on.
    """
    import shutil

    current = resolve_current(root)
    stagings = sorted(
        (
            os.path.join(root, d)
            for d in os.listdir(root)
            if d.startswith("_staging_")
        ),
        key=os.path.getmtime,
        reverse=True,
    )
    removed = []
    kept = 0
    for path in stagings:
        if path == current or kept < keep:
            kept += 1
            continue
        shutil.rmtree(path, ignore_errors=True)
        removed.append(path)
    return removed


def resolve_current(root: str) -> str | None:
    """Return the currently-published staging dir, or None if never published."""
    ptr = os.path.join(root, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr, encoding="utf-8") as fh:
        return fh.read().strip()


def read_published(spark: SparkSession, root: str, name: str) -> DataFrame:
    """Read table ``name`` from the current publish."""
    current = resolve_current(root)
    if current is None:
        raise FileNotFoundError(f"no publish under {root}")
    return spark.read.parquet(os.path.join(current, name))
