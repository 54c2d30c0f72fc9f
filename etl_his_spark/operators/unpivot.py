"""Wide-to-long unpivot — U1.

The reference loops 11 positional procedure columns per row and emits
one bridge row per non-empty slot (src/Command/EtlHisTurnosCommand.php:
172-201). Spark-first form: ``stack`` (a generator expression, runs in
codegen, no shuffle) producing (slot, value) rows, then the P3
non-empty filter. The slot position is carried through but the
reference does not persist it (bridge table has no position column,
PostgresSchemaBuilder.php:103-109) — only the set matters.

This also inverts the reference's 11 repeated dimension joins
(J14-J24): unpivot FIRST, then join the dimension ONCE
(SURVEY.md §2.3) — one broadcast join instead of eleven.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def unpivot_slots(
    df: DataFrame,
    id_cols: list[str],
    slot_cols: list[str],
    slot_name: str = "slot",
    value_name: str = "value",
    drop_null: bool = True,
) -> DataFrame:
    """Unpivot ``slot_cols`` into (slot_index, value) rows.

    Uses ``stack`` so the transform is a single generate node —
    no shuffle, no Python. NULL slots are dropped when ``drop_null``
    (the reference's ``!empty()`` skip).
    """
    n = len(slot_cols)
    pairs: list[Column] = []
    for i, c in enumerate(slot_cols):
        pairs.append(F.lit(i))
        pairs.append(F.col(c))
    stacked = df.select(
        *[F.col(c) for c in id_cols],
        F.stack(F.lit(n), *pairs).alias(slot_name, value_name),
    )
    if drop_null:
        stacked = stacked.filter(F.col(value_name).isNotNull())
    return stacked
