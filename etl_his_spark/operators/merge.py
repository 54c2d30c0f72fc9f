"""Row-level table maintenance: key-wise MERGE (upsert) and SCD2.

The reference's load is full-reload-only (SURVEY.md §2.1 S4: drop
schema + reinsert everything, Builder.php:45-58). At 100 TB a full
reload is not an option — the engine needs the lakehouse verbs:

- ``merge_upsert``: MERGE INTO semantics for whole-row updates —
  matched target rows are replaced by their update row, unmatched
  update rows are inserted, everything else is carried over. One
  left-anti join (hash, keyed on the merge key) + a union: no window,
  no global ordering, broadcastable when the update batch is small
  (the common case — daily delta into a huge table).
- ``scd2_from_events``: derive a type-2 slowly-changing dimension
  (validity intervals) from a change/event stream with one ``lead()``
  window per key — the standard warehouse history table.

Combined with the manifest publish protocol (sources/writers.py) a
MERGE result is published atomically: compute merged frame → publish →
pointer swap; readers never see a half-merged table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: list[str]
) -> DataFrame:
    """Whole-row MERGE: update rows win on key match, insert otherwise.

    ``updates`` must carry the full target schema (whole-row semantics,
    like ``MERGE ... WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED
    THEN INSERT *``). Duplicate keys within ``updates`` are the
    caller's contract to avoid, as in SQL MERGE (nondeterministic
    otherwise).
    """
    return target.join(updates, keys, "left_anti").unionByName(updates)


def merge_delete(
    target: DataFrame, deletes: DataFrame, keys: list[str]
) -> DataFrame:
    """Key-wise DELETE: drop target rows whose key appears in
    ``deletes`` (one anti join; ``deletes`` needs only the key cols)."""
    return target.join(deletes.select(*keys), keys, "left_anti")


def scd2_from_events(
    events: DataFrame,
    key: str,
    attr_cols: list[str],
    ts_col: str,
    tie_break: str,
) -> DataFrame:
    """Type-2 SCD: one validity interval per observed version.

    Each event row is a version of the entity's attributes effective at
    ``ts_col``; ``valid_to`` is the next version's timestamp (NULL for
    the current version). One ``lead()`` window partitioned by the
    entity key — parallel across entities, no global sort.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col), F.col(tie_break))
    return events.select(
        key,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    )


def changelog(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    include_old: bool = False,
) -> DataFrame:
    """CDC-style diff of two table snapshots: one row per changed key
    with ``op`` ∈ {'I','U','D'} (insert/update/delete) plus the NEW
    payload for I/U and the OLD payload for D.

    One co-partitioned FULL OUTER join on the key — the minimal
    shuffle for a snapshot diff; with both snapshots bucketed on the
    key (``write_bucketed``) even that exchange disappears. Update
    detection compares an md5 over the stringified ``compare_cols``
    (NULL-safe via a sentinel), so wide rows diff by one digest
    instead of N column comparisons. Unchanged keys are filtered
    before anything downstream, so the changelog is |changes|-sized,
    not |table|-sized — the property that makes incremental
    downstream refreshes worth it at 100 TB.
    """

    def digest(side: DataFrame) -> DataFrame:
        # INJECTIVE encoding: each column is md5'd separately (fixed
        # 32-hex-char tokens) before the row hash, with a 32-char
        # non-hex NULL sentinel. A separator-based concat would be
        # ambiguous for values containing the separator ('x\x1fy','z'
        # vs 'x','y\x1fz' digest equal → a real update silently
        # suppressed) and for values equal to the NULL sentinel.
        per_col = [
            F.coalesce(
                F.md5(F.col(c).cast("string")), F.lit("Z" * 32)
            )
            for c in compare_cols
        ]
        return side.select(
            *keys,
            *compare_cols,
            F.md5(F.concat(*per_col)).alias("__digest"),
        )

    o = digest(old).select(
        *[F.col(c).alias(f"__o_{c}") for c in (*keys, *compare_cols)],
        F.col("__digest").alias("__o_digest"),
    )
    n = digest(new)
    cond = [n[k].eqNullSafe(o[f"__o_{k}"]) for k in keys]
    joined = n.join(o, cond, "full_outer")
    # presence is probed via keys[0]: NULL key values are out of
    # contract (as for SQL MERGE keys)
    op = (
        F.when(o[f"__o_{keys[0]}"].isNull(), F.lit("I"))
        .when(n[keys[0]].isNull(), F.lit("D"))
        .when(n["__digest"] != o["__o_digest"], F.lit("U"))
    )
    out_cols = [
        F.coalesce(n[k], o[f"__o_{k}"]).alias(k) for k in keys
    ] + [
        # I/U carry the new payload, D the old one
        F.when(n[keys[0]].isNull(), o[f"__o_{c}"]).otherwise(n[c]).alias(c)
        for c in compare_cols
    ]
    if include_old:
        # the OLD payload alongside (NULL for I) — what an incremental
        # aggregate refresh needs to SUBTRACT a U/D row's previous
        # contribution (see incremental_group_refresh)
        out_cols += [o[f"__o_{c}"].alias(f"old_{c}") for c in compare_cols]
    return joined.select(op.alias("op"), *out_cols).filter(F.col("op").isNotNull())


def incremental_group_refresh(
    old_agg: DataFrame,
    changes: DataFrame,
    group_col: str,
    sum_col: str,
    n_col: str = "n",
    total_col: str = "total",
) -> DataFrame:
    """Maintain a (group, count, sum) aggregate from a changelog in
    O(|changes|) — never re-reading the base table.

    ``changes`` is ``changelog(..., include_old=True)`` output where
    ``compare_cols`` included ``group_col`` and ``sum_col``. Every
    change becomes ± delta rows (an update contributes −old in its old
    group and +new in its new group, so GROUP MOVES are handled), the
    deltas collapse to one row per touched group, and a full-outer
    join against the old aggregate applies them. Groups whose count
    reaches zero disappear, groups never seen before appear — the
    result is identical to re-aggregating the new snapshot (pinned by
    the gate's oracle), at delta cost instead of table cost.
    """
    is_i, is_d, is_u = (F.col("op") == x for x in ("I", "D", "U"))
    add = changes.filter(is_i | is_u).select(
        F.col(group_col).alias("g"),
        F.lit(1).alias("dn"),
        F.col(sum_col).alias("dv"),
    )
    sub = changes.filter(is_d | is_u).select(
        # D rows carry the old payload in the main columns
        F.when(is_u, F.col(f"old_{group_col}"))
        .otherwise(F.col(group_col))
        .alias("g"),
        F.lit(-1).alias("dn"),
        (
            -F.when(is_u, F.col(f"old_{sum_col}")).otherwise(F.col(sum_col))
        ).alias("dv"),
    )
    deltas = (
        add.unionByName(sub)
        .groupBy("g")
        .agg(F.sum("dn").alias("dn"), F.sum("dv").alias("dv"))
    )
    o = old_agg.select(
        F.col(group_col).alias("og"), F.col(n_col).alias("on"),
        F.col(total_col).alias("ov"),
    )
    merged = o.join(deltas, o.og.eqNullSafe(deltas.g), "full_outer")
    return (
        merged.select(
            F.coalesce("og", "g").alias(group_col),
            (F.coalesce("on", F.lit(0)) + F.coalesce("dn", F.lit(0)))
            .cast("long")
            .alias(n_col),
            (F.coalesce("ov", F.lit(0)) + F.coalesce("dv", F.lit(0)))
            .cast("long")
            .alias(total_col),
        )
        .filter(F.col(n_col) > 0)
    )
