"""Event-time operators over timestamped streams (batch forms).

The reference is strictly batch with no event-time semantics
(SURVEY.md §2.9), but an analytics engine for event data needs these;
each has an exact SQL form so the DuckDB oracle gate applies. The
streaming twins live in etl_his_spark/streaming/.

- ``tumbling_window_agg`` — fixed windows via the builtin ``window``
  generator (maps to time_bucket in ANSI engines). One shuffle on
  (window, keys); partial aggregation map-side.
- ``sessionize`` — gaps-and-islands: lag + cumulative sum over a
  per-entity window. Two window passes over one shuffle on the entity
  key; no self-join.
- ``asof_join`` — "latest right row at or before each left row".
  Implemented WITHOUT a range join: union the two sides as a tagged
  event stream, sort within entity, and carry the last right value
  forward (last_value IGNORE NULLS). One shuffle on the entity key,
  linear work — this is the shape that survives 100 TB, unlike the
  naive t1 ≤ t2 theta-join whose worst case is quadratic.
- ``range_join_count`` — genuine bounded-interval join (count right
  rows within [t-Δ, t)); equi-join on entity + range predicate, which
  Spark executes as a hash join with the range as residual filter.
  Fine at moderate scale, but a hot entity makes the residual
  quadratic (every left×right pair of that entity is materialized
  before the filter).
- ``range_join_count_linear`` — the same count via ONE window with a
  microsecond range frame over the unioned probe+marker stream: each
  right row is a +1 marker at its timestamp, each left row a probe
  whose frame [t-Δ µs, t-1 µs] sums the markers. One shuffle on the
  entity key, linear work per entity even when skewed — the shape
  that survives 100 TB. Output-identical to ``range_join_count``
  (equivalence-tested); the registered gate query uses this form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Fixed-window aggregation; emits window_start + group keys + aggs."""
    return (
        events.groupBy(F.window(F.col(ts_col), duration).alias("w"), *group_cols)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .drop("w")
    )


def assign_sessions(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_minutes: int,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Event-level session assignment: the input rows plus a 1-based
    ``session_id`` per entity (gaps-and-islands over one window — a
    single shuffle on the entity key). ``sessionize`` aggregates this;
    attribution/funnel compositions consume it row-level.
    """
    tiebreak = [F.col(c) for c in (order_tiebreak or [])]
    w = Window.partitionBy(entity_col).orderBy(F.col(ts_col), *tiebreak)
    gap_sec = gap_minutes * 60
    return events.withColumn(
        "__new_session",
        F.when(
            F.col(ts_col).cast("long")
            - F.lag(F.col(ts_col)).over(w).cast("long")
            > gap_sec,
            1,
        )
        .otherwise(0),
    ).withColumn(
        "session_id",
        (
            F.sum("__new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
            + 1
        ).cast("long"),
    ).drop("__new_session")


def sessionize(
    events: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_minutes: int,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Sessions = maximal event runs with gaps < ``gap_minutes``.

    Returns one row per session: entity, session_id (1-based per
    entity), session_start, session_end, n_events.
    """
    marked = assign_sessions(
        events, entity_col, ts_col, gap_minutes, order_tiebreak
    )
    return marked.groupBy(entity_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """For each left row: values from the latest right row with
    right_ts <= left_ts (same ``on`` key); NULLs when none precede.

    Union-and-carry-forward implementation: right rows become tagged
    markers, a per-key window ordered by (ts, is_left) carries the most
    recent right values onto each left row. Right rows at exactly
    left_ts DO match (<=): markers sort before left rows on ties.

    All value columns are carried as ONE struct per right row, so every
    value comes from the SAME latest preceding right row — including
    its legitimately-NULL fields. (Carrying columns independently with
    last(ignorenulls) would skip a NULL field in favor of an older
    row's value and could mix columns from different right rows.)
    """
    import pyspark.sql.types as T

    lcols = left.columns
    payload_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    tagged_left = left.select(
        *lcols,
        F.lit(1).alias("__is_left"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(payload_type).alias("__r"),
    )
    tagged_right = right.select(
        *[
            F.col(on).alias(on) if c == on else F.lit(None).cast(
                left.schema[c].dataType
            ).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__is_left"),
        F.col(right_ts).alias("__ts"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__r"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *lcols,
        "__is_left",
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__r"),
    )
    return (
        carried.filter(F.col("__is_left") == 1)
        .select(
            *lcols, *[F.col(f"__r.{c}").alias(c) for c in value_cols]
        )
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    count_name: str = "n_in_range",
) -> DataFrame:
    """Count right rows with right_ts in [left_ts - Δ, left_ts) per left row."""
    lt = F.col(f"l.{left_ts}")
    rt = F.col(f"r.{right_ts}")
    joined = left.alias("l").join(
        right.alias("r"),
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (rt >= lt - F.expr(f"INTERVAL {lower_seconds} SECONDS"))
        & (rt < lt),
        "left",
    )
    return joined.groupBy(*[F.col(f"l.{c}") for c in left.columns]).agg(
        F.count(F.col(f"r.{right_ts}")).alias(count_name)
    )


def range_join_count_linear(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    count_name: str = "n_in_range",
) -> DataFrame:
    """``range_join_count`` without the join: one window, linear work.

    Right rows become +1 markers at ``right_ts``; left rows become
    probes carrying their full row. Both are unioned and windowed per
    entity, ordered by epoch MICROseconds (the storage resolution —
    second-granularity ordering would merge distinct sub-second
    timestamps), with a range frame of [t-Δ·10⁶, t-1] µs. Summing the
    marker deltas over that frame IS the bounded-interval count:
    markers at exactly t-Δ are included (≥ bound), markers at exactly
    t are excluded (< bound, frame ends at t-1). Spark's WindowExec
    evaluates range frames with a sliding two-pointer pass, so a hot
    entity costs O(n) instead of the hash-join residual's O(n²).

    Left rows with a NULL entity or NULL timestamp yield count 0,
    matching the equi-join's null-rejecting left-join semantics
    (markers with NULL entity are dropped: they can never match).
    """
    lcols = left.columns
    probes = left.select(
        *lcols,
        F.unix_micros(F.col(left_ts)).alias("__us"),
        F.lit(0).alias("__delta"),
        F.lit(1).alias("__is_probe"),
    )
    markers = right.filter(F.col(on).isNotNull()).select(
        *[
            F.col(on).alias(c)
            if c == on
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.unix_micros(F.col(right_ts)).alias("__us"),
        F.lit(1).alias("__delta"),
        F.lit(0).alias("__is_probe"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy("__us")
        .rangeBetween(-lower_seconds * 1_000_000, -1)
    )
    counted = probes.unionByName(markers).withColumn(
        count_name,
        F.coalesce(F.sum("__delta").over(w), F.lit(0)).cast("long"),
    )
    return counted.filter(F.col("__is_probe") == 1).select(*lcols, count_name)
