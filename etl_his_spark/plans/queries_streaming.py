"""Driver-verifiable streaming gate queries.

The streaming family (``etl_his_spark.streaming``) is otherwise
verified only by pytest batch-agreement tests — these queries put at
least one real Structured Streaming execution under the external
hash-exact oracle gate: the query fn runs the stream to completion on
a bounded replay (``availableNow`` trigger → memory sink) and returns
the sink contents as a plain DataFrame.

Determinism design (what makes a *stream* hash-exact against SQL):
in append mode a session window is emitted only once the watermark
passes it, so the raw stream output depends on where the watermark
stops — the final no-data micro-batch leaves it at
``max(ts) - watermark_delay``. Sessions ending close to that horizon
may or may not be emitted depending on strict-vs-inclusive eviction
boundaries and micro-batch layout, so BOTH sides filter to sessions
ending strictly before ``max(ts) - 3 hours`` (watermark delay 2 h plus
1 h of slack). Everything below that horizon is provably emitted by
the final flush; everything above it is excluded from stream result
and oracle alike.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from contextlib import contextmanager
from datetime import timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import read_events_raw, read_table

# Per-process replay dirs: the file streaming source needs a DIRECTORY
# of parquet files (several files → several micro-batches → real
# watermark progression), while the fixture tables are single files.
# One materialization per (process, sf_dir), removed at exit.
_REPLAY_DIRS: dict[str, str] = {}
_RUN_COUNTER = [0]
# last memory-sink view registered per gate (for drop-before-reuse)
_LAST_SINK: dict[str, str] = {}


def _fresh_sink(spark: SparkSession, gate: str) -> str:
    """Rotate this gate's memory-sink name, dropping the PREVIOUS
    invocation's sink first: each sink holds its full result set in
    driver memory for the session's lifetime, and the harness/bench
    invoke gates repeatedly. Only the latest may still be referenced
    by a caller-held DataFrame."""
    prev = _LAST_SINK.get(gate)
    if prev:
        try:
            spark.catalog.dropTempView(prev)
        except Exception:
            pass
    _RUN_COUNTER[0] += 1
    name = f"{gate}_{os.getpid()}_{_RUN_COUNTER[0]}"
    _LAST_SINK[gate] = name
    return name


def _normalize_replay_order(out: str) -> None:
    """Make the replay TIME-SORTED and its batch order deterministic.

    ``FileStreamSource`` feeds unseen files oldest-modification-time
    first, so after a range-partitioned write (whose task completion
    order — and hence file mtimes — is arbitrary) the parquet parts
    are renamed ``chunk-00i.parquet`` in ascending min(ts) order (read
    from the parquet footer statistics, no data scan) with strictly
    increasing mtimes. Result: micro-batches arrive in event-time
    order regardless of file count or ``maxFilesPerTrigger``."""
    import time as _time

    import pyarrow.parquet as pq

    parts = sorted(
        p
        for p in os.listdir(out)
        if p.endswith(".parquet") and not p.startswith((".", "_"))
    )

    def min_ts(name: str) -> int:
        md = pq.ParquetFile(os.path.join(out, name)).metadata
        idx = next(
            i for i in range(md.num_columns) if md.schema.column(i).name == "ts"
        )
        return min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )

    base = _time.time()
    for i, name in enumerate(sorted(parts, key=min_ts)):
        dst = os.path.join(out, f"chunk-{i:03d}.parquet")
        os.rename(os.path.join(out, name), dst)
        os.utime(dst, (base + 2 * i, base + 2 * i))


def _events_replay_dir(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _REPLAY_DIRS:
        out = os.path.join(
            tempfile.gettempdir(),
            f"etl_his_spark_replay_{os.getpid()}_{len(_REPLAY_DIRS)}",
        )
        # ts stays nanos-long (EVENTS_RAW_SCHEMA contract); 8 files at
        # maxFilesPerTrigger=4 → ≥2 data batches before the flush.
        #
        # The files are RANGE-partitioned on ts and replayed in time
        # order (_normalize_replay_order). This is what makes the
        # watermark-sensitive gates robust rather than accidental (r7
        # advisor): with time-ordered batches the watermark when batch
        # k runs is max(ts of earlier batches) − 2 h, so for any
        # qualifying stream-stream pair (p.ts ≥ batch-k lower bound,
        # v.ts ≥ p.ts − 1 h) the view's join state is provably still
        # live — for ANY file count and ANY maxFilesPerTrigger, not
        # just the 8-files×4-per-trigger = 2-data-batch layout the r7
        # gate happened to run. Same monotone-watermark argument closes
        # the session/window gates' below-horizon emissions.
        read_events_raw(spark, sf_dir).repartitionByRange(
            8, "ts", "event_id"
        ).write.mode("overwrite").parquet(out)
        _normalize_replay_order(out)
        atexit.register(shutil.rmtree, out, ignore_errors=True)
        _REPLAY_DIRS[sf_dir] = out
    return _REPLAY_DIRS[sf_dir]


@contextmanager
def _stream_run_conf(spark: SparkSession, partitions: str = "8"):
    """Scoped micro-batch tuning for the availableNow replay gates.

    Stateful streaming stages plan with the static
    ``spark.sql.shuffle.partitions`` (AQE does not apply inside
    streaming queries), and every state partition costs a state-store
    instance commit per micro-batch — at the default 32 that overhead
    dominates these second-scale replays (r7 verdict item 3). 8 keeps
    the replay parallel while quartering per-batch state-store and
    shuffle-task machinery; results are partitioning-independent. The
    previous value is restored after the stream completes so batch
    queries in the same session are untouched."""
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, partitions)
    try:
        yield
    finally:
        spark.conf.set(key, prev)


@register(
    "streaming_attribution_agree",
    """
    WITH marked AS (
        SELECT user_id, ts, event_id, event_type, value,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         >= 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, event_id, event_type, value,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM marked
    ),
    sessions AS (
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               arg_min(event_type,
                       printf('%020d-%020d', epoch_us(ts), event_id))
                   AS first_touch,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchases,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(value * 100) AS BIGINT)
                             ELSE 0 END), 0) AS BIGINT) AS purchase_cents
        FROM numbered
        GROUP BY user_id, session_id
    )
    SELECT user_id, session_start, session_end, first_touch,
           n_purchases, purchase_cents
    FROM sessions
    WHERE n_purchases > 0
      AND session_end < (SELECT max(ts) - INTERVAL 3 HOUR FROM events)
    """,
)
def streaming_attribution_agree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution computed by a REAL streaming execution
    (watermarked ``session_window`` state, availableNow replay over a
    multi-file parquet source, memory sink), hash-checked against the
    batch SQL oracle on the horizon-closed subset.

    Session semantics are ``session_window``'s: windows are
    ``[ts, ts + 30 min)`` and merge when they OVERLAP, so a gap of
    exactly 30 minutes starts a NEW session (adjacent ≠ overlapping) —
    hence the oracle's ``>=`` on the gap comparison, deliberately
    different from the batch ``events_attribution`` oracle's ``>``
    (``assign_sessions``' closed-gap convention). Both conventions are
    valid session definitions; each implementation is pinned to its
    own.

    The one driver-side action besides the stream itself fetches a
    single scalar (max event ts) to build the shared horizon filter —
    bounded at any input size.

    STREAM-EFFECTFUL: building this query's DataFrame runs the
    streaming query to completion (that is the point of the gate);
    repeated invocations in one process reuse the replay dir and get a
    fresh memory-sink name.
    """
    from ..streaming.events import attribution_stream, stream_events

    replay = _events_replay_dir(spark, sf_dir)
    name = _fresh_sink(spark, "stream_attrib_gate")
    with _stream_run_conf(spark):
        q = (
            attribution_stream(
                stream_events(spark, replay), gap_minutes=30,
                watermark="2 hours",
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    max_ts = (
        read_table(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    )
    horizon = max_ts - timedelta(hours=3)
    return (
        spark.table(name)
        .filter(F.col("session_end") < F.lit(horizon))
        .select(
            "user_id", "session_start", "session_end", "first_touch",
            "n_purchases", "purchase_cents",
        )
    )


@register(
    "streaming_sessionize_agree",
    """
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         >= 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM marked
    ),
    sessions AS (
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               CAST(count(*) AS BIGINT) AS n_events
        FROM numbered GROUP BY user_id, session_id
    )
    SELECT user_id, session_start, session_end, n_events
    FROM sessions
    WHERE session_end < (SELECT max(ts) - INTERVAL 3 HOUR FROM events)
    """,
)
def streaming_sessionize_agree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization (watermarked ``session_window`` state)
    hash-checked against batch SQL on the horizon-closed subset — the
    second live Structured Streaming execution under the gate,
    covering the UNFILTERED session stream (every closed session, not
    just converted ones like the attribution gate). Same determinism
    design: both sides keep only sessions ending strictly below
    ``max(ts) − 3 h``. Reuses the per-process replay dir.

    STREAM-EFFECTFUL: runs the stream to completion on invocation."""
    from ..streaming.events import sessionize_stream, stream_events

    replay = _events_replay_dir(spark, sf_dir)
    name = _fresh_sink(spark, "stream_sess_gate")
    with _stream_run_conf(spark):
        q = (
            sessionize_stream(
                stream_events(spark, replay), gap_minutes=30,
                watermark="2 hours",
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    max_ts = (
        read_table(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    )
    horizon = max_ts - timedelta(hours=3)
    return (
        spark.table(name)
        .filter(F.col("session_end") < F.lit(horizon))
        .select("user_id", "session_start", "session_end", "n_events")
    )


# ---------------------------------------------------------------------------
# Streaming exact dedup (stateful dropDuplicates under the gate)
# ---------------------------------------------------------------------------

_DOC_REPLAY_DIRS: dict[str, str] = {}


def _docs_replay_dir(spark: SparkSession, sf_dir: str) -> str:
    """Multi-file replay copy of ``documents`` for the file streaming
    source (same rationale as ``_events_replay_dir``: several files →
    several micro-batches → real incremental state updates)."""
    if sf_dir not in _DOC_REPLAY_DIRS:
        out = os.path.join(
            tempfile.gettempdir(),
            f"etl_his_spark_docreplay_{os.getpid()}_{len(_DOC_REPLAY_DIRS)}",
        )
        read_table(spark, sf_dir, "documents").repartition(8).write.mode(
            "overwrite"
        ).parquet(out)
        atexit.register(shutil.rmtree, out, ignore_errors=True)
        _DOC_REPLAY_DIRS[sf_dir] = out
    return _DOC_REPLAY_DIRS[sf_dir]


@register(
    "streaming_dedup_agree",
    r"""
    SELECT DISTINCT
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
               AS fingerprint,
           CAST(length(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
               AS BIGINT) AS norm_len
    FROM documents WHERE text IS NOT NULL
    """,
)
def streaming_dedup_agree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup — stateful ``dropDuplicates`` on the
    normalized-content fingerprint over a multi-file replay, the
    ingestion-time twin of ``dedup_exact``.

    Determinism design: WHICH raw row survives per fingerprint depends
    on micro-batch arrival order, so the gate emits only columns
    functionally determined by the fingerprint itself (the md5 and the
    normalized length) — the surviving SET is deterministic even
    though the surviving rows are not. The batch oracle is a plain
    DISTINCT over the same normalization (dedup_exact's md5 CTE).

    State scale: one state row per distinct fingerprint, keyed and
    partitioned by fingerprint hash. On an unbounded 100 TB ingest the
    production form bounds state with
    ``dropDuplicatesWithinWatermark`` (content re-appearing after the
    ingest watermark is a new logical version); the fixture documents
    carry no event time, so the gate runs the unbounded-state form on
    the bounded replay.

    STREAM-EFFECTFUL: runs the stream to completion on invocation."""
    replay = _docs_replay_dir(spark, sf_dir)
    name = _fresh_sink(spark, "stream_dedup_gate")
    schema = read_table(spark, sf_dir, "documents").schema
    norm = F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(replay)
        .filter(F.col("text").isNotNull())
        .select(
            F.md5(norm).alias("fingerprint"),
            F.length(norm).cast("long").alias("norm_len"),
        )
        .dropDuplicates(["fingerprint"])
    )
    with _stream_run_conf(spark):
        q = (
            stream.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select("fingerprint", "norm_len")


@register(
    "streaming_stateful_totals_agree",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(COALESCE(SUM(CAST(ROUND(COALESCE(value, 0) * 100)
                                  AS BIGINT)), 0) AS BIGINT) AS total_cents
    FROM events GROUP BY 1
    """,
)
def streaming_stateful_totals_agree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM stateful streaming under the gate:
    ``applyInPandasWithState`` per-user running totals
    (streaming/stateful.py — explicit GroupState, Arrow-batched pandas
    update fn) run over the multi-file replay; the gate keeps each
    user's FINAL emitted row, which must equal the batch aggregate.

    Determinism: update mode emits one row per touched user per
    micro-batch carrying lifetime-so-far totals; ``n_events`` is
    strictly monotone per user, so ``max_by(struct(n_events, ...))``
    picks the last emission regardless of micro-batch layout, and that
    row is the full-history total whatever the file split was. Fixture
    values are exact 2-decimal, so the pandas per-row cents rounding
    and the oracle's ROUND agree with no half-way cases.

    STREAM-EFFECTFUL: runs the stream to completion on invocation."""
    from ..streaming.events import stream_events
    from ..streaming.stateful import running_user_totals

    replay = _events_replay_dir(spark, sf_dir)
    name = _fresh_sink(spark, "stream_stateful_gate")
    with _stream_run_conf(spark):
        q = (
            running_user_totals(stream_events(spark, replay))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    final = F.max(F.struct("n_events", "total_cents")).alias("s")
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(final)
        .select(
            "user_id",
            F.col("s.n_events").alias("n_events"),
            F.col("s.total_cents").alias("total_cents"),
        )
    )


@register(
    "streaming_window_counts_agree",
    """
    WITH agg AS (
        SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
                   AS sum_value
        FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, n_events, sum_value
    FROM agg
    WHERE window_start + INTERVAL 1 HOUR
          < (SELECT max(ts) - INTERVAL 3 HOUR FROM events)
    """,
)
def streaming_window_counts_agree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window per-type counts from a REAL watermarked
    streaming aggregation (the `windowed_counts` operator on the
    multi-file replay), hash-checked against batch SQL on the
    horizon-closed windows — the fifth live streaming execution under
    the gate, covering the watermarked groupBy-window aggregation
    lane the other four gates don't (session windows, dropDuplicates,
    applyInPandasWithState).

    Same determinism design as the session gates: append mode emits a
    window only when the watermark passes it; both sides keep only
    windows ENDING strictly below max(ts) − 3 h (2 h watermark + 1 h
    slack), where emission is guaranteed and micro-batch layout
    cannot change the result. Sums ride integer cents."""
    from ..streaming.events import stream_events, windowed_counts

    replay = _events_replay_dir(spark, sf_dir)
    name = _fresh_sink(spark, "stream_wincount_gate")
    with _stream_run_conf(spark):
        q = (
            windowed_counts(
                stream_events(spark, replay), window="1 hour",
                watermark="2 hours",
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    max_ts = (
        read_table(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    )
    horizon = max_ts - timedelta(hours=3)
    return (
        spark.table(name)
        .filter(
            F.col("window_start") + F.expr("INTERVAL 1 HOUR")
            < F.lit(horizon)
        )
        .select("window_start", "event_type", "n_events", "sum_value")
    )


# ---------------------------------------------------------------------------
# Stream-stream join (time-bounded inner) under the gate
# ---------------------------------------------------------------------------


@register(
    "streaming_join_agree",
    """
    WITH v AS (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'view'),
    p AS (SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'purchase'),
    m AS (SELECT max(ts) AS mx FROM events)
    SELECT v.user_id,
           v.event_id AS view_event_id,
           p.event_id AS purchase_event_id,
           v.ts AS view_ts,
           p.ts AS purchase_ts
    FROM v
    JOIN p ON p.user_id = v.user_id
          AND p.ts >= v.ts
          AND p.ts <= v.ts + INTERVAL 1 HOUR
    CROSS JOIN m
    WHERE v.ts < m.mx - INTERVAL 3 HOUR
      AND p.ts < m.mx - INTERVAL 3 HOUR
    """,
)
def streaming_join_agree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded stream-stream INNER join from a REAL execution
    (r7; the sixth live streaming lane under the hash gate — the one
    the other five don't cover): views ⋈ purchases of the same user
    within one hour, both sides watermarked so join state is
    evictable, run to completion on the multi-file replay
    (availableNow → memory sink) and hash-checked against the plain
    batch join.

    Determinism design, same family as the other gates: an inner
    stream-stream join emits a match in the micro-batch where the
    second side arrives, so every qualifying pair is emitted as long
    as neither row was watermark-dropped; both sides therefore filter
    to rows strictly below max(ts) − 3 h (2 h watermark + 1 h join
    bound). That state is still live when the partner arrives is
    guaranteed by the TIME-SORTED replay (r7 advisor — see
    ``_events_replay_dir``): batches arrive in event-time order, so
    when the purchase's batch runs the watermark is at most
    (batch lower bound − 2 h) and any qualifying view
    (v.ts ≥ p.ts − 1 h) is above the eviction threshold — for any
    file count and trigger size, not just the r7 2-batch layout.
    Scale: the join is keyed on user_id with an event-time residual —
    state per key is bounded by the 1-hour window, the canonical
    clicks⋈impressions shape."""
    from ..streaming.events import stream_events, stream_stream_join

    replay = _events_replay_dir(spark, sf_dir)
    name = _fresh_sink(spark, "stream_join_gate")
    # ONE streaming source, both join sides derived from it (self-join
    # on disjoint filters): a second stream_events() reader would
    # track offsets and list/scan the replay dir twice per micro-batch
    # for identical bytes (r7 verdict item 3).
    ev = stream_events(spark, replay)
    left = ev.filter(F.col("event_type") == "view")
    right = ev.filter(F.col("event_type") == "purchase")
    with _stream_run_conf(spark):
        q = (
            stream_stream_join(left, right, within="1 hour")
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    max_ts = (
        read_table(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    )
    horizon = max_ts - timedelta(hours=3)
    return (
        spark.table(name)
        .filter((F.col("l_ts") < F.lit(horizon)) & (F.col("r_ts") < F.lit(horizon)))
        .select(
            F.col("l_key").alias("user_id"),
            F.col("l_event_id").alias("view_event_id"),
            F.col("r_event_id").alias("purchase_event_id"),
            F.col("l_ts").alias("view_ts"),
            F.col("r_ts").alias("purchase_ts"),
        )
    )


@register(
    "streaming_enrich_agree",
    """
    SELECT e.event_id, e.user_id, e.event_type,
           c.c_name, c.c_nationkey
    FROM events e
    LEFT JOIN customer c ON c.c_custkey = e.user_id
    """,
)
def streaming_enrich_agree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment from a REAL execution (r7;
    the seventh live streaming lane under the hash gate): the event
    stream left-joins the bounded customer dimension per micro-batch
    (the streaming analog of the batch pipeline's J1-J9 catalog joins,
    SURVEY.md §2.3), run to completion on the multi-file replay and
    hash-checked against the plain batch left join.

    Unlike the windowed/sessionized gates this needs NO horizon
    filter: enrichment is stateless and watermark-free, so the full
    row set is emitted regardless of micro-batch layout — the output
    is deterministically the batch join. Scale: the static side rides
    Catalyst's broadcast decision (never forced — resolve_fk
    rationale); events with no dim match survive with NULLs."""
    from ..streaming.events import enrich_with_dim, stream_events

    replay = _events_replay_dir(spark, sf_dir)
    name = _fresh_sink(spark, "stream_enrich_gate")
    dim = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_name", "c_nationkey"
    )
    with _stream_run_conf(spark):
        q = (
            enrich_with_dim(stream_events(spark, replay), dim, on="user_id")
            .select(
                "event_id", "user_id", "event_type", "c_name", "c_nationkey"
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select(
        "event_id", "user_id", "event_type", "c_name", "c_nationkey"
    )


@register(
    "streaming_cdc_apply_agree",
    """
    WITH ranked AS (
        SELECT user_id, ts, event_id, event_type, value,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts) DESC, event_id DESC
               ) AS rn
        FROM events
    )
    SELECT user_id,
           CAST(epoch_us(ts) AS BIGINT) AS last_ts_us,
           event_type AS last_event_type,
           CAST(round(value * 100) AS BIGINT) AS last_value_cents
    FROM ranked WHERE rn = 1
    """,
)
def streaming_cdc_apply_agree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply (r10; the ninth live streaming lane under
    the hash gate): the event changelog replays through foreachBatch,
    each micro-batch MERGE-upserted into the manifest lakehouse via
    an atomic publish (streaming/cdc.py has the exactly-once-by-
    idempotence and cross-batch determinism arguments; restart
    recovery across a mid-stream crash is pinned by pytest). The
    FINAL PUBLISHED TABLE — not a memory sink — is returned and
    hash-checked against the batch arg_max per key, proving
    stream-of-MERGEs ≡ one batch MERGE of the whole changelog.

    No watermark and no state store: the published table is the
    state. The per-batch MERGE is a keyed anti-join (update side is
    one micro-batch's keys — broadcastable at any target size)."""
    import tempfile

    from ..streaming.cdc import STATE_TABLE, run_cdc_apply
    from ..sources.writers import read_published

    replay = _events_replay_dir(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="cdc_apply_gate_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    with _stream_run_conf(spark):
        run_cdc_apply(
            spark, replay, root, checkpoint=os.path.join(root, "_ckpt")
        )
    return read_published(spark, root, STATE_TABLE).select(
        "user_id", "last_ts_us", "last_event_type", "last_value_cents"
    )
