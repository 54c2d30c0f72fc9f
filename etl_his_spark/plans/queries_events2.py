"""More event-time + sketch queries: hopping windows, per-window top-k,
approximate sketches (HLL / quantile)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.readers import read_table


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


@register(
    "events_hopping_window",
    """
    WITH assigned AS (
        SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start,
               event_type, value
        FROM events
        UNION ALL
        SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
               event_type, value
        FROM events
    )
    SELECT window_start, event_type, count(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
             AS sum_value
    FROM assigned GROUP BY 1, 2
    """,
)
def events_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 1-hour width, 30-minute slide — each
    event lands in exactly two windows. Spark's window generator emits
    the assignments; the oracle derives the same two bucket starts."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(_cents("value")).cast("double") / 100).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_topk_per_window",
    """
    WITH hourly AS (
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, user_id,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY window_start ORDER BY cents DESC, user_id
        ) AS rnk
        FROM hourly
    )
    SELECT window_start, user_id,
           CAST(cents AS DOUBLE) / 100 AS total_value,
           CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def events_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users by value inside every hourly window (grouped top-k:
    agg + ranked window, deterministic tie-break)."""
    e = read_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.window("ts", "1 hour").alias("w"), "user_id"
    ).agg(F.sum(_cents("value")).alias("cents"))
    w = Window.partitionBy("w").orderBy(F.desc("cents"), F.asc("user_id"))
    return (
        hourly.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("w.start").alias("window_start"),
            "user_id",
            (F.col("cents").cast("double") / 100).alias("total_value"),
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


@register(
    "sketch_approx_distinct",
    """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_users,
           count(*) AS n_events,
           TRUE AS within_rsd_bound
    FROM events GROUP BY 1
    """,
)
def sketch_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event type — the sketch
    that replaces COUNT(DISTINCT) at 100 TB (mergeable, fixed memory).

    Hard-signal design: the HLL estimate itself is engine-specific, so
    the registered output carries the EXACT side (count distinct, which
    DuckDB reproduces) plus a ``within_rsd_bound`` boolean asserting the
    estimate landed within 5× the configured rsd of the exact count —
    a bound HLL++ meets with overwhelming probability, and
    deterministically so for a fixed dataset (the sketch hash is
    seedless). The oracle asserts the same boolean as literal TRUE, so
    an out-of-bound sketch hash-mismatches and fails the gate.
    """
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= F.greatest(
                    F.lit(1.0), F.col("exact_users") * F.lit(5 * 0.02)
                )
            ).alias("within_rsd_bound"),
        )
    )


@register(
    "sketch_approx_quantiles",
    """
    SELECT event_type, count(*) AS n_events,
           TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
    FROM events GROUP BY 1
    """,
)
def sketch_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p95/p99 of event value per type (fixed-memory
    mergeable quantile sketch, accuracy=10000 → rank error ≤ n/10000).

    Hard-signal design: sketch values are engine-specific, so instead of
    emitting the raw estimates (r3's array output also crashed the
    harness canonicalizer) the query verifies each estimate's RANK
    against the raw data: value v passes for percentile p iff
    ``count(value < v) ≤ (p+ε)·n`` and ``count(value ≤ v) ≥ (p−ε)·n``
    with ε = max(1/n, 2/accuracy) slack. The oracle asserts the same
    booleans as literal TRUE — a mis-ranked sketch hash-mismatches.
    """
    e = read_table(spark, sf_dir, "events")
    sketched = e.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("qs"),
    )
    flat = sketched.select(
        "event_type",
        F.element_at("qs", 1).alias("p50"),
        F.element_at("qs", 2).alias("p95"),
        F.element_at("qs", 3).alias("p99"),
    )
    # Rank-check join: one broadcast join (≤ #event_types rows) + one
    # keyed agg — no second shuffle of the raw events beyond the agg.
    # NULL discipline: percentile_approx skips NULL values, and the
    # lt_/le_ sums below skip them too (NULL comparison → NULL → sum
    # ignores) — so the rank bound must be based on count(value)
    # (non-null), NOT count(*). With count(*) a NULL-heavy group would
    # fail its le bound spuriously; an all-NULL group (NULL sketch,
    # NULL sums) passes vacuously via the coalesces, matching the
    # oracle's literal TRUE.
    checked = (
        e.join(F.broadcast(flat), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("value").alias("n_vals"),
            *[
                agg
                for p in ("p50", "p95", "p99")
                for agg in (
                    F.sum((F.col("value") < F.col(p)).cast("long")).alias(f"lt_{p}"),
                    F.sum((F.col("value") <= F.col(p)).cast("long")).alias(f"le_{p}"),
                )
            ],
        )
    )

    def ok(p: str, frac: float) -> F.Column:
        n = F.col("n_vals").cast("double")
        slack = F.greatest(F.lit(1.0), n * F.lit(2.0 / 10000))
        return (F.coalesce(F.col(f"lt_{p}"), F.lit(0)) <= n * F.lit(frac) + slack) & (
            F.coalesce(F.col(f"le_{p}"), F.lit(0)) >= n * F.lit(frac) - slack
        )

    return checked.select(
        "event_type",
        "n_events",
        ok("p50", 0.5).alias("p50_ok"),
        ok("p95", 0.95).alias("p95_ok"),
        ok("p99", 0.99).alias("p99_ok"),
    )


@register(
    "stats_outliers_mad",
    """
    WITH vals AS (
        SELECT event_type, event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cents, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM vals
    ),
    med AS (
        SELECT event_type, cents AS med_cents
        FROM ranked WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
    ),
    devs AS (
        SELECT v.event_type, v.event_id,
               abs(v.cents - m.med_cents) AS dev_cents, m.med_cents
        FROM vals v JOIN med m ON v.event_type = m.event_type
    ),
    dev_ranked AS (
        SELECT event_type, dev_cents, med_cents,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY dev_cents, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM devs
    ),
    mad AS (
        SELECT event_type, med_cents, dev_cents AS mad_cents
        FROM dev_ranked WHERE rn = CAST(ceil(n / 2.0) AS BIGINT)
    )
    SELECT d.event_type, a.med_cents, a.mad_cents,
           CAST(SUM(CASE WHEN d.dev_cents > 3 * a.mad_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM devs d JOIN mad a ON d.event_type = a.event_type
    GROUP BY d.event_type, a.med_cents, a.mad_cents
    """,
)
def stats_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per event type: positional median +
    median absolute deviation (both exact integer-cent medians with
    full tie-break — the median_disc pattern applied twice), then a
    count of values beyond 3 MADs. The robust alternative to
    mean±3sigma that a pipeline runs on metric streams where a few
    extreme values poison the mean. Two window passes + one broadcast
    of the 5-row per-type medians."""
    e = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.round(F.col("value") * 100).cast("long")
    vals = e.select("event_type", "event_id", cents.alias("cents"))
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = vals.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    med = ranked.filter(
        F.col("rn") == F.ceil(F.col("n") / 2.0).cast("long")
    ).select("event_type", F.col("cents").alias("med_cents"))
    devs = vals.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("dev_cents"),
    )
    wd = Window.partitionBy("event_type").orderBy("dev_cents", "event_id")
    dev_ranked = devs.select(
        "event_type",
        "med_cents",
        "dev_cents",
        F.row_number().over(wd).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    mad = dev_ranked.filter(
        F.col("rn") == F.ceil(F.col("n") / 2.0).cast("long")
    ).select("event_type", "med_cents", F.col("dev_cents").alias("mad_cents"))
    return (
        devs.drop("med_cents")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med_cents", "mad_cents")
        .agg(
            F.sum(
                F.when(F.col("dev_cents") > 3 * F.col("mad_cents"), 1)
                .otherwise(0)
            ).alias("n_outliers")
        )
    )


@register(
    "events_markov_transitions",
    """
    WITH seq AS (
        SELECT event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events
    ),
    cnt AS (
        SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
        FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT event_type, next_type, n,
           CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS n_from,
           CAST(n AS DOUBLE)
               / CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT)
               AS prob
    FROM cnt
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences — the behavioral-sequence statistics a session-model or
    next-event-prediction dataset is built from.

    One user-keyed window (lead) orders each user's stream in
    event-time, one grouped count per (from, to) pair, and the row
    probability is an exact integer ratio via a sum window over the
    |types|²-bounded transition table (domain-bounded — never
    corpus-scale). The (ts, event_id) sort key is the repo's total
    order for event streams."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    cnt = seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    wt = Window.partitionBy("event_type")
    n_from = F.sum("n").over(wt).cast("long")
    return cnt.select(
        "event_type", "next_type", "n",
        n_from.alias("n_from"),
        (F.col("n").cast("double") / n_from).alias("prob"),
    )


@register(
    "stats_key_skew",
    """
    WITH per_key AS (
        SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS n_keys FROM per_key)
    SELECT p.key, p.n, t.total, t.n_keys,
           CAST(p.n AS DOUBLE) / t.total AS share,
           (CAST(p.n AS DOUBLE) * t.n_keys) / t.total AS skew_factor
    FROM per_key p CROSS JOIN tot t
    ORDER BY p.n DESC, p.key LIMIT 10
    """,
)
def stats_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the 10 heaviest order→customer keys
    with their share of all rows and skew factor (multiple of the
    uniform per-key load) — the report that decides whether a join
    needs salting or AQE skew handling (operators/skew.py is the
    remedy this measures for).

    One grouped count, a 1-row totals broadcast, TakeOrdered top-10 —
    no global window."""
    o = read_table(spark, sf_dir, "orders")
    per_key = o.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = per_key.agg(
        F.sum("n").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "key", "n", "total", "n_keys",
            (F.col("n").cast("double") / F.col("total")).alias("share"),
            (
                (F.col("n").cast("double") * F.col("n_keys")) / F.col("total")
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(10)
    )


@register(
    "orders_seasonal_naive",
    """
    WITH monthly AS (
        SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS yr,
               CAST(date_part('month', o_orderdate) AS BIGINT) AS mo,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM orders GROUP BY 1, 2
    ),
    with_lag AS (
        SELECT yr, mo, revenue_cents,
               lag(revenue_cents, 12) OVER (ORDER BY yr, mo)
                   AS forecast_cents
        FROM monthly
    )
    SELECT yr, mo, revenue_cents, forecast_cents,
           revenue_cents - forecast_cents AS error_cents,
           CAST(abs(revenue_cents - forecast_cents) AS DOUBLE)
               / forecast_cents AS ape
    FROM with_lag WHERE forecast_cents IS NOT NULL
    """,
)
def orders_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast evaluation: each month's revenue vs the
    same month last year (lag 12 over the month series), with exact
    integer-cent errors and the absolute percentage error as one
    division — the baseline every demand-forecast model must beat,
    and the shape of a backtest query.

    The month series is a bounded domain (years × 12), so the single
    ordered window over it is dimension-scale, never data-scale — the
    stats_ks_drift bounded-global-window argument; the heavy work is
    the one grouped cent-sum underneath."""
    o = read_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("revenue_cents")
    )
    w = Window.orderBy("yr", "mo")
    out = monthly.withColumn(
        "forecast_cents", F.lag("revenue_cents", 12).over(w)
    ).filter(F.col("forecast_cents").isNotNull())
    err = F.col("revenue_cents") - F.col("forecast_cents")
    return out.select(
        "yr", "mo", "revenue_cents", "forecast_cents",
        err.alias("error_cents"),
        (F.abs(err).cast("double") / F.col("forecast_cents")).alias("ape"),
    )


@register(
    "events_churn_training_set",
    """
    WITH horizon AS (SELECT max(ts) AS max_ts FROM events),
    feat AS (
        SELECT e.user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(COALESCE(SUM(CASE WHEN e.event_type = 'purchase'
                        THEN CAST(ROUND(COALESCE(e.value, 0) * 100)
                                  AS BIGINT) ELSE 0 END), 0) AS BIGINT)
                   AS revenue_cents,
               CAST(count(DISTINCT CAST(e.ts AS DATE)) AS BIGINT)
                   AS days_active,
               CAST(date_diff('second', max(e.ts), h.max_ts) AS BIGINT)
                   AS silence_secs
        FROM events e CROSS JOIN horizon h
        GROUP BY e.user_id, h.max_ts
    )
    SELECT user_id, n_events, revenue_cents, days_active, silence_secs,
           (silence_secs >= 86400) AS churned
    FROM feat
    """,
)
def events_churn_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-set assembly: per-user behavioral features plus a churn
    label (no activity in the horizon's last DAY — the threshold is
    scaled to the fixture's ~3-day event span; production would use
    weeks) — the
    feature-and-label generation step between the event store and a
    churn model, with every feature an exact integer (counts, cents,
    distinct days, silence seconds).

    One user-keyed aggregation; the label threshold compares exact
    integer seconds against the single-scalar horizon (1-row broadcast
    — the streaming-gate max-ts discipline)."""
    e = read_table(spark, sf_dir, "events")
    horizon = e.agg(F.max("ts").alias("max_ts"))
    feat = (
        e.crossJoin(F.broadcast(horizon))
        .groupBy("user_id", "max_ts")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.round(F.coalesce(F.col("value"), F.lit(0.0)) * 100)
                        .cast("long"),
                    ).otherwise(0)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("revenue_cents"),
            F.countDistinct(F.col("ts").cast("date"))
            .cast("long")
            .alias("days_active"),
            (
                F.unix_timestamp(F.col("max_ts"))
                - F.unix_timestamp(F.max("ts"))
            )
            .cast("long")
            .alias("silence_secs"),
        )
    )
    return feat.select(
        "user_id", "n_events", "revenue_cents", "days_active", "silence_secs",
        (F.col("silence_secs") >= 86400).alias("churned"),
    )


@register(
    "events_dau_wau_stickiness",
    """
    WITH user_days AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    ),
    days AS (SELECT DISTINCT d FROM user_days),
    dau AS (
        SELECT d, CAST(count(*) AS BIGINT) AS dau FROM user_days GROUP BY 1
    ),
    wau AS (
        SELECT days.d,
               CAST(count(DISTINCT ud.user_id) AS BIGINT) AS wau
        FROM days JOIN user_days ud
          ON ud.d > days.d - INTERVAL 7 DAY AND ud.d <= days.d
        GROUP BY 1
    )
    SELECT dau.d AS day, dau.dau, wau.wau,
           CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
    FROM dau JOIN wau ON dau.d = wau.d
    """,
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the canonical
    product-engagement triple, computed exactly (a sliding DISTINCT
    cannot ride a plain window frame, so the WAU is a bounded range
    join: the day dimension is ~365 rows/year however large the event
    stream, and the heavy side is the deduped user-day table, not raw
    events). Stickiness is one division of exact counts."""
    e = read_table(spark, sf_dir, "events")
    user_days = e.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    # user_days feeds dau, the day dim, and the range join probe
    user_days = user_days.localCheckpoint(eager=True)
    days = user_days.select("d").distinct()
    dau = user_days.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    ud = user_days.select(
        F.col("d").alias("ud_d"), F.col("user_id")
    )
    wau = (
        days.join(
            ud,
            (F.col("ud_d") > F.date_sub(F.col("d"), 7))
            & (F.col("ud_d") <= F.col("d")),
        )
        .groupBy("d")
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )
    return (
        dau.join(wau, "d")
        .select(
            F.col("d").alias("day"), "dau", "wau",
            (F.col("dau").cast("double") / F.col("wau")).alias("stickiness"),
        )
    )


@register(
    "events_gapfill_locf",
    """
    WITH bounds AS (
        SELECT CAST(min(ts) AS DATE) AS mn, CAST(max(ts) AS DATE) AS mx
        FROM events
    ),
    users AS (SELECT DISTINCT user_id FROM events),
    spine AS (
        SELECT user_id,
               CAST(unnest(generate_series(mn::TIMESTAMP, mx::TIMESTAMP,
                                           INTERVAL 1 DAY)) AS DATE) AS day
        FROM users, bounds
    ),
    daily AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
               max(CAST(round(value * 100) AS BIGINT)) AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT s.user_id, s.day,
           CAST(last_value(d.cents IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100 AS value_filled,
           d.cents IS NOT NULL AS is_observed
    FROM spine s LEFT JOIN daily d
      ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-spine gap fill with last-observation-carried-forward: every
    (user, day) cell of the dense daily grid gets the user's most
    recent observed daily max value (NULL before the first
    observation). The canonical resampling/imputation step a
    feature-engineering pipeline runs before windowed training joins.

    Scale: the spine is a map-side ``explode(sequence(mn, mx))`` per
    user row — users × days rows, generated in place, never a
    cartesian shuffle; the single 1-row bounds aggregate rides the
    documented broadcast-scalar pattern (audit-allowlisted). The fill
    is one window per user over its own ordered days — linear state,
    partition-local. The value rides the exact-cents idiom so both
    engines compare integers until the final /100."""
    e = read_table(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("value").isNotNull())
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.max(F.round(F.col("value") * 100).cast("long")).alias("cents")
        )
    )
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("mn"),
        F.max(F.col("ts").cast("date")).alias("mx"),
    )
    spine = (
        e.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select("user_id", F.explode(F.sequence("mn", "mx")).alias("day"))
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        (
            F.last("cents", ignorenulls=True).over(wf).cast("double") / 100
        ).alias("value_filled"),
        F.col("cents").isNotNull().alias("is_observed"),
    )


@register(
    "events_interval_coverage",
    """
    WITH iv AS (
        SELECT event_id, user_id, ts AS s,
               ts + INTERVAL 30 MINUTE AS e
        FROM events
    ),
    m AS (
        SELECT *, max(e) OVER (
            PARTITION BY user_id ORDER BY s, e, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
        ) AS prev_max
        FROM iv
    ),
    f AS (
        SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max
                       THEN 1 ELSE 0 END AS flag
        FROM m
    ),
    isl AS (
        SELECT *, sum(flag) OVER (
            PARTITION BY user_id ORDER BY s, e, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS island
        FROM f
    ),
    agg AS (
        SELECT user_id, island, min(s) AS ms, max(e) AS me
        FROM isl GROUP BY 1, 2
    )
    SELECT user_id, count(*) AS n_islands,
           CAST(sum(epoch_us(me) - epoch_us(ms)) AS BIGINT) AS covered_us
    FROM agg GROUP BY user_id
    """,
)
def events_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Islands-and-gaps interval union: each event opens a 30-minute
    activity interval; overlapping/touching intervals per user merge
    into islands, and the output is each user's island count and total
    covered microseconds. The classic interval-coverage op (ad
    exposure, machine uptime, session stitching by overlap rather than
    gap) that plain GROUP BY cannot express.

    Scale: one hash shuffle on user_id, then everything is
    partition-local ordered-window arithmetic — running max of
    interval ends flags island starts, a running sum numbers them.
    State per partition is O(1); no self-join, no cartesian. Ordering
    carries event_id as the final tiebreak so both engines walk ties
    identically."""
    e = read_table(spark, sf_dir, "events")
    iv = e.select(
        "event_id",
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("e"),
    )
    ww = Window.partitionBy("user_id").orderBy("s", "e", "event_id")
    prev_max = F.max("e").over(
        ww.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "flag",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0),
    )
    isl = flagged.withColumn(
        "island",
        F.sum("flag").over(
            ww.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per = isl.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum(F.unix_micros("me") - F.unix_micros("ms"))
        .cast("long")
        .alias("covered_us"),
    )
