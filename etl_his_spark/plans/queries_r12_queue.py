"""Round-12 gate queue — REGISTERED in round 12 (module tail loop).

Written and tri-scale-proven in round 11 under the
≤10-additions-per-round cap, exactly like ``queries_r10_queue.py``
(written r9, registered r10) and ``queries_r11_queue.py`` (written
r10, registered r11). ``R12_QUEUE`` maps name -> (query fn, DuckDB
oracle); ``tests/test_r12_queue.py`` runs the REAL driver-style
canonicalized comparison over every entry each pytest run, and the
loop at the bottom publishes each entry into the driver registry.
One r12 registration-day code change: the bottom-k dedup moved from
dropDuplicates to a deterministic groupBy-min mirrored in the oracle
(ADVICE r11 low — see _bottomk_daily).

The slate (why each earns a gate at 100 TB):

- ``sketch_bottomk_quantiles`` — deterministic mergeable quantile
  sketch: per (type, day) keep the k rows with the smallest 60-bit
  md5 hash of the event id (a bottom-k sketch IS a uniform sample,
  and bottom-k is a monoid: global bottom-k of daily bottom-ks ≡
  bottom-k over raw). Daily partials merged at read time answer
  percentile dashboards without re-scanning raw — the deterministic,
  cross-engine-exact stand-in for the t-digest rollup (r10 verdict
  item 8 candidate #1).
- ``dedup_snapshot_incremental`` — cross-snapshot corpus merge: each
  new-batch doc is classified exact-carry (normalized fingerprint
  already in the old snapshot — a sorted-merge-able join), near-dup
  (verified 3-gram Jaccard ≥ 0.7 against the old snapshot via the
  inverted-index join — new×old postings, never corpus²), or new.
  The decision table every incremental corpus refresh runs (r10
  verdict item 8 candidate #2).
- ``retrieval_mrr_eval`` — known-item retrieval eval: MRR@10 of the
  cheap shared-shingle retrieval scorer against Jaccard-verified
  near-dup truth. Like ann_recall_eval / dedup_lsh_eval, this is the
  measured basis for trusting a cheaper retrieval stage before a
  100 TB rollout; reciprocal ranks in exact integer micro
  (1e6 div rank — no irrational log-DCG discount).
- ``text_readability_scores`` — per-source Flesch-style readability
  in pure integer micro-units (vowel-group syllable proxy, sentence
  split on [.!?]+ runs): a layout/boilerplate quality signal. Sums,
  not averages, cross the engine boundary (truncating division on a
  possibly-negative numerator differs between engines).
- ``lakehouse_compaction_plan`` — small-file compaction planning:
  per partition, files are binned into target-size groups by
  cumulative-size div target. The window runs over the MANIFEST
  (files-per-partition bounded), never the data — planning a 100 TB
  compaction reads kilobytes.
- ``graph_kcore`` — 3 fixed peeling rounds toward the k-core (drop
  nodes with degree < k, recount): the classic graph-density
  primitive after PageRank / triangles / components / label
  propagation. One degree-agg + one semi-join per round; 3-row
  result.
- ``ann_knn_graph`` — kNN-graph construction (top-3 in-cell
  neighbors by integer-quantized dot, sign-LSH cells): the input
  graph for clustering and SemDeDup at scale. Per-cell pair work
  only, never corpus².
- ``corpus_token_gini`` — per-source Gini concentration of token
  frequencies via the exact integer rank form Σ(2i−n−1)·c_i: flags
  template/boilerplate sources where few tokens carry the mass
  (complements text_zipf_fit's slope with a bounded [0,1) index).
- ``events_path_mining`` — top-20 3-step event-type paths within
  sessions (lead() over user+session, one groupBy, TakeOrdered):
  the user-journey n-gram miner, the sequence analog of the funnel
  gates.
- ``streaming_bottomk_agree`` — the tenth live streaming lane: the
  bottom-k sketch maintained by foreachBatch monoid merges (per
  micro-batch: partial bottom-k; store ← bottom-k(store ∪ partial)),
  hash-equal to the batch sketch under the SAME oracle. Bottom-k is
  a commutative idempotent monoid, so the result is provably
  independent of micro-batch layout — no watermark boundary in the
  contract at all. (A watermark LATE-DATA drop gate was designed
  first and rejected after a crafted boundary experiment: this
  Spark applies the watermark with a one-batch lag and MERGES late
  rows into still-live window state rather than dropping them —
  numRowsDroppedByWatermark stayed 0 even for rows 2 h past the
  watermark — so a drop-prediction oracle would pin version-fragile
  internals, exactly the boundary hazard the streaming module
  docstring warns about. The experiment is recorded in SCALE.md
  round-11.)

Every score is integer or fixed-point micro-units; every hash is the
repo's 60-bit md5 — both engines run bit-identical arithmetic, so the
gates are hash-exact, not approximately equal.

Registration-day checklist (EXECUTED in r12, the r10/r11-queue
pattern): the loop at the module tail registers every entry, the
names ride bench.py HEADLINE and the registry _CHECK_FIRST window
(after the seventeen queued r6-last leaders), and the audit
allowlists carry these entries (re-verified at sf0.001 on
registration day):
- ``tools/audit_plans.py`` SINGLE_PARTITION_ALLOW: ``graph_kcore``
  (three 1-row per-round stats aggregates). The other predicted
  entries measured CLEAN at sf0.001 and were NOT added:
  lakehouse_compaction_plan and corpus_token_gini window on
  part/source keys (no SinglePartition), and no gate builds a
  cartesian/nested-loop plan.
- ``tools/audit_scans.py`` ALLOW: ``dedup_snapshot_incremental``
  ("documents", 5 — fp lanes + residual + two shingle-pin builds);
  ``retrieval_mrr_eval`` measured 1 documents scan (single eager
  shingle pin), no entry needed.
- ``graph_kcore`` gained a registration-day base pin: the unpinned
  distinct lineitem⋈orders base fed both arms of the symmetric edge
  union (measured 4 scans of each input → 1 with the pin).

Tri-scale proof: R12_QUEUE_SCALE.json (r11 same-day run) — 30/30
oracle-green at sf0.001/0.01/0.1, all fitted exponents ≤ 0.45.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Finish the registry's plan-module import chain first (same
# circular-import note as queries_r11_queue).
from .. import registry as _registry  # noqa: F401

from ..operators.dedup_approx import seeded_hash60, word_shingles
from ..sources.readers import read_table

# ---------------------------------------------------------------------------
# sketch_bottomk_quantiles — mergeable bottom-k quantile sketch rollup
# ---------------------------------------------------------------------------

BOTTOMK_K = 128

BOTTOMK_ORACLE = f"""
    WITH hashed AS (
        SELECT event_type, CAST(ts AS DATE) AS day, event_id,
               CAST(floor(value * 1000000e0) AS BIGINT) AS value_micro,
               CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h
        FROM events
    ),
    -- Mirrors the Spark side's deterministic per-(type, day, id)
    -- min-value dedup (ADVICE r11: the previous dropDuplicates had no
    -- oracle twin and picked an arbitrary survivor among duplicate
    -- event_ids; groupBy-min is deterministic on BOTH engines even if
    -- a future fixture carries duplicate ids with different values).
    deduped AS (
        SELECT event_type, day, event_id,
               min(value_micro) AS value_micro, min(h) AS h
        FROM hashed GROUP BY 1, 2, 3
    ),
    daily AS (
        SELECT event_type, event_id, value_micro, h
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY event_type, day ORDER BY h, event_id) AS rk
              FROM deduped)
        WHERE rk <= {BOTTOMK_K}
    ),
    merged AS (
        SELECT event_type, event_id, value_micro
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY event_type ORDER BY h, event_id) AS grk
              FROM daily)
        WHERE grk <= {BOTTOMK_K}
    ),
    ranked AS (
        SELECT event_type, value_micro,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY value_micro, event_id) AS vrk,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM merged
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_sample,
           max(CASE WHEN vrk = (50 * n + 99) // 100
               THEN value_micro END) AS q50_micro,
           max(CASE WHEN vrk = (95 * n + 99) // 100
               THEN value_micro END) AS q95_micro
    FROM ranked GROUP BY 1
"""


def _bottomk_project(ev: DataFrame) -> DataFrame:
    """Shared projection of an events frame (batch or micro-batch)
    into the sketch's input columns — identical expressions on both
    the batch gate and the streaming twin keep them hash-comparable."""
    return ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        "event_id",
        F.floor(F.col("value") * F.lit(1000000.0)).cast("long").alias(
            "value_micro"
        ),
        seeded_hash60(F.col("event_id").cast("string")).alias("h"),
    )


def _bottomk_daily(projected: DataFrame) -> DataFrame:
    """Per-(type, day) bottom-k partials — the monoid the lakehouse
    persists. The per-(type, day, id) min-value dedup first makes the
    merge IDEMPOTENT: an at-least-once replay of a micro-batch
    re-unions rows that the key dedup collapses before ranking, so
    re-applying a batch is a no-op (the CDC lane's idempotence
    argument, monoid form). groupBy-min rather than dropDuplicates
    (ADVICE r11): min picks a DETERMINISTIC survivor, mirrored exactly
    in the oracle's deduped CTE, so duplicate event_ids with different
    values cannot cause a nondeterministic mismatch. ``h`` is a pure
    function of event_id, so min(h) = h within any key group."""
    wd = Window.partitionBy("event_type", "day").orderBy("h", "event_id")
    deduped = projected.groupBy("event_type", "day", "event_id").agg(
        F.min("value_micro").alias("value_micro"), F.min("h").alias("h")
    )
    return (
        deduped.withColumn("rk", F.row_number().over(wd))
        .filter(F.col("rk") <= BOTTOMK_K)
        .select("event_type", "day", "event_id", "value_micro", "h")
    )


def _bottomk_quantiles(daily: DataFrame) -> DataFrame:
    """Merge-at-read + quantile pick over the ≤k-rows-per-type sample
    (the batch gate's merged/ranked stages, shared with the streaming
    twin)."""
    wg = Window.partitionBy("event_type").orderBy("h", "event_id")
    merged = (
        daily.withColumn("grk", F.row_number().over(wg))
        .filter(F.col("grk") <= BOTTOMK_K)
        .select("event_type", "event_id", "value_micro")
    )
    wv = Window.partitionBy("event_type").orderBy("value_micro", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = merged.select(
        "event_type",
        "value_micro",
        F.row_number().over(wv).alias("vrk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_sample"),
        F.max(
            F.when(
                F.col("vrk") == F.expr("(50 * n + 99) div 100"),
                F.col("value_micro"),
            )
        ).alias("q50_micro"),
        F.max(
            F.when(
                F.col("vrk") == F.expr("(95 * n + 99) div 100"),
                F.col("value_micro"),
            )
        ).alias("q95_micro"),
    )


def sketch_bottomk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch: per-(type, day) bottom-k-by-hash
    partials, merged at read into a global bottom-k per type, then
    exact quantiles over the resulting deterministic uniform sample.

    Bottom-k is a monoid (the global k smallest hashes are each among
    their own day's k smallest), so daily partials merged at read time
    ≡ the sketch over raw — the same rollup contract the HLL/CMS/
    histogram gates pin, here for quantiles with k rows per (type,
    day) of state at ANY corpus size. Everything is rank arithmetic
    over (hash, id) — no RNG, no floats except the value's own
    micro-quantization — so the gate is hash-exact.

    Plan: one shuffle to (type, day) for the daily rank, one
    (type)-keyed rank over k·days rows, one rank over k rows per type
    for the quantile pick. The merged/ranked windows touch ≤ k rows
    per type — report-sized by construction.
    """
    ev = read_table(spark, sf_dir, "events")
    return _bottomk_quantiles(_bottomk_daily(_bottomk_project(ev)))


# ---------------------------------------------------------------------------
# text_readability_scores — per-source integer Flesch-style readability
# ---------------------------------------------------------------------------

READABILITY_ORACLE = r"""
    WITH scored AS (
        SELECT source,
               206835000
               - (1015000 * w) // s
               - (84600000 * syl) // w AS fre_micro
        FROM (
            SELECT source,
                   CAST(len(list_filter(string_split(trim(text), ' '),
                                        x -> x <> '')) AS BIGINT) AS w,
                   CAST(len(regexp_extract_all(text, '[aeiou]+'))
                        AS BIGINT) AS syl,
                   greatest(CAST(1 AS BIGINT),
                            CAST(len(regexp_extract_all(text, '[.!?]+'))
                                 AS BIGINT)) AS s
            FROM documents WHERE text IS NOT NULL
        )
        WHERE w > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(fre_micro) AS BIGINT) AS sum_fre_micro,
           CAST(sum(CASE WHEN fre_micro >= 60000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_easy,
           CAST(sum(CASE WHEN fre_micro >= 30000000
                          AND fre_micro < 60000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_medium,
           CAST(sum(CASE WHEN fre_micro >= 0
                          AND fre_micro < 30000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hard,
           CAST(sum(CASE WHEN fre_micro < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_very_hard
    FROM scored GROUP BY 1
"""


def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Flesch-reading-ease readability in integer
    micro-units: 206.835 − 1.015·(words/sentences) − 84.6·(syll/words),
    with vowel-group runs as the syllable proxy and [.!?]+ runs as
    sentence breaks (min 1).

    Both divisions are integer `div` with POSITIVE operands, so
    truncation is identical in both engines; the per-source report
    publishes the SUM of doc scores (exact integer), not the average —
    dividing a possibly-negative sum would hit the trunc-vs-floor
    divergence between Spark's `div` and a SQL engine's `//`.
    Map-only scoring + one hash-agg: linear at any corpus size.
    """
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    w = F.size(
        F.filter(F.split(F.trim("text"), " "), lambda x: x != F.lit(""))
    ).cast("long")
    syl = F.expr("size(regexp_extract_all(text, '[aeiou]+', 0))").cast(
        "long"
    )
    s = F.greatest(
        F.lit(1).cast("long"),
        F.expr("size(regexp_extract_all(text, '[.!?]+', 0))").cast("long"),
    )
    scored = (
        docs.select("source", w.alias("w"), syl.alias("syl"), s.alias("s"))
        .filter(F.col("w") > 0)
        .select(
            "source",
            (
                F.lit(206835000).cast("long")
                - F.expr("(1015000 * w) div s")
                - F.expr("(84600000 * syl) div w")
            ).alias("fre_micro"),
        )
    )
    f = F.col("fre_micro")
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("fre_micro").cast("long").alias("sum_fre_micro"),
        F.sum(F.when(f >= 60000000, 1).otherwise(0))
        .cast("long")
        .alias("n_easy"),
        F.sum(F.when((f >= 30000000) & (f < 60000000), 1).otherwise(0))
        .cast("long")
        .alias("n_medium"),
        F.sum(F.when((f >= 0) & (f < 30000000), 1).otherwise(0))
        .cast("long")
        .alias("n_hard"),
        F.sum(F.when(f < 0, 1).otherwise(0)).cast("long").alias(
            "n_very_hard"
        ),
    )


# ---------------------------------------------------------------------------
# corpus_token_gini — per-source Gini concentration of token counts
# ---------------------------------------------------------------------------

GINI_ORACLE = """
    WITH counts AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS c
        FROM (
            SELECT source,
                   unnest(list_filter(string_split(trim(text), ' '),
                                      x -> x <> '')) AS token
            FROM documents WHERE text IS NOT NULL
        )
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT source, c,
               row_number() OVER (
                   PARTITION BY source ORDER BY c, token) AS i,
               count(*) OVER (PARTITION BY source) AS n,
               sum(c) OVER (PARTITION BY source) AS tot
        FROM counts
    )
    SELECT source,
           CAST(max(n) AS BIGINT) AS vocab,
           CAST(max(tot) AS BIGINT) AS n_tokens,
           CAST((1000000 * sum((2 * i - n - 1) * c)) // (max(n) * max(tot))
                AS BIGINT) AS gini_micro
    FROM ranked GROUP BY 1
"""


def corpus_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gini concentration of the token-frequency
    distribution via the exact rank identity
    G = Σᵢ (2i − n − 1)·cᵢ / (n·Σc) with counts ranked ascending
    (ties by token) — all-integer, so hash-exact cross-engine.
    High Gini = few tokens carry the mass = template/boilerplate
    source; complements text_zipf_fit's slope.

    Plan: one token-count shuffle, then a rank window over the
    VOCAB-bounded per-source count table (≤|V| rows at any corpus
    size — the stats_ks_drift bounded-window argument). int64
    headroom: the numerator is ≤ 2·n·Σc and carries a 1e6 factor, so
    vocab·tokens per source must stay ≲ 9e12·1e6/2 — beyond that,
    publish milli instead (scale note, not reachable at gate scale).
    """
    toks = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "source",
            F.explode(
                F.filter(
                    F.split(F.trim("text"), " "), lambda x: x != F.lit("")
                )
            ).alias("token"),
        )
    )
    counts = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wr = Window.partitionBy("source").orderBy("c", "token")
    ws = Window.partitionBy("source")
    ranked = counts.select(
        "source",
        "c",
        F.row_number().over(wr).cast("long").alias("i"),
        F.count(F.lit(1)).over(ws).cast("long").alias("n"),
        F.sum("c").over(ws).cast("long").alias("tot"),
    )
    return ranked.groupBy("source").agg(
        F.max("n").cast("long").alias("vocab"),
        F.max("tot").cast("long").alias("n_tokens"),
        F.expr(
            "CAST((1000000 * sum((2 * i - n - 1) * c))"
            " div (max(n) * max(tot)) AS BIGINT)"
        ).alias("gini_micro"),
    )


# ---------------------------------------------------------------------------
# events_path_mining — top-20 3-step event-type paths within sessions
# ---------------------------------------------------------------------------

PATHS_TOP = 20

PATHS_ORACLE = f"""
    WITH marked AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                         >= 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM marked
    ),
    steps AS (
        SELECT event_type AS e1,
               lead(event_type, 1) OVER w2 AS e2,
               lead(event_type, 2) OVER w2 AS e3
        FROM numbered
        WINDOW w2 AS (PARTITION BY user_id, session_id
                      ORDER BY ts, event_id)
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM steps WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT {PATHS_TOP}
"""


def events_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PATHS_TOP} 3-step event-type paths within 30-minute-gap
    sessions — the user-journey n-gram miner (sequence analog of the
    funnel gates; session convention matches
    streaming_attribution_agree's ≥-gap rule).

    Plan: one user-keyed shuffle shared by the session-number and
    lead() windows (same partition key), one path groupBy, global
    top-k via orderBy+limit (TakeOrdered — per-partition heaps, no
    single-partition exchange at any corpus size).
    """
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_micros, NOT cast("long") (which truncates to seconds),
    # matching the oracle's epoch_us.
    marked = ev.withColumn(
        "new_session",
        F.when(
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wu)
            >= 1800 * 1000000,
            1,
        ).otherwise(0),
    )
    numbered = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w2 = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    steps = numbered.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w2).alias("e2"),
        F.lead("event_type", 2).over(w2).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        steps.select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(PATHS_TOP)
    )


# ---------------------------------------------------------------------------
# graph_kcore — 3 peeling rounds toward the k-core of the trade graph
# ---------------------------------------------------------------------------

KCORE_K = 3
KCORE_ROUNDS = 3


def _kcore_oracle(k: int, rounds: int) -> str:
    parts = ["""
    base AS (
        SELECT DISTINCT 'S' || CAST(l_suppkey AS VARCHAR) AS s_node,
               'C' || CAST(o_custkey AS VARCHAR) AS c_node
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    e0 AS (
        SELECT s_node AS src, c_node AS dst FROM base
        UNION ALL
        SELECT c_node AS src, s_node AS dst FROM base
    )"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
    d{r} AS (SELECT src AS node, count(*) AS deg FROM e{r - 1} GROUP BY 1),
    k{r} AS (SELECT node FROM d{r} WHERE deg >= {k}),
    e{r} AS (
        SELECT e.src, e.dst FROM e{r - 1} e
        JOIN k{r} a ON e.src = a.node
        JOIN k{r} b ON e.dst = b.node
    )""")
    stats = "\n    UNION ALL\n".join(
        f"""    SELECT CAST({r} AS BIGINT) AS round,
               CAST(count(DISTINCT src) AS BIGINT) AS n_nodes,
               CAST(count(*) AS BIGINT) AS n_directed_edges
        FROM e{r}"""
        for r in range(1, rounds + 1)
    )
    return "WITH " + "".join(parts) + "\n" + stats


KCORE_ORACLE = _kcore_oracle(KCORE_K, KCORE_ROUNDS)


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three synchronous peeling rounds toward the 3-core (KCORE_K)
    of the supplier↔customer trade graph: each round
    recounts degrees and drops nodes below k, keeping only edges whose
    BOTH endpoints survive. Fixed unrolled horizon (the PageRank/LPA
    discipline) keeps the plan static and the oracle expressible as
    chained CTEs; full convergence at 100 TB would iterate the same
    one-degree-agg + two-semi-join round to a fixed point.

    Each round: one degree aggregation + two broadcast-able keeper
    joins — the surviving-node dim shrinks monotonically. The per-round
    stats rows are 1-row final aggregates (report-sized).
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias(
                "s_node"
            ),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias(
                "c_node"
            ),
        )
        .distinct()
    )
    # base feeds BOTH arms of the symmetric edge union: pin it so the
    # lineitem⋈orders distinct runs once, not once per arm (measured
    # at registration: 4 li/orders scans → 1 with the pin).
    base = base.localCheckpoint(eager=False)
    edges = base.select(
        F.col("s_node").alias("src"), F.col("c_node").alias("dst")
    ).unionAll(
        base.select(
            F.col("c_node").alias("src"), F.col("s_node").alias("dst")
        )
    )
    stats = []
    # r13 A/B note: replacing the per-round degree agg + two keeper
    # joins with two count windows over the edge list was tried and
    # reverted (fresh-JVM min-of-3: 4.85→5.09 s) — the windows shuffle
    # FULL edge rows twice per round, while the degree agg shuffles
    # only map-side partial counts and AQE converts the node-dim-sized
    # keeper joins to broadcasts at runtime.
    for r in range(1, KCORE_ROUNDS + 1):
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= KCORE_K).select(
            F.col("src").alias("node")
        )
        # keep feeds both endpoint joins of the next round AND (via
        # edges) the stats row: pin it so the degree agg runs once.
        keep = keep.localCheckpoint(eager=False)
        edges = (
            edges.join(keep.withColumnRenamed("node", "src"), "src")
            .join(keep.withColumnRenamed("node", "dst"), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        stats.append(
            edges.agg(
                F.lit(r).cast("long").alias("round"),
                F.countDistinct("src").cast("long").alias("n_nodes"),
                F.count(F.lit(1)).cast("long").alias("n_directed_edges"),
            )
        )
    out = stats[0]
    for s in stats[1:]:
        out = out.unionAll(s)
    return out


# ---------------------------------------------------------------------------
# lakehouse_compaction_plan — manifest bin-packing into target groups
# ---------------------------------------------------------------------------

COMPACT_TARGET = 8_000_000  # proxy bytes per compaction group

COMPACT_ORACLE = f"""
    WITH manifest AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS part,
               o_orderkey % 16 AS file_id,
               CAST(sum(CAST(round(o_totalprice) AS BIGINT))
                    + 100 * count(*) AS BIGINT) AS file_bytes
        FROM orders GROUP BY 1, 2
    ),
    planned AS (
        SELECT part, file_id, file_bytes,
               (sum(file_bytes) OVER (
                    PARTITION BY part
                    ORDER BY file_bytes DESC, file_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - file_bytes) // {COMPACT_TARGET} AS grp
        FROM manifest
    )
    SELECT part, CAST(grp AS BIGINT) AS grp,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(file_bytes) AS BIGINT) AS group_bytes
    FROM planned GROUP BY 1, 2
"""


def lakehouse_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning: simulate a file manifest (one
    "file" per (month partition, write bucket), sized by a byte
    proxy), then bin files into compaction groups by exclusive
    running-size div target — file i starts a new group when the
    bytes before it cross a group boundary (first-fit by cumulative
    sum, largest files first for stable packing).

    The plan's window runs over the MANIFEST — files-per-partition is
    bounded by the writer's bucket count at any data size — so
    planning a 100 TB compaction reads/sorts kilobytes of metadata,
    never data. All integer arithmetic (exclusive cumsum, `div`).
    """
    orders = read_table(spark, sf_dir, "orders")
    manifest = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("part"),
        (F.col("o_orderkey") % 16).alias("file_id"),
    ).agg(
        (
            F.sum(F.round("o_totalprice").cast("long"))
            + 100 * F.count(F.lit(1))
        )
        .cast("long")
        .alias("file_bytes")
    )
    wcum = (
        Window.partitionBy("part")
        .orderBy(F.desc("file_bytes"), F.asc("file_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    planned = manifest.withColumn(
        "cum", F.sum("file_bytes").over(wcum)
    ).withColumn(
        "grp",
        F.expr(f"(cum - file_bytes) div {COMPACT_TARGET}").cast("long"),
    )
    return planned.groupBy("part", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("file_bytes").cast("long").alias("group_bytes"),
    )


# ---------------------------------------------------------------------------
# ann_knn_graph — top-3 in-cell neighbors by integer-quantized dot
# ---------------------------------------------------------------------------

KNN_BITS = 8   # sign-LSH cell = 8 sign bits over dims 1..8
KNN_TOP = 3

_KNN_CELL_SQL = " + ".join(
    f"(CASE WHEN e[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
    for j in range(KNN_BITS)
)

KNN_ORACLE = f"""
    WITH vi AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 1000) AS BIGINT)) AS q
        FROM embeddings
    ),
    cells AS (
        SELECT vec_id, q, {_KNN_CELL_SQL} AS cell FROM vi
    ),
    pairs AS (
        SELECT a.vec_id, b.vec_id AS neighbor_id,
               CAST(list_sum(list_transform(range(1, 65),
                    i -> a.q[i] * b.q[i])) AS BIGINT) AS dot_q
        FROM cells a JOIN cells b
          ON a.cell = b.cell AND a.vec_id <> b.vec_id
    )
    SELECT vec_id, neighbor_id, dot_q,
           CAST(rk AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY vec_id
              ORDER BY dot_q DESC, neighbor_id) AS rk
          FROM pairs)
    WHERE rk <= {KNN_TOP}
"""


def ann_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-graph construction — each vector's top-3 neighbors by
    integer milli-quantized dot product, restricted to its sign-LSH
    cell (8 sign bits): the input graph for graph clustering and
    SemDeDup-style curation at scale.

    The cell equi-join bounds ALL pair work to within-cell pairs
    (the SemDeDup/locality trick — never corpus²); the per-vector
    top-k is a rank window keyed by vec_id. Dots are exact int64
    (|q_i| ≤ 1000 ⇒ per-pair |dot| ≤ 6.4e7): hash-exact
    cross-engine, no float summation order hazard.
    """
    vi = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000).cast("long"),
        ).alias("q"),
    )
    cell = None
    for j in range(KNN_BITS):
        bit = F.when(
            F.element_at("e", j + 1) > 0, F.lit(1 << j)
        ).otherwise(F.lit(0))
        cell = bit if cell is None else cell + bit
    cells = vi.select("vec_id", "q", cell.alias("cell"))
    a = cells.select(
        "cell", F.col("vec_id").alias("vec_id"), F.col("q").alias("a_q")
    )
    b = cells.select(
        "cell",
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("b_q"),
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "neighbor_id",
            F.aggregate(
                F.zip_with("a_q", "b_q", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot_q"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("dot_q"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= KNN_TOP)
        .select("vec_id", "neighbor_id", "dot_q", "rank")
    )


# ---------------------------------------------------------------------------
# dedup_snapshot_incremental — cross-snapshot corpus merge decision table
# ---------------------------------------------------------------------------

# Posting-list document-frequency cap for the residual shingle join
# (r12 verdict item 3): a shingle on more than this many docs (old and
# residual-new sides combined) is boilerplate by definition here — its
# |new postings| × |old postings| product would own the stage at scale
# (the exact hazard the winnow lane's df cap and the LSH lane's bucket
# cap already guard). Capped shingles are EXCLUDED from the
# intersection count while per-doc sizes stay full, the same
# contract-documented asymmetry as weighted_jaccard_pairs
# (operators/dedup_approx.py df_cap): the threshold gets strictly
# harder to meet through boilerplate, never easier. Mirrored exactly
# in the oracle below.
SNAPSHOT_DF_CAP = 64

SNAPSHOT_ORACLE = rf"""
    WITH oldd AS (
        SELECT doc_id, source, text FROM documents
        WHERE text IS NOT NULL AND doc_id % 2 = 0
    ),
    newd AS (
        SELECT doc_id, source, text FROM documents
        WHERE text IS NOT NULL AND doc_id % 2 = 1
    ),
    oldfp AS (
        SELECT DISTINCT
            md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        FROM oldd
    ),
    newfp AS (
        SELECT doc_id, source,
            md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        FROM newd
    ),
    exact AS (
        SELECT n.doc_id FROM newfp n JOIN oldfp o ON n.fp = o.fp
    ),
    resid AS (
        SELECT d.doc_id, d.text FROM newd d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM exact)
    ),
    shw_old AS (
        SELECT doc_id, string_split(trim(text), ' ') AS w FROM oldd
    ),
    shw_new AS (
        SELECT doc_id, string_split(trim(text), ' ') AS w FROM resid
    ),
    sh_old AS (
        SELECT DISTINCT doc_id,
               CAST('0x' || substr(md5(shingle_s), 1, 15) AS BIGINT)
                   AS shingle
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(w) - 1),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                         AS shingle_s
              FROM shw_old WHERE len(w) >= 3)
    ),
    sh_new AS (
        SELECT DISTINCT doc_id,
               CAST('0x' || substr(md5(shingle_s), 1, 15) AS BIGINT)
                   AS shingle
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(w) - 1),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                         AS shingle_s
              FROM shw_new WHERE len(w) >= 3)
    ),
    sizes_old AS (SELECT doc_id, count(*) AS n FROM sh_old GROUP BY 1),
    sizes_new AS (SELECT doc_id, count(*) AS n FROM sh_new GROUP BY 1),
    keep AS (
        SELECT shingle FROM (
            SELECT shingle, count(*) AS df
            FROM (SELECT shingle FROM sh_new
                  UNION ALL SELECT shingle FROM sh_old)
            GROUP BY 1
        ) WHERE df <= {SNAPSHOT_DF_CAP}
    ),
    inter AS (
        SELECT n.doc_id AS n_id, o.doc_id AS o_id, count(*) AS i
        FROM sh_new n
        JOIN keep k ON n.shingle = k.shingle
        JOIN sh_old o ON n.shingle = o.shingle
        GROUP BY 1, 2
    ),
    near AS (
        SELECT DISTINCT inter.n_id AS doc_id
        FROM inter
        JOIN sizes_new sn ON inter.n_id = sn.doc_id
        JOIN sizes_old so ON inter.o_id = so.doc_id
        WHERE 1000 * inter.i >= 700 * (sn.n + so.n - inter.i)
    ),
    classed AS (
        SELECT d.source,
               CASE WHEN e.doc_id IS NOT NULL THEN 'exact_carry'
                    WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
                    ELSE 'new' END AS class
        FROM newd d
        LEFT JOIN exact e ON d.doc_id = e.doc_id
        LEFT JOIN near nr ON d.doc_id = nr.doc_id
    )
    SELECT source, class, CAST(count(*) AS BIGINT) AS n_docs
    FROM classed GROUP BY 1, 2
"""


def snapshot_capped_intersection(
    sh_new: DataFrame, sh_old: DataFrame, df_cap: int = SNAPSHOT_DF_CAP
) -> DataFrame:
    """Per-pair shared-shingle counts ``(n_id, o_id, i)`` from the
    new×old inverted-index join, with posting lists df-capped: a
    shingle on more than ``df_cap`` docs (both sides combined) is
    dropped from the pair join entirely, so one hot boilerplate
    shingle can no longer multiply |new postings| × |old postings|
    (r12 verdict item 3 — the winnow/LSH cap discipline applied to
    the residual join). Per-doc sizes are computed OUTSIDE this
    helper from the full shingle sets, so the Jaccard threshold only
    gets harder to meet through boilerplate, never easier. Inputs are
    distinct (doc_id, shingle) frames."""
    keep = (
        sh_new.select("shingle")
        .union(sh_old.select("shingle"))
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= df_cap)
        .select("shingle")
    )
    return (
        sh_new.select(F.col("doc_id").alias("n_id"), "shingle")
        .join(keep, "shingle")
        .join(
            sh_old.select(F.col("doc_id").alias("o_id"), "shingle"),
            "shingle",
        )
        .groupBy("n_id", "o_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )


def dedup_snapshot_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-snapshot corpus merge: classify every new-batch doc
    (doc_id odd) against the prior snapshot (doc_id even) as
    ``exact_carry`` (normalized fingerprint already present — the
    sorted-merge-able join every snapshot refresh starts with),
    ``near_dup`` (verified 3-gram Jaccard ≥ 0.7 via the new×old
    inverted-index join over df-capped posting lists — shingles on
    more than ``SNAPSHOT_DF_CAP`` docs are dropped from the pair join
    while per-doc sizes stay full, so postings work is
    new-batch-sized AND hot-key-bounded, never corpus²), or ``new``.
    Output: the per-(source, class) decision table an incremental
    ingest publishes.

    Integer Jaccard test (1000·i ≥ 700·(nₐ+n_b−i)) — no division
    crosses the engine boundary; shingles are 60-bit md5 longs (the
    shingle_rows discipline).
    """
    from ..functions.text import normalized_text

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    oldd = docs.filter(F.col("doc_id") % 2 == 0)
    newd = docs.filter(F.col("doc_id") % 2 == 1)
    oldfp = (
        oldd.select(F.md5(normalized_text("text")).alias("fp"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    newfp = newd.select(
        "doc_id", "source", F.md5(normalized_text("text")).alias("fp")
    )
    exact_ids = newfp.join(oldfp, "fp").select("doc_id")
    exact_ids = exact_ids.localCheckpoint(eager=False)
    resid = newd.join(exact_ids, "doc_id", "left_anti").select(
        "doc_id", "text"
    )

    def _sh(df: DataFrame) -> DataFrame:
        return (
            df.select(
                "doc_id",
                F.explode(word_shingles("text")).alias("shingle_s"),
            )
            .select(
                "doc_id", seeded_hash60(F.col("shingle_s")).alias("shingle")
            )
            .distinct()
        )

    # spread (r14, guide §2.5): both shingle explodes ran single-task —
    # oldd is a 1-split file scan and resid inherits that partitioning
    # through the broadcast anti join — so the md5 fan-out serialized.
    # One consumer chain each before the pins (the coverage-curve
    # profile); inputFiles-gated no-op at cluster scale.
    from ..operators.dedup_approx import spread_small_input

    sh_old = _sh(spread_small_input(oldd)).localCheckpoint(eager=False)
    sh_new = _sh(spread_small_input(resid)).localCheckpoint(eager=False)
    sizes_old = sh_old.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_o")
    )
    sizes_new = sh_new.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_n")
    )
    inter = snapshot_capped_intersection(sh_new, sh_old)
    near_ids = (
        inter.join(
            sizes_new.withColumnRenamed("doc_id", "n_id"), "n_id"
        )
        .join(sizes_old.withColumnRenamed("doc_id", "o_id"), "o_id")
        .filter(
            1000 * F.col("i") >= 700 * (F.col("n_n") + F.col("n_o") - F.col("i"))
        )
        .select(F.col("n_id").alias("doc_id"))
        .distinct()
    )
    classed = (
        newd.select("doc_id", "source")
        .join(
            exact_ids.withColumn("is_exact", F.lit(1)), "doc_id", "left"
        )
        .join(
            near_ids.withColumn("is_near", F.lit(1)), "doc_id", "left"
        )
        .select(
            "source",
            F.when(F.col("is_exact") == 1, F.lit("exact_carry"))
            .when(F.col("is_near") == 1, F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("class"),
        )
    )
    return classed.groupBy("source", "class").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


# ---------------------------------------------------------------------------
# retrieval_mrr_eval — MRR@10 of shared-shingle retrieval vs Jaccard truth
# ---------------------------------------------------------------------------

MRR_AT = 10

MRR_ORACLE = f"""
    WITH words AS (
        SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    shs AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                   AS shingle_s
        FROM words WHERE len(w) >= 3
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               CAST('0x' || substr(md5(shingle_s), 1, 15) AS BIGINT)
                   AS shingle
        FROM shs
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle
                           AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT a_id AS query_id, b_id AS target_id FROM inter
        JOIN sizes sa ON inter.a_id = sa.doc_id
        JOIN sizes sb ON inter.b_id = sb.doc_id
        WHERE 1000 * inter.i >= 700 * (sa.n + sb.n - inter.i)
        UNION ALL
        SELECT b_id AS query_id, a_id AS target_id FROM inter
        JOIN sizes sa ON inter.a_id = sa.doc_id
        JOIN sizes sb ON inter.b_id = sb.doc_id
        WHERE 1000 * inter.i >= 700 * (sa.n + sb.n - inter.i)
    ),
    queries AS (SELECT DISTINCT query_id FROM truth),
    scored AS (
        SELECT q.query_id, s.doc_id AS cand_id, count(*) AS score
        FROM queries q
        JOIN sh qs ON qs.doc_id = q.query_id
        JOIN sh s ON s.shingle = qs.shingle AND s.doc_id <> q.query_id
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT query_id, cand_id,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY score DESC, cand_id) AS rk
        FROM scored
    )
    SELECT t.query_id,
           CAST(count(*) AS BIGINT) AS n_targets,
           CAST(min(r.rk) AS BIGINT) AS best_rank,
           CAST(CASE WHEN min(r.rk) <= {MRR_AT}
                THEN 1000000 // min(r.rk) ELSE 0 END AS BIGINT)
               AS rr_micro
    FROM truth t
    JOIN ranked r ON r.query_id = t.query_id
                 AND r.cand_id = t.target_id
    GROUP BY 1
"""


def retrieval_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Known-item retrieval eval: for every doc with a Jaccard-
    verified near-dup (the truth set the dedup gates pin), rank ALL
    docs by shared-distinct-shingle count (the cheap first-stage
    retrieval scorer) and report the best target's rank and its
    reciprocal rank in integer micro (1e6 div rank, 0 beyond @10).

    Like ann_recall_eval / dedup_lsh_eval, this measures a cheap
    stage against verified truth before trusting it at 100 TB. The
    query panel is the near-dup doc set (bounded, ≪ corpus); scoring
    is a posting-list equi-join keyed on the query panel's shingles —
    never corpus². MRR stays integer-exact (no log-discounted DCG,
    which would need irrational arithmetic).
    """
    from ..operators.dedup_approx import shingle_rows

    docs = read_table(spark, sf_dir, "documents")
    sh = shingle_rows(docs).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("a_id"), "shingle")
    b = sh.select(F.col("doc_id").alias("b_id"), "shingle")
    # inter feeds the truth derivation AND (symmetrized, below) the
    # retrieval scoring itself — pin it so the posting-list self-join
    # runs once (r13; pair-count-sized, ≪ the posting join's input).
    # SIZE ASSUMPTION (ADVICE r13): "pair-count-sized" means every doc
    # pair sharing ≥1 shingle — near-quadratic on a shingle-heavy
    # corpus, a weaker bound than the node/dim frames the checkpoint
    # policy usually pins. Acceptable HERE because the pin stores
    # strictly less than the join it dedupes would rematerialize (3
    # longs per pair vs re-running the posting self-join), the eval's
    # candidate universe IS that pair set by construction, and
    # localCheckpoint loss just fails the query (no silent wrongness).
    # A production corpus would cap the posting lists first
    # (SNAPSHOT_DF_CAP pattern) before this eval shape is run at
    # 100 TB.
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("i"))
        .localCheckpoint(eager=False)
    )
    verified = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed(
                "n", "n_a"
            ),
            "a_id",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed(
                "n", "n_b"
            ),
            "b_id",
        )
        .filter(
            1000 * F.col("i")
            >= 700 * (F.col("n_a") + F.col("n_b") - F.col("i"))
        )
        .select("a_id", "b_id")
        # verified feeds BOTH symmetrization arms of truth: pin it so
        # the size joins run once, not once per direction (r13).
        .localCheckpoint(eager=False)
    )
    truth = (
        verified.select(
            F.col("a_id").alias("query_id"), F.col("b_id").alias("target_id")
        )
        .unionAll(
            verified.select(
                F.col("b_id").alias("query_id"),
                F.col("a_id").alias("target_id"),
            )
        )
        .localCheckpoint(eager=False)
    )
    queries = truth.select("query_id").distinct()
    # The retrieval score of (query, cand) — shared-distinct-shingle
    # count — is exactly inter's i for that unordered pair (both are
    # counts over the same distinct (doc_id, shingle) frame), so the
    # scoring stage needs NO second posting-list join (r13: the
    # previous qsh⋈sh join recomputed every intersection the pair
    # stage had already counted). Symmetrize inter and keep the query
    # panel's rows; queries is distinct, so the inner join is a pure
    # filter.
    sym = inter.select(
        F.col("a_id").alias("query_id"),
        F.col("b_id").alias("cand_id"),
        F.col("i").alias("score"),
    ).unionAll(
        inter.select(
            F.col("b_id").alias("query_id"),
            F.col("a_id").alias("cand_id"),
            F.col("i").alias("score"),
        )
    )
    scored = sym.join(queries, "query_id")
    wrk = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("cand_id")
    )
    ranked = scored.withColumn("rk", F.row_number().over(wrk)).select(
        F.col("query_id").alias("r_qid"),
        F.col("cand_id").alias("r_cid"),
        "rk",
    )
    return (
        truth.join(
            ranked,
            (F.col("query_id") == F.col("r_qid"))
            & (F.col("target_id") == F.col("r_cid")),
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_targets"),
            F.min("rk").cast("long").alias("best_rank"),
            F.when(
                F.min("rk") <= MRR_AT,
                F.expr("1000000 div min(rk)"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rr_micro"),
        )
    )


# ---------------------------------------------------------------------------
# streaming_bottomk_agree — the bottom-k sketch as a live foreachBatch
# monoid rollup (the tenth streaming lane)
# ---------------------------------------------------------------------------


def streaming_bottomk_agree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(type, day) bottom-k partials maintained by a REAL
    Structured Streaming run: each micro-batch computes its own
    bottom-k partial and foreachBatch folds it into the persisted
    store (store ← bottom-k(store ∪ partial)) — the continuous form
    of the lakehouse rollup the batch gate reads. The final store is
    merged-at-read into quantiles and hash-checked against the SAME
    DuckDB oracle as ``sketch_bottomk_quantiles``: stream-of-merges ≡
    one batch pass, because bottom-k is a commutative idempotent
    monoid (the per-key min-value dedup before the rank makes an
    at-least-once batch replay a no-op — the CDC lane's idempotence
    argument).

    No watermark and no state store: the persisted partial table IS
    the state, k rows per (type, day) at any corpus size. Each
    foreachBatch merge ranks store ∪ partial — both sides bounded by
    k·(types×days touched) — so per-batch work is sketch-sized, not
    data-sized.

    STREAM-EFFECTFUL: building this DataFrame runs the stream to
    completion (that is the point of the gate)."""
    import atexit
    import os
    import shutil
    import tempfile

    from .queries_streaming import _events_replay_dir, _stream_run_conf
    from ..streaming.events import stream_events

    replay = _events_replay_dir(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="bottomk_rollup_gate_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    state = {"path": None, "v": 0}

    def _apply(batch: DataFrame, batch_id: int) -> None:
        partial = _bottomk_daily(_bottomk_project(batch))
        if state["path"] is not None:
            prev = spark.read.parquet(state["path"])
            partial = _bottomk_daily(prev.unionByName(partial))
        state["v"] += 1
        out = os.path.join(root, f"store_v{state['v']}")
        partial.write.mode("overwrite").parquet(out)
        state["path"] = out

    with _stream_run_conf(spark):
        q = (
            stream_events(spark, replay)
            .writeStream.foreachBatch(_apply)
            .option(
                "checkpointLocation", os.path.join(root, "_ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    daily = spark.read.parquet(state["path"])
    return _bottomk_quantiles(daily)


# name -> (query fn, oracle SQL): r12 registration day moves each
# entry into the @register loop verbatim.
R12_QUEUE = {
    "sketch_bottomk_quantiles": (
        sketch_bottomk_quantiles,
        BOTTOMK_ORACLE,
    ),
    "text_readability_scores": (
        text_readability_scores,
        READABILITY_ORACLE,
    ),
    "corpus_token_gini": (corpus_token_gini, GINI_ORACLE),
    "events_path_mining": (events_path_mining, PATHS_ORACLE),
    "graph_kcore": (graph_kcore, KCORE_ORACLE),
    "lakehouse_compaction_plan": (
        lakehouse_compaction_plan,
        COMPACT_ORACLE,
    ),
    "ann_knn_graph": (ann_knn_graph, KNN_ORACLE),
    "dedup_snapshot_incremental": (
        dedup_snapshot_incremental,
        SNAPSHOT_ORACLE,
    ),
    "retrieval_mrr_eval": (retrieval_mrr_eval, MRR_ORACLE),
    "streaming_bottomk_agree": (streaming_bottomk_agree, BOTTOMK_ORACLE),
}


# ---------------------------------------------------------------------------
# r12 registration: publish every queue entry into the driver-facing
# registry (the r10/r11 pattern — looping over R12_QUEUE keeps the
# queue dict, which tests/test_r12_queue.py verifies against the
# DuckDB oracles, and the registry surface mechanically identical).
# ---------------------------------------------------------------------------
from ..registry import register  # noqa: E402

for _name, (_fn, _oracle) in R12_QUEUE.items():
    register(_name, _oracle)(_fn)
