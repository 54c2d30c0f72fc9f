"""Round-11 gate queue — complete (fn, oracle) pairs, UNregistered.

Round 10 already registered twelve gates (the ten pre-proven r10-queue
moves plus ``streaming_cdc_apply_agree`` and the upgraded
``multimodal_features``), so this round's net-new work waits here under
the ≤10-additions-per-round cap, exactly like ``queries_r10_queue.py``
did in round 9. ``R11_QUEUE`` maps name -> (query fn, DuckDB oracle);
``tests/test_r11_queue.py`` runs the REAL driver-style canonicalized
comparison over every entry each pytest run, so r11 registration day is
a decorator move, not new code.

The slate (why each earns a gate at 100 TB):

- ``sketch_kmv_set_ops``      — KMV/theta bottom-k sketches support
  UNION/INTERSECTION cardinality estimates, which HLL cannot give
  without inclusion-exclusion error stacking; audience-overlap between
  event segments is the canonical warehouse ask. Sketches are k rows
  per segment — all pair work happens on 64-row tables.
- ``events_quantile_daily_rollup`` — the mergeable-histogram quantile
  monoid: daily fixed-bin partials merged at read time ≡ recompute
  over raw (completes the rollup trio with events_hll_daily_rollup /
  events_cms_daily_rollup; this is the continuous-aggregate contract
  for percentile dashboards).
- ``ann_recall_eval``          — recall@10 of the IVF index against the
  brute-force ground truth; index-quality evaluation is how nprobe /
  n_cells get tuned before committing a 100 TB re-index.
- ``dedup_lsh_eval``           — precision/recall of banded MinHash-LSH
  candidates against exact 3-gram Jaccard ≥ 0.7 truth; the measured
  basis for choosing band geometry before a full-corpus dedup run.
- ``retrieval_margin_bitext``  — margin-criterion nearest-neighbor
  mining (Artetxe & Schwenk 2019) on integer fixed-point dot products;
  the standard parallel-corpus miner for translation training data.
- ``curation_diversity_prune`` — SemDeDup-style within-cell semantic
  pruning: in each sign-LSH cell, a vector is dropped when a
  higher-priority near-twin (cosine ≥ τ; farther from the cell
  centroid wins) exists — per-cell pair work only, never corpus².
- ``corpus_ngram_coverage_curve`` — Heaps-law vocabulary-growth curve
  (new distinct trigrams per corpus decile, in deterministic doc
  order): the saturation diagnostic for "is more of this source still
  adding information?".
- ``text_zipf_fit``            — per-source Zipf slope via integer
  least-squares over log2 buckets (``length(bin(x))`` — the HLL rank
  trick reused as a cross-engine-exact log2): a distribution-shape
  quality signal that flags template/boilerplate sources.
- ``graph_label_propagation``  — 2 synchronous rounds of
  most-frequent-neighbor-label propagation (Raghavan et al. 2007)
  over the supplier↔customer trade graph, deterministic
  (count DESC, label ASC) tie-break; communities complement the
  existing PageRank/triangle gates with the third classic graph
  primitive. One shuffle per round.
- ``sketch_bloom_membership``  — Bloom filter as a 128×int64-lane
  bitmap monoid (bit_or merge), built over one half of the corpus
  vocabulary and probed with the other half: membership pre-filters
  are the cheap first pass of cross-corpus decontamination at scale.

Every estimate/score is integer or fixed-point micro-units; every
hash is the repo's 60-bit md5 — both engines run bit-identical
arithmetic, so the gates are hash-exact, not approximately equal.

Registration-day checklist for r11 (the r10-queue pattern): move each
entry into ``@register``, add the names to bench.py HEADLINE and the
registry _CHECK_FIRST window, and add these audit allowlist entries —
every one an instance of an already-documented idiom (verified against
the executed plans at sf0.001; the other four queue plans audit clean):
- ``tools/audit_plans.py`` CROSS_JOIN_ALLOW: ``ann_recall_eval`` and
  ``retrieval_margin_bitext`` (fixed query-panel broadcast over the
  corpus — the ann_topk_bruteforce shape), ``sketch_kmv_set_ops``
  (event-type-dim × event-type-dim theta join, ≤|types|² rows),
  ``dedup_lsh_eval`` and ``corpus_ngram_coverage_curve`` (1-row
  scalar-aggregate broadcasts — the tpch_q11 idiom).
- ``tools/audit_plans.py`` SINGLE_PARTITION_ALLOW:
  ``sketch_bloom_membership`` and ``dedup_lsh_eval`` (single-row FINAL
  aggregates after map-side partials), ``corpus_ngram_coverage_curve``
  (cumulative window over the 10-row decile aggregate — report-sized
  by construction).
- ``tools/audit_scans.py`` ALLOW (production scan counts measured
  under the r10 final-plan + pin-build semantics; the other six gates
  count ≤ 3): ``ann_recall_eval`` ("embeddings", 5 — brute-force truth
  + IVF index lanes), ``curation_diversity_prune`` ("embeddings", 4 —
  cells + pinned-centroid build + two pair sides, which share one
  exchange at runtime), ``retrieval_margin_bitext`` ("embeddings", 4 —
  the dots table's fwd/bwd/argmax traversals), ``dedup_lsh_eval``
  ("documents", 5 — exact-truth lanes incl. the pinned shingle build
  + the LSH candidate lane).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# This module is NOT imported by registry.py (the queue is
# deliberately unregistered); finish the registry's plan-module import
# chain first so the shared-CTE imports from queries_dedup /
# queries_retrieval below see fully initialized modules instead of the
# partially-initialized circular-import window.
from .. import registry as _registry  # noqa: F401

from ..operators.dedup_approx import (
    jaccard_pairs_prefix,
    minhash_lsh_candidates,
    seeded_hash60,
    word_shingles,
)
from ..operators.similarity import brute_force_topk, ivf_topk
from ..sources.readers import read_table

# ---------------------------------------------------------------------------
# sketch_kmv_set_ops — KMV (k-minimum-values / theta) set-operation
# estimates between event-type visit sets.
# ---------------------------------------------------------------------------

KMV_K = 64
# 40-bit hash space: (k-1)·M and k_both·est_union stay far inside
# int64 on BOTH engines (63·2^60 would overflow), and the KMV
# estimator's accuracy only needs the space to dwarf the set sizes.
# Hashes are DISTINCT-ed per type before ranking, so bottom-k
# selection has no order ties on either engine.
KMV_SPACE = 1 << 40

KMV_ORACLE = f"""
    WITH visits AS (
        SELECT DISTINCT event_type,
               user_id || '@' || CAST(CAST(ts AS DATE) AS VARCHAR) AS visit
        FROM events
    ),
    hashed AS (
        SELECT DISTINCT event_type,
               CAST('0x' || substr(md5(visit), 1, 15) AS BIGINT)
                   % {KMV_SPACE} AS h
        FROM visits
    ),
    sk AS (
        SELECT event_type, h
        FROM (SELECT event_type, h, row_number() OVER (
                  PARTITION BY event_type ORDER BY h) AS rk
              FROM hashed)
        WHERE rk <= {KMV_K}
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b
        FROM (SELECT DISTINCT event_type FROM sk) a
        JOIN (SELECT DISTINCT event_type FROM sk) b
          ON a.event_type < b.event_type
    ),
    uni AS (
        SELECT p.type_a, p.type_b, s.h,
               max(CASE WHEN s.event_type = p.type_a THEN 1 ELSE 0 END)
                   AS in_a,
               max(CASE WHEN s.event_type = p.type_b THEN 1 ELSE 0 END)
                   AS in_b
        FROM pairs p
        JOIN sk s ON s.event_type IN (p.type_a, p.type_b)
        GROUP BY 1, 2, 3
    ),
    topu AS (
        SELECT type_a, type_b, h, in_a, in_b,
               row_number() OVER (
                   PARTITION BY type_a, type_b ORDER BY h) AS rk,
               count(*) OVER (PARTITION BY type_a, type_b) AS n_u
        FROM uni
    ),
    stats AS (
        SELECT type_a, type_b,
               max(CASE WHEN rk = {KMV_K} THEN h END) AS theta,
               min(n_u) AS n_u,
               CAST(sum(CASE WHEN in_a = 1 AND in_b = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS k_both
        FROM topu WHERE rk <= {KMV_K}
        GROUP BY 1, 2
    )
    SELECT type_a, type_b,
           CASE WHEN n_u >= {KMV_K}
                THEN ({KMV_K} - 1) * {KMV_SPACE} // theta
                ELSE n_u END AS est_union,
           k_both * (CASE WHEN n_u >= {KMV_K}
                          THEN ({KMV_K} - 1) * {KMV_SPACE} // theta
                          ELSE n_u END)
                  // LEAST(n_u, {KMV_K}) AS est_intersection,
           k_both * 1000000 // LEAST(n_u, {KMV_K}) AS kmv_jaccard_micro
    FROM stats
"""


def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k) sketches of per-event-type (user, day) visit
    sets, combined pairwise for union / intersection / Jaccard
    estimates — the theta-sketch set algebra HLL cannot express.

    Scale shape: one distinct + one per-type bottom-k over the raw
    events (linear, single shuffle each); every pairwise estimate then
    runs on 64-row sketch tables, so segment-overlap matrices over
    arbitrarily many segments never touch the raw data again. The
    estimator is the classic (k-1)·M/θ with the k-th smallest 60-bit
    hash as θ (Bar-Yossef et al. 2002); intersections use the bottom-k
    of the union with membership flags. All-integer arithmetic keeps
    both engines bit-identical.
    """
    ev = read_table(spark, sf_dir, "events")
    visits = ev.select(
        "event_type",
        F.concat(
            F.col("user_id").cast("string"),
            F.lit("@"),
            F.to_date("ts").cast("string"),
        ).alias("visit"),
    ).distinct()
    hashed = visits.select(
        "event_type", (seeded_hash60(F.col("visit")) % KMV_SPACE).alias("h")
    ).distinct()
    wk = Window.partitionBy("event_type").orderBy("h")
    sk = (
        hashed.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= KMV_K)
        .select("event_type", "h")
    )
    types = sk.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
    )
    # Sketch-level union with membership flags: tiny tables, broadcast.
    uni = (
        pairs.join(
            F.broadcast(sk).alias("s"),
            (F.col("s.event_type") == F.col("type_a"))
            | (F.col("s.event_type") == F.col("type_b")),
        )
        .groupBy("type_a", "type_b", "h")
        .agg(
            F.max(
                F.when(
                    F.col("s.event_type") == F.col("type_a"), 1
                ).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(
                    F.col("s.event_type") == F.col("type_b"), 1
                ).otherwise(0)
            ).alias("in_b"),
        )
    )
    wp = Window.partitionBy("type_a", "type_b").orderBy("h")
    wc = Window.partitionBy("type_a", "type_b")
    topu = (
        uni.withColumn("rk", F.row_number().over(wp))
        .withColumn("n_u", F.count(F.lit(1)).over(wc))
        .filter(F.col("rk") <= KMV_K)
    )
    stats = topu.groupBy("type_a", "type_b").agg(
        F.max(F.when(F.col("rk") == KMV_K, F.col("h"))).alias("theta"),
        F.min("n_u").alias("n_u"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("k_both"),
    )
    # Spark SQL's `div` is INTEGER division on integral types — the
    # exact twin of DuckDB's `//`; no doubles anywhere in the
    # estimator.
    m = (KMV_K - 1) * KMV_SPACE
    return stats.select(
        "type_a",
        "type_b",
        F.expr(
            f"CASE WHEN n_u >= {KMV_K}"
            f" THEN CAST({m} AS BIGINT) div theta"
            f" ELSE CAST(n_u AS BIGINT) END"
        ).alias("est_union"),
        F.expr(
            f"k_both * (CASE WHEN n_u >= {KMV_K}"
            f" THEN CAST({m} AS BIGINT) div theta"
            f" ELSE CAST(n_u AS BIGINT) END)"
            f" div LEAST(CAST(n_u AS BIGINT), {KMV_K})"
        ).alias("est_intersection"),
        F.expr(
            f"k_both * 1000000"
            f" div LEAST(CAST(n_u AS BIGINT), {KMV_K})"
        ).alias("kmv_jaccard_micro"),
    )


# ---------------------------------------------------------------------------
# events_quantile_daily_rollup — mergeable fixed-bin histogram quantiles
# ---------------------------------------------------------------------------

QUANTILE_BINS = 1024
QUANTILE_SCALE = 2  # bin width 0.5 → bin = floor(value * 2), capped

QUANTILE_ROLLUP_ORACLE = f"""
    WITH binned AS (
        SELECT event_type,
               LEAST({QUANTILE_BINS - 1},
                     CAST(floor(value * {QUANTILE_SCALE}) AS BIGINT)) AS bin
        FROM events
    ),
    hist AS (
        SELECT event_type, bin, count(*) AS n FROM binned GROUP BY 1, 2
    ),
    cum AS (
        SELECT event_type, bin, n,
               sum(n) OVER (PARTITION BY event_type ORDER BY bin) AS c,
               sum(n) OVER (PARTITION BY event_type) AS total
        FROM hist
    )
    SELECT event_type, CAST(min(total) AS BIGINT) AS n_events,
           min(CASE WHEN c >= (50 * total + 99) // 100
                    THEN bin END) * 500000 AS q50_micro,
           min(CASE WHEN c >= (95 * total + 99) // 100
                    THEN bin END) * 500000 AS q95_micro,
           min(CASE WHEN c >= (99 * total + 99) // 100
                    THEN bin END) * 500000 AS q99_micro
    FROM cum GROUP BY 1
"""


def events_quantile_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentiles from MERGED daily histogram partials — the quantile
    member of the rollup-monoid family (HLL counts distincts, CMS
    counts frequencies, the fixed-bin histogram answers quantiles).

    The Spark side materializes per-(event_type, day, bin) partial
    counts — exactly what a continuous aggregate stores per day — and
    merges them at read time by summing bins across days; the oracle
    recomputes from raw in one pass. Bin counts form a commutative
    monoid under +, so merge-at-read ≡ recompute is an algebraic
    identity the gate verifies end-to-end on both engines. Quantile
    estimate = lower edge of the first bin whose cumulative count
    reaches ceil(p·N/100), in micro-units (bin width 0.5). Errors are
    bounded by bin width; partials are (types × days × ≤1024) rows —
    constant per day at any corpus size.
    """
    ev = read_table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.least(
            F.lit(QUANTILE_BINS - 1),
            F.floor(F.col("value") * QUANTILE_SCALE).cast("long"),
        ).alias("bin"),
    )
    # Daily partials: what the lakehouse table would persist.
    daily = binned.groupBy("event_type", "day", "bin").agg(
        F.count(F.lit(1)).alias("n")
    )
    # Merge-at-read: fold days together (monoid +).
    hist = daily.groupBy("event_type", "bin").agg(F.sum("n").alias("n"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("event_type")
    cum = hist.withColumn("c", F.sum("n").over(wcum)).withColumn(
        "total", F.sum("n").over(wtot)
    )

    def q(p: int) -> F.Column:
        # Pure integer ceil-rank (`div`, not `/` + floor): double
        # division rounds for totals beyond ~2^53/p and would break
        # the no-float-enters-either-engine discipline the oracle's
        # (p*total+99)//100 follows (ADVICE r10).
        need = F.expr(f"({p} * total + 99) div 100")
        return F.min(F.when(F.col("c") >= need, F.col("bin"))) * F.lit(
            1000000 // QUANTILE_SCALE
        )

    return cum.groupBy("event_type").agg(
        F.min("total").cast("long").alias("n_events"),
        q(50).alias("q50_micro"),
        q(95).alias("q95_micro"),
        q(99).alias("q99_micro"),
    )


# ---------------------------------------------------------------------------
# ann_recall_eval — recall@10 of the IVF index vs brute-force truth
# ---------------------------------------------------------------------------

from .queries_dedup import _VECS_CTE  # noqa: E402  (canonical vector CTE)
from .queries_retrieval import _IVF_CTE  # noqa: E402  (shared kmeans cells)

ANN_RECALL_ORACLE = f"""
    WITH {_VECS_CTE},
    {_IVF_CTE},
    truth AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, v.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(q.e, v.e) DESC,
                                v.vec_id) AS rank
            FROM (SELECT * FROM v WHERE vec_id < 10) q
            CROSS JOIN v WHERE q.vec_id <> v.vec_id
        ) WHERE rank <= 10
    ),
    approx AS (
        SELECT query_id, neighbor_id FROM (
            SELECT p.vec_id AS query_id, a.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY p.vec_id
                       ORDER BY list_cosine_similarity(qv.e, cv.e) DESC,
                                a.vec_id) AS rank
            FROM probes p
            JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.vec_id
            JOIN v qv ON qv.vec_id = p.vec_id
            JOIN v cv ON cv.vec_id = a.vec_id
        ) WHERE rank <= 10
    )
    SELECT t.query_id,
           CAST(count(*) AS BIGINT) AS n_true,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
           count(a.neighbor_id) * 1000000 // count(*) AS recall_micro
    FROM truth t
    LEFT JOIN approx a
      ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
    GROUP BY 1
"""


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of IVF(k=8 cells, nprobe=2) against brute-force cosine
    ground truth for the standard query set (vec_id < 10) — the
    index-quality metric that decides nprobe/n_cells before a 100 TB
    re-index.

    Truth is the linear brute-force scan restricted to the FIXED query
    panel (|Q|·N dot products — the same shape ann_topk_bruteforce
    already runs); the IVF side probes 2 of 8 cells. The join that
    scores recall is on (query_id, neighbor_id) — 100 rows a side.
    """
    vectors = read_table(spark, sf_dir, "embeddings")
    queries = vectors.filter(F.col("vec_id") < 10)
    truth = brute_force_topk(vectors, queries, 10).select(
        "query_id", "neighbor_id"
    )
    approx = ivf_topk(vectors, queries, 10).select(
        "query_id", F.col("neighbor_id").alias("a_neighbor_id")
    )
    joined = truth.join(
        approx,
        (truth.query_id == approx.query_id)
        & (truth.neighbor_id == approx.a_neighbor_id),
        "left",
    ).select(truth.query_id, "neighbor_id", "a_neighbor_id")
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.count("a_neighbor_id").cast("long").alias("n_hit"),
        F.floor(
            (F.count("a_neighbor_id") * 1000000).cast("decimal(38,0)")
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("recall_micro"),
    )


# ---------------------------------------------------------------------------
# dedup_lsh_eval — precision/recall of LSH candidates vs exact Jaccard
# ---------------------------------------------------------------------------

from .queries_dedup import (  # noqa: E402  (shared minhash CTE pieces)
    _MINHASH_BAND_UNION,
    _MINHASH_MIN_COLS,
    _SHINGLES_CTE,
)
from ..operators.dedup_approx import MINHASH_FOLD  # noqa: E402

LSH_EVAL_THRESHOLD = 0.7

LSH_EVAL_ORACLE = f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    truth AS (
        SELECT a_id, b_id
        FROM inter
        JOIN sizes sa ON a_id = sa.doc_id
        JOIN sizes sb ON b_id = sb.doc_id
        WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.7
    ),
    based AS (
        SELECT doc_id, shingle % {MINHASH_FOLD} AS h30 FROM sh
    ),
    sig AS (
        SELECT doc_id, {_MINHASH_MIN_COLS}
        FROM based GROUP BY doc_id
    ),
    bands AS (
        {_MINHASH_BAND_UNION}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
                     AND a.doc_id < b.doc_id
    ),
    tp AS (
        SELECT count(*) AS n_tp
        FROM cand c JOIN truth t ON c.a_id = t.a_id AND c.b_id = t.b_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
           (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
           CAST(n_tp AS BIGINT) AS n_tp,
           CASE WHEN (SELECT count(*) FROM cand) > 0
                THEN n_tp * 1000000 // (SELECT count(*) FROM cand)
                ELSE 0 END AS precision_micro,
           CASE WHEN (SELECT count(*) FROM truth) > 0
                THEN n_tp * 1000000 // (SELECT count(*) FROM truth)
                ELSE 0 END AS recall_micro
    FROM tp
"""


def dedup_lsh_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall of the banded MinHash-LSH candidate generator
    against exact 3-gram Jaccard ≥ 0.7 ground truth — the measurement
    that justifies a band geometry before committing a full-corpus
    dedup pass.

    Truth comes from the prefix-filtered exact join at threshold 0.7
    (PPJoin positional pruning + candidates-only sorted-array verify —
    the corpus-linear path whose float-ratio compare is the same
    int/int double arithmetic the registered 0.8 gate already proves
    hash-exact cross-engine); candidates come from the registered
    16-hash/4-band LSH. Both are linear-shuffle plans; the eval join
    runs on pair keys only. (A first draft recomputed the intersection
    by joining pairs back to shingle ROWS — the exploding verify shape
    the dedup_approx comments document as an 800M-row blowup at the 4×
    tranche; reusing the array verify keeps the eval at tranche scale.)

    Scale note: the truth half is definitionally the EXACT-Jaccard
    lane, which enters the synthetic tranche's vocabulary-saturation
    regime at the 16× ladder step (α=1.29; SCALE.md "vocabulary
    saturation" — the r9-attributed, decision-recorded exact-lane
    behavior). At 100 TB the recall measurement runs on a bounded
    document SAMPLE by design: this is an eval of the α=0.40
    banded-LSH production lane, not itself a production pass.
    """
    docs = read_table(spark, sf_dir, "documents")
    # truth and cand each feed TWO consumers (the tp join and their
    # own count aggregate); un-pinned, Catalyst plans the full
    # prefix-filtered Jaccard / banded-LSH pipeline once per consumer
    # — pinning halves the heavy work (r13; pair-list-sized frames,
    # the bounded-dimension checkpoint policy).
    truth = jaccard_pairs_prefix(docs, LSH_EVAL_THRESHOLD).select(
        "a_id", "b_id"
    ).localCheckpoint(eager=False)
    cand = minhash_lsh_candidates(docs).select(
        "a_id", "b_id"
    ).localCheckpoint(eager=False)
    tp = cand.join(truth, ["a_id", "b_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_tp")
    )
    n_cand = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    n_truth = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    return (
        n_cand.crossJoin(n_truth)
        .crossJoin(tp)
        .select(
            "n_candidates",
            "n_truth",
            "n_tp",
            # Empty candidate/truth sets are a legitimate eval outcome
            # (a corpus with no near-dups at the threshold): report 0
            # rather than dividing by zero.
            F.when(
                F.col("n_candidates") > 0,
                F.expr("n_tp * 1000000 div n_candidates"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("precision_micro"),
            F.when(
                F.col("n_truth") > 0,
                F.expr("n_tp * 1000000 div n_truth"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("recall_micro"),
        )
    )


# ---------------------------------------------------------------------------
# retrieval_margin_bitext — margin-criterion nearest-neighbor mining
# ---------------------------------------------------------------------------

BITEXT_QUERIES = 16  # vec_id < 16 = the "source side" panel
BITEXT_TOPM = 4      # margin normalizer: mean of top-4 both directions

BITEXT_ORACLE = f"""
    WITH vi AS (
        SELECT vec_id,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 1000) AS BIGINT)) AS q
        FROM embeddings
    ),
    dots AS (
        SELECT a.vec_id AS query_id, b.vec_id AS cand_id,
               CAST(list_sum(list_transform(range(1, 65),
                    i -> a.q[i] * b.q[i])) AS BIGINT) AS dot
        FROM (SELECT * FROM vi WHERE vec_id < {BITEXT_QUERIES}) a
        CROSS JOIN (SELECT * FROM vi WHERE vec_id >= {BITEXT_QUERIES}) b
    ),
    fwd AS (
        SELECT query_id, CAST(sum(dot) AS BIGINT) AS sum_fwd
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY dot DESC, cand_id) AS rk
              FROM dots)
        WHERE rk <= {BITEXT_TOPM} GROUP BY 1
    ),
    bwd AS (
        SELECT cand_id, CAST(sum(dot) AS BIGINT) AS sum_bwd
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY cand_id ORDER BY dot DESC, query_id) AS rk
              FROM dots)
        WHERE rk <= {BITEXT_TOPM} GROUP BY 1
    ),
    margins AS (
        SELECT d.query_id, d.cand_id, d.dot,
               2 * {BITEXT_TOPM} * d.dot * 1000000
                   // (f.sum_fwd + b.sum_bwd) AS margin_micro
        FROM dots d
        JOIN fwd f USING (query_id)
        JOIN bwd b USING (cand_id)
        WHERE f.sum_fwd + b.sum_bwd > 0
    )
    SELECT query_id, cand_id AS match_id, dot, margin_micro
    FROM (SELECT *, row_number() OVER (
              PARTITION BY query_id
              ORDER BY margin_micro DESC, cand_id) AS rk
          FROM margins)
    WHERE rk = 1
"""


def retrieval_margin_bitext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-criterion nearest-neighbor mining (Artetxe & Schwenk
    2019): each source-side query is matched to the candidate that
    maximizes margin(x,y) = 2·dot(x,y) / (mean top-4 fwd + mean top-4
    bwd) — the ratio margin that suppresses hubness false matches a
    raw-cosine threshold lets through. The standard miner for
    parallel-corpus (translation) training pairs.

    Embeddings are unit-norm, so the milli-quantized integer dot is a
    fixed-point cosine: every score and the margin itself are pure
    int64 arithmetic (Spark `div` ≡ DuckDB `//`), bit-identical across
    engines. Scale shape: |Q| is a fixed panel, so the dot table is
    |Q|·N — linear in the corpus like ann_topk_bruteforce; both top-4
    normalizers and the final argmax ride window ranks over that same
    table (no second scan, no corpus×corpus work).
    """
    vi = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000).cast("long"),
        ).alias("q"),
    )
    # The query panel is a FIXED |Q|-row dim consumed by every dots
    # traversal (fwd/bwd ranks + the margin join): pin it.
    qs = (
        vi.filter(F.col("vec_id") < BITEXT_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("q").alias("qa"))
        .localCheckpoint(eager=False)
    )
    cs = vi.filter(F.col("vec_id") >= BITEXT_QUERIES).select(
        F.col("vec_id").alias("cand_id"), F.col("q").alias("qb")
    )
    dots = F.broadcast(qs).crossJoin(cs).select(
        "query_id",
        "cand_id",
        F.aggregate(
            F.zip_with("qa", "qb", lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("dot").desc(), F.col("cand_id")
    )
    wb = Window.partitionBy("cand_id").orderBy(
        F.col("dot").desc(), F.col("query_id")
    )
    ranked = dots.withColumn("rkf", F.row_number().over(wf)).withColumn(
        "rkb", F.row_number().over(wb)
    )
    fwd = (
        ranked.filter(F.col("rkf") <= BITEXT_TOPM)
        .groupBy("query_id")
        .agg(F.sum("dot").cast("long").alias("sum_fwd"))
    )
    bwd = (
        ranked.filter(F.col("rkb") <= BITEXT_TOPM)
        .groupBy("cand_id")
        .agg(F.sum("dot").cast("long").alias("sum_bwd"))
    )
    margins = (
        dots.join(fwd, "query_id")
        .join(bwd, "cand_id")
        .filter(F.col("sum_fwd") + F.col("sum_bwd") > 0)
        .withColumn(
            "margin_micro",
            F.expr(
                f"2 * {BITEXT_TOPM} * dot * 1000000"
                f" div (sum_fwd + sum_bwd)"
            ),
        )
    )
    wm = Window.partitionBy("query_id").orderBy(
        F.col("margin_micro").desc(), F.col("cand_id")
    )
    return (
        margins.withColumn("rk", F.row_number().over(wm))
        .filter(F.col("rk") == 1)
        .select(
            "query_id", F.col("cand_id").alias("match_id"), "dot",
            "margin_micro",
        )
    )


# ---------------------------------------------------------------------------
# curation_diversity_prune — SemDeDup-style within-cell semantic prune
# ---------------------------------------------------------------------------

PRUNE_BITS = 10       # sign-LSH cell = 10 sign bits over dims 1..10
PRUNE_DOT_THRESH = 900_000  # quantized-dot near-twin threshold (~cos 0.9)
# int64 headroom for the n²-scaled spread Σ_64 (n·q_i − s_i)²: with
# milli-quantized unit vectors |q_i| ≤ 1000, each term is ≤ (2000·n)²
# and the 64-dim sum ≤ 2.56e8·n², which stays under 2^63 only while
# n ≲ 1.9e5 rows per cell (ADVICE r10). At 100 TB, grow PRUNE_BITS
# with the corpus so cells stay under this cap — the guard below
# raises instead of silently wrapping (Spark ANSI would throw anyway;
# DuckDB's HUGEINT sum would NOT, so a wrap would surface as a hash
# mismatch at best and a silent wrong prune at worst).
PRUNE_MAX_CELL = 150_000

_PRUNE_CELL_SQL = " + ".join(
    f"(CASE WHEN e[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
    for j in range(PRUNE_BITS)
)

DIVERSITY_PRUNE_ORACLE = f"""
    WITH vi AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 1000) AS BIGINT)) AS q
        FROM embeddings
    ),
    cells AS (
        SELECT vec_id, q, {_PRUNE_CELL_SQL} AS cell FROM vi
    ),
    cn AS (
        SELECT cell, count(*) AS n FROM cells GROUP BY 1
    ),
    cdim AS (
        SELECT cell, i, CAST(sum(q[i]) AS BIGINT) AS sv
        FROM cells, unnest(range(1, 65)) AS t(i)
        GROUP BY 1, 2
    ),
    csum AS (
        SELECT cd.cell, min(cn.n) AS n, list(cd.sv ORDER BY cd.i) AS s
        FROM cdim cd JOIN cn ON cd.cell = cn.cell
        GROUP BY 1
    ),
    scored AS (
        SELECT c.vec_id, c.cell, c.q,
               CAST(list_sum(list_transform(range(1, 65),
                    i -> (cs.n * c.q[i] - cs.s[i])
                         * (cs.n * c.q[i] - cs.s[i]))) AS BIGINT)
                   AS spread
        FROM cells c JOIN csum cs USING (cell)
    ),
    dropped AS (
        SELECT DISTINCT b.vec_id
        FROM scored a JOIN scored b
          ON a.cell = b.cell AND a.vec_id <> b.vec_id
        WHERE (a.spread > b.spread
               OR (a.spread = b.spread AND a.vec_id < b.vec_id))
          AND CAST(list_sum(list_transform(range(1, 65),
                   i -> a.q[i] * b.q[i])) AS BIGINT)
              >= {PRUNE_DOT_THRESH}
    )
    SELECT s.vec_id, s.cell, s.spread,
           CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
    FROM scored s LEFT JOIN dropped d ON s.vec_id = d.vec_id
"""


def curation_diversity_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic pruning (Abbas et al. 2023): inside each
    sign-LSH cell, a vector is DROPPED when a near-twin (quantized dot
    ≥ 0.9e6 ≈ cosine 0.9) with higher keep-priority exists; priority =
    distance from the cell centroid (farther = more diverse = keep),
    ties to the smaller vec_id. Keeps the diverse representative of
    every semantic clump — the embedding-space counterpart of MinHash
    dedup for training-set curation.

    All-integer: centroid distance is compared via the n²-scaled form
    ||n·x − Σ||² (no division), similarity via the milli-quantized dot.
    Scale shape: 1024 cells bound ALL pairwise work to within-cell
    pairs (the SemDeDup trick — clustering first makes the quadratic
    local); centroids are one groupBy over the corpus.
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
    for j in range(PRUNE_BITS):
        bit = F.when(F.element_at("e", j + 1) > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
        cell = bit if cell is None else cell + bit
    cells = vi.select("vec_id", "q", cell.alias("cell"))
    # The centroid dim is BOUNDED (≤1024 cells); pinning it keeps the
    # scored-frame consumers (both pair sides) from re-deriving the
    # centroid aggregation's full embeddings pass.
    csum = cells.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n"),
        F.array(
            *[
                F.sum(F.element_at("q", i + 1)).cast("long")
                for i in range(64)
            ]
        ).alias("s"),
    ).localCheckpoint(eager=False)
    # Cell-size guard (the simhash lane_packed pattern): n is already
    # on every joined row, so the check is a free per-row expression.
    spread_expr = F.when(
        F.col("n") > PRUNE_MAX_CELL,
        F.raise_error(
            F.lit(
                "curation_diversity_prune cell overflow: a sign-LSH"
                f" cell holds > {PRUNE_MAX_CELL} vectors; the int64"
                " n^2-scaled spread would overflow — increase"
                " PRUNE_BITS for this corpus size"
            )
        ).cast("long"),
    )
    scored = (
        cells.join(csum, "cell")
        .withColumn(
            "spread",
            spread_expr.otherwise(F.aggregate(
                F.zip_with(
                    "q",
                    "s",
                    lambda qi, si: (F.col("n") * qi - si)
                    * (F.col("n") * qi - si),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )),
        )
        .select("vec_id", "cell", "q", "spread")
    )
    a = scored.select(
        F.col("cell").alias("cell"),
        F.col("vec_id").alias("a_id"),
        F.col("q").alias("a_q"),
        F.col("spread").alias("a_spread"),
    )
    b = scored.select(
        F.col("cell").alias("cell"),
        F.col("vec_id").alias("b_id"),
        F.col("q").alias("b_q"),
        F.col("spread").alias("b_spread"),
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("a_id") != F.col("b_id"))
        .filter(
            (F.col("a_spread") > F.col("b_spread"))
            | (
                (F.col("a_spread") == F.col("b_spread"))
                & (F.col("a_id") < F.col("b_id"))
            )
        )
        .filter(
            F.aggregate(
                F.zip_with("a_q", "b_q", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            >= PRUNE_DOT_THRESH
        )
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(1))
    )
    return scored.join(dropped, "vec_id", "left").select(
        "vec_id",
        "cell",
        "spread",
        F.when(F.col("is_dropped").isNull(), 1).otherwise(0).alias("kept"),
    )


# ---------------------------------------------------------------------------
# corpus_ngram_coverage_curve — Heaps-law vocabulary growth by decile
# ---------------------------------------------------------------------------

COVERAGE_ORACLE = """
    WITH bounds AS (
        SELECT max(doc_id) + 1 AS m FROM documents
    ),
    docs AS (
        SELECT doc_id,
               LEAST(10, CAST(doc_id * 10 // b.m AS BIGINT) + 1) AS decile,
               string_split(trim(text), ' ') AS w
        FROM documents, bounds b
    ),
    grams AS (
        SELECT decile,
               CAST('0x' || substr(md5(
                   w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 15)
                   AS BIGINT) AS g
        FROM docs, unnest(range(1, len(w) - 1)) AS t(i)
        WHERE len(w) >= 3
    ),
    first_seen AS (
        SELECT g, min(decile) AS decile FROM grams GROUP BY 1
    ),
    per_decile AS (
        SELECT decile, CAST(count(*) AS BIGINT) AS new_trigrams
        FROM first_seen GROUP BY 1
    )
    SELECT decile, new_trigrams,
           CAST(sum(new_trigrams) OVER (ORDER BY decile) AS BIGINT)
               AS cum_trigrams
    FROM per_decile
"""


def corpus_ngram_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary-growth curve: distinct word-trigram types
    first seen in each corpus decile (deterministic doc_id-range
    deciles), plus the cumulative curve — the saturation diagnostic
    for "does ingesting more of this source still add information?".
    A flattening curve is the data-driven stop signal for a crawl.

    Deciles come from the doc_id RANGE (id·10 div (max_id+1)) — one
    1-row max broadcast, no global row_number window, so the plan has
    no single-partition stage. first-seen is one groupBy(gram); the
    10-row cumulative window is on the aggregated result.
    """
    from ..operators.dedup_approx import spread_small_input

    docs = read_table(spark, sf_dir, "documents")
    bounds = docs.agg((F.max("doc_id") + 1).alias("m"))
    # spread (r14, guide §2.5): the trigram explode + md5 hash is the
    # whole cost and a single-file corpus scan runs it on ONE core;
    # the 1-row bounds agg stays on the raw scan. inputFiles-gated,
    # no-op at cluster scale.
    grams = (
        spread_small_input(docs).crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.lit(10), F.expr("doc_id * 10 div m") + 1
            ).alias("decile"),
            F.explode(word_shingles(F.col("text"))).alias("s"),
        )
        .select("decile", seeded_hash60(F.col("s")).alias("g"))
    )
    first_seen = grams.groupBy("g").agg(F.min("decile").alias("decile"))
    per_decile = first_seen.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("new_trigrams")
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_decile.select(
        "decile",
        "new_trigrams",
        F.sum("new_trigrams").over(wcum).cast("long").alias("cum_trigrams"),
    )


# ---------------------------------------------------------------------------
# text_zipf_fit — per-source Zipf slope via integer log2-bucket OLS
# ---------------------------------------------------------------------------

ZIPF_ORACLE = """
    WITH toks AS (
        SELECT source, unnest(list_filter(
                   string_split(trim(text), ' '), x -> x <> '')) AS token
        FROM documents WHERE text IS NOT NULL
    ),
    freqs AS (
        SELECT source, token, CAST(count(*) AS BIGINT) AS f
        FROM toks GROUP BY 1, 2
    ),
    ranked AS (
        SELECT source, f, row_number() OVER (
                   PARTITION BY source ORDER BY f DESC, token) AS r
        FROM freqs
    ),
    pts AS (
        SELECT source,
               CAST(length(bin(r)) AS BIGINT) AS x,
               CAST(length(bin(f)) AS BIGINT) AS y
        FROM ranked
    ),
    sums AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM pts GROUP BY 1
    )
    SELECT source, n AS n_types,
           (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
               AS zipf_slope_micro
    FROM sums
    WHERE n * sxx - sx * sx > 0
"""


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf slope: integer least-squares of log2(freq) on
    log2(rank) over the token frequency table, in micro-units. Natural
    text sits near slope −1; template/boilerplate-heavy sources
    flatten or steepen the curve, so the slope is a cheap
    distribution-shape quality signal for source triage.

    log2 buckets come from ``length(bin(x))`` — bit-length as the
    cross-engine-exact integer log2 (the HLL rank trick) — so the OLS
    runs entirely on int64 sums and one integer division; no float
    enters either engine. One groupBy(source, token) + one per-source
    rank window; everything after is 20 rows.
    """
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = docs.select(
        "source",
        F.explode(
            F.filter(
                F.split(F.trim("text"), " "), lambda x: x != ""
            )
        ).alias("token"),
    )
    freqs = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("long").alias("f")
    )
    wr = Window.partitionBy("source").orderBy(
        F.col("f").desc(), F.col("token")
    )
    pts = freqs.withColumn("r", F.row_number().over(wr)).select(
        "source",
        F.length(F.bin("r")).cast("long").alias("x"),
        F.length(F.bin("f")).cast("long").alias("y"),
    )
    sums = pts.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    return sums.filter(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0
    ).select(
        "source",
        F.col("n").alias("n_types"),
        F.expr(
            "(n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx)"
        ).alias("zipf_slope_micro"),
    )


# ---------------------------------------------------------------------------
# graph_label_propagation — 2 synchronous LPA rounds, deterministic
# ---------------------------------------------------------------------------

LPA_ORACLE = """
    WITH base AS (
        SELECT 'S' || CAST(l_suppkey AS VARCHAR) AS s_node,
               'C' || CAST(o_custkey AS VARCHAR) AS c_node,
               CAST(count(*) AS BIGINT) AS w
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT s_node AS src, c_node AS dst, w FROM base
        UNION ALL
        SELECT c_node AS src, s_node AS dst, w FROM base
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
    v1 AS (
        SELECT e.src AS node, l.label, CAST(sum(e.w) AS BIGINT) AS votes
        FROM edges e JOIN l0 l ON e.dst = l.node
        GROUP BY 1, 2
    ),
    l1 AS (
        SELECT node, label FROM (
            SELECT node, label, row_number() OVER (
                PARTITION BY node ORDER BY votes DESC, label) AS rk
            FROM v1) WHERE rk = 1
    ),
    v2 AS (
        SELECT e.src AS node, l.label, CAST(sum(e.w) AS BIGINT) AS votes
        FROM edges e JOIN l1 l ON e.dst = l.node
        GROUP BY 1, 2
    ),
    l2 AS (
        SELECT node, label FROM (
            SELECT node, label, row_number() OVER (
                PARTITION BY node ORDER BY votes DESC, label) AS rk
            FROM v2) WHERE rk = 1
    )
    SELECT label AS community, CAST(count(*) AS BIGINT) AS n_members
    FROM l2 GROUP BY 1 HAVING count(*) >= 2
"""


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two synchronous rounds of weighted label propagation (Raghavan
    et al. 2007) over the undirected supplier↔customer trade graph
    (same edge construction as graph_pagerank_trade,
    queries_graph.py): each node adopts the neighbor label with the
    largest edge-weight vote, ties broken (votes DESC, label ASC) so
    every round is deterministic. Output: communities of size ≥ 2
    after round 2 — the third classic graph primitive next to
    PageRank (centrality) and triangles (cohesion).

    Scale shape: one edges⋈labels shuffle + one groupBy argmax per
    round — the PageRank iteration cost exactly; rounds are FIXED at
    2 (bounded-round LPA), so the plan is statically unrolled with no
    driver-side convergence loop.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    base = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.concat(F.lit("S"), F.col("l_suppkey").cast("string")).alias(
                "s_node"
            ),
            F.concat(F.lit("C"), F.col("o_custkey").cast("string")).alias(
                "c_node"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    edges = base.select(
        F.col("s_node").alias("src"), F.col("c_node").alias("dst"), "w"
    ).unionByName(
        base.select(
            F.col("c_node").alias("src"), F.col("s_node").alias("dst"), "w"
        )
    )
    # edges feeds both rounds: pin it once so neither recomputes the
    # base join (the graph_pagerank_trade lazy-checkpoint rationale).
    edges = edges.localCheckpoint(eager=False)

    def argmax_label(votes: DataFrame) -> DataFrame:
        # argmax by (votes DESC, label ASC) as min(struct(-votes,
        # label)): field-by-field struct ordering makes the min row
        # exactly the row_number()=1 row of the previous window form,
        # but a hash aggregate does partial map-side reduction and
        # skips the window's per-partition sort (r13).
        return (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("votes")).alias("nv"), F.col("label")
                    )
                ).alias("m")
            )
            .select("node", F.col("m.label").alias("label"))
        )

    # Round 1: label(dst) = dst identically, so the votes come straight
    # off the edge list — no join against an identity label table.
    labels = argmax_label(
        edges.groupBy(
            F.col("src").alias("node"), F.col("dst").alias("label")
        ).agg(F.sum("w").cast("long").alias("votes"))
    )
    # Round 2: the real propagate-join.
    labels = argmax_label(
        edges.join(
            labels.select(F.col("node").alias("dst"), F.col("label")),
            "dst",
        )
        .groupBy(F.col("src").alias("node"), "label")
        .agg(F.sum("w").cast("long").alias("votes"))
    )
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )


# ---------------------------------------------------------------------------
# sketch_bloom_membership — Bloom-filter bitmap monoid + probe
# ---------------------------------------------------------------------------

BLOOM_BITS = 4096      # m: 128 int64 lanes × 32 live bits per lane
BLOOM_LANE_BITS = 32   # 1 << (bit % 32) stays far from the sign bit
BLOOM_HASHES = 3       # k

_BLOOM_PROBE_HITS = " + ".join(
    f"""(CASE WHEN (SELECT lanes.v FROM lanes WHERE lanes.lane =
         (CAST('0x' || substr(md5(CAST({i} AS VARCHAR) || ':' || b.token),
          1, 15) AS BIGINT) % {BLOOM_BITS}) // {BLOOM_LANE_BITS})
         & (CAST(1 AS BIGINT) << (
         (CAST('0x' || substr(md5(CAST({i} AS VARCHAR) || ':' || b.token),
          1, 15) AS BIGINT) % {BLOOM_BITS}) % {BLOOM_LANE_BITS}))
         <> 0 THEN 1 ELSE 0 END)"""
    for i in range(BLOOM_HASHES)
)

BLOOM_ORACLE = f"""
    WITH atoks AS (
        SELECT DISTINCT unnest(list_filter(
                   string_split(trim(text), ' '), x -> x <> '')) AS token
        FROM documents
        WHERE CAST(substr(source, 4) AS BIGINT) < 10
    ),
    btoks AS (
        SELECT DISTINCT unnest(list_filter(
                   string_split(trim(text), ' '), x -> x <> '')) AS token
        FROM documents
        WHERE CAST(substr(source, 4) AS BIGINT) >= 10
    ),
    bits AS (
        SELECT (CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || token),
                    1, 15) AS BIGINT) % {BLOOM_BITS}) AS bit
        FROM atoks, unnest(range({BLOOM_HASHES})) AS t(i)
    ),
    lanes AS (
        SELECT bit // {BLOOM_LANE_BITS} AS lane,
               CAST(bit_or(CAST(1 AS BIGINT)
                    << (bit % {BLOOM_LANE_BITS})) AS BIGINT) AS v
        FROM bits GROUP BY 1
    ),
    probed AS (
        SELECT b.token,
               CASE WHEN ({_BLOOM_PROBE_HITS}) = {BLOOM_HASHES}
                    THEN 1 ELSE 0 END AS claimed,
               CASE WHEN a.token IS NULL THEN 0 ELSE 1 END AS actual
        FROM btoks b LEFT JOIN atoks a ON b.token = a.token
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probed,
           CAST(sum(actual) AS BIGINT) AS n_actual,
           CAST(sum(claimed) AS BIGINT) AS n_claimed,
           CAST(sum(CASE WHEN claimed = 1 AND actual = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
           CAST(sum(CASE WHEN claimed = 1 AND actual = 0 THEN 1 ELSE 0 END)
               * 1000000 // count(*) AS BIGINT) AS fp_rate_micro
    FROM probed
"""


def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter as a 128×int64-lane bitmap monoid: build over the
    vocabulary of sources src0–src9, probe with the vocabulary of
    src10–src19, and account exactly for claimed members vs truth
    (false positives, never false negatives — the Bloom contract,
    which the gate verifies structurally because every actual member
    must be claimed for the counts to match the oracle).

    Membership pre-filters are the cheap first pass of cross-corpus
    decontamination at 100 TB: the 1 KiB lane table broadcasts to
    every executor, where the exact anti-join would shuffle both
    vocabularies. Lanes merge with bit_or — a commutative monoid, so
    per-partition partial filters combine associatively (the
    HLL/CMS/histogram rollup algebra, here over bitmaps). Bits live in
    the low 32 of each int64 lane, keeping 1<<x far from the sign bit
    on both engines.
    """
    docs = read_table(spark, sf_dir, "documents")
    side = F.substring("source", 4, 10).cast("long")
    tok = F.explode(
        F.filter(F.split(F.trim("text"), " "), lambda x: x != "")
    ).alias("token")
    # Both vocab dims feed two consumers each (atoks: bit build + the
    # truth join; btoks: probe + the count base). They are BOUNDED
    # (distinct tokens — Heaps-law sublinear), so pin them lazily per
    # the checkpoint policy: documents scans drop from 5 to 2 (one
    # pass per corpus side).
    atoks = (
        docs.filter(side < 10).select(tok).distinct()
        .localCheckpoint(eager=False)
    )
    btoks = (
        docs.filter(side >= 10).select(tok).distinct()
        .localCheckpoint(eager=False)
    )
    hashes = F.array(
        *[
            seeded_hash60(F.col("token"), F.lit(i)) % BLOOM_BITS
            for i in range(BLOOM_HASHES)
        ]
    )
    bits = atoks.select(F.explode(hashes).alias("bit"))
    lanes = bits.groupBy(
        F.expr(f"bit div {BLOOM_LANE_BITS}").alias("lane")
    ).agg(
        F.bit_or(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST(bit % {BLOOM_LANE_BITS} AS INT))"
            )
        ).alias("v")
    )
    probe = btoks.select("token", *[
        (seeded_hash60(F.col("token"), F.lit(i)) % BLOOM_BITS).alias(f"b{i}")
        for i in range(BLOOM_HASHES)
    ])
    # One broadcast join per hash: the lane table is ≤128 rows.
    for i in range(BLOOM_HASHES):
        probe = probe.join(
            F.broadcast(
                lanes.select(
                    F.col("lane").alias(f"lane{i}"), F.col("v").alias(f"v{i}")
                )
            ),
            F.expr(f"b{i} div {BLOOM_LANE_BITS}") == F.col(f"lane{i}"),
            "left",
        )
    claimed = None
    for i in range(BLOOM_HASHES):
        hit = (
            F.coalesce(F.col(f"v{i}"), F.lit(0)).bitwiseAND(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT),"
                    f" CAST(b{i} % {BLOOM_LANE_BITS} AS INT))"
                )
            )
            != 0
        ).cast("int")
        claimed = hit if claimed is None else claimed + hit
    probed = (
        probe.withColumn(
            "claimed", (claimed == BLOOM_HASHES).cast("int")
        )
        .join(
            atoks.select(F.col("token"), F.lit(1).alias("actual")),
            "token",
            "left",
        )
        .select(
            "claimed", F.coalesce("actual", F.lit(0)).alias("actual")
        )
    )
    return probed.agg(
        F.count(F.lit(1)).cast("long").alias("n_probed"),
        F.sum("actual").cast("long").alias("n_actual"),
        F.sum("claimed").cast("long").alias("n_claimed"),
        F.sum(
            F.when((F.col("claimed") == 1) & (F.col("actual") == 0), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("n_false_pos"),
        F.expr(
            "sum(CASE WHEN claimed = 1 AND actual = 0 THEN 1 ELSE 0 END)"
            " * 1000000 div count(*)"
        ).alias("fp_rate_micro"),
    )


# name -> (query fn, oracle SQL): r11 registration day moves each
# entry into a @register decorator verbatim.
R11_QUEUE = {
    "sketch_kmv_set_ops": (sketch_kmv_set_ops, KMV_ORACLE),
    "events_quantile_daily_rollup": (
        events_quantile_daily_rollup,
        QUANTILE_ROLLUP_ORACLE,
    ),
    "ann_recall_eval": (ann_recall_eval, ANN_RECALL_ORACLE),
    "dedup_lsh_eval": (dedup_lsh_eval, LSH_EVAL_ORACLE),
    "retrieval_margin_bitext": (retrieval_margin_bitext, BITEXT_ORACLE),
    "curation_diversity_prune": (
        curation_diversity_prune,
        DIVERSITY_PRUNE_ORACLE,
    ),
    "corpus_ngram_coverage_curve": (
        corpus_ngram_coverage_curve,
        COVERAGE_ORACLE,
    ),
    "text_zipf_fit": (text_zipf_fit, ZIPF_ORACLE),
    "graph_label_propagation": (graph_label_propagation, LPA_ORACLE),
    "sketch_bloom_membership": (sketch_bloom_membership, BLOOM_ORACLE),
}


# ---------------------------------------------------------------------------
# r11 registration: publish every queue entry into the driver-facing
# registry (the r10 pattern — looping over R11_QUEUE keeps the queue
# dict, which tests/test_r11_queue.py verifies against the DuckDB
# oracles, and the registry surface mechanically identical).
# ---------------------------------------------------------------------------
from ..registry import register  # noqa: E402

for _name, (_fn, _oracle) in R11_QUEUE.items():
    register(_name, _oracle)(_fn)
