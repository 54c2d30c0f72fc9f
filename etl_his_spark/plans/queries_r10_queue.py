"""Round-10 gate queue — REGISTERED on r10 registration day.

Written and tri-scale-verified in round 9 (r9 hit the
ten-additions-per-round cap, so these gates waited for r10). The
``R10_QUEUE`` dict remains the (fn, oracle) source of truth — the
``register`` loop at the bottom publishes every entry into the
driver-facing registry verbatim, so the queue pytest
(tests/test_r10_queue.py, same canonicalized comparison as
tools/check_correctness.py) and the registry surface can never
drift apart. Registration-day checklist (done in r10): register
loop below, each name in bench.py HEADLINE and the registry's
_CHECK_FIRST window (positions 11-20), and
``quality_trigram_backoff`` in tools/audit_plans.py
CROSS_JOIN_ALLOW — its 1-row N-scalar broadcast plans as a
BroadcastNestedLoopJoin, the same documented pattern as
quality_bigram_likelihood (the other queue plans audited CLEAN;
exponents in R10_QUEUE_SCALE.json, all sub-linear).

The queue (machinery built and test-pinned in r9; every entry
verified tri-scale at sf0.001/0.01/0.1 on the day it was written):
- ``corpus_exactsubstr_cut``      — operators/exact_substring.py
- ``sketch_hll_user_registers``   — operators/sketches.hll_registers
- ``dedup_weighted_jaccard``      — operators/dedup_approx.weighted_*
- ``dedup_weighted_minhash_sig``  — the estimator twin (same oracle algebra)
- ``streaming_hll_users_agree``   — 8th live streaming lane, exact SQL oracle
- ``events_hll_daily_rollup``     — merge-at-read-time ≡ recompute (monoid)
- ``dedup_weighted_lsh_candidates`` — banded weighted-LSH scale path
- ``quality_trigram_backoff``     — held-out stupid-backoff LM scoring
- ``events_cms_daily_rollup``     — additive-monoid rollup twin (merge_cms)
- ``retrieval_hard_negatives``    — cross-source hard-negative mining (shingle overlap)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup_approx import weighted_jaccard_pairs
from ..operators.exact_substring import exact_substring_cut
from ..operators.sketches import hll_registers
from ..sources.readers import read_table

CUT_ORACLE = """
    WITH words AS (
        SELECT doc_id,
               list_filter(string_split(trim(text), ' '), x -> x <> '') AS w
        FROM documents WHERE text IS NOT NULL
    ),
    toks AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
               unnest(w) AS token, generate_subscripts(w, 1) AS pos
        FROM words WHERE len(w) >= 8
    ),
    shw AS (
        SELECT doc_id, n_tokens, pos,
               CAST('0x' || substr(md5(string_agg(token, ' ') OVER w8),
                                   1, 15) AS BIGINT) AS fp,
               count(*) OVER w8 AS wn
        FROM toks
        WINDOW w8 AS (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING)
    ),
    full8 AS (SELECT doc_id, n_tokens, pos, fp FROM shw WHERE wn = 8),
    fpc AS (
        SELECT fp FROM full8 GROUP BY 1 HAVING count(*) >= 2
    ),
    spans AS (
        SELECT f.doc_id, f.pos AS span_start, f.pos + 7 AS span_end
        FROM full8 f JOIN fpc USING (fp)
    ),
    flagged AS (
        SELECT *,
               CASE WHEN max(span_end) OVER (
                        PARTITION BY doc_id ORDER BY span_start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                 OR span_start > max(span_end) OVER (
                        PARTITION BY doc_id ORDER BY span_start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS is_new
        FROM spans
    ),
    islands AS (
        SELECT *, sum(is_new) OVER (
                   PARTITION BY doc_id ORDER BY span_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS island
        FROM flagged
    ),
    merged AS (
        SELECT doc_id, island, min(span_start) AS m_start,
               max(span_end) AS m_end
        FROM islands GROUP BY 1, 2
    ),
    covered AS (
        SELECT doc_id, unnest(generate_series(m_start, m_end)) AS pos
        FROM merged
    ),
    kept AS (
        SELECT t.doc_id, t.pos, t.token
        FROM toks t ANTI JOIN covered c
          ON c.doc_id = t.doc_id AND c.pos = t.pos
    ),
    cleaned AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(token, ' ' ORDER BY pos) AS clean_text
        FROM kept GROUP BY 1
    ),
    sized AS (
        SELECT doc_id, max(n_tokens) AS n_tokens FROM full8 GROUP BY 1
    ),
    long_docs AS (
        SELECT s.doc_id, s.n_tokens,
               CAST(s.n_tokens - COALESCE(c.n_kept, 0) AS BIGINT)
                   AS n_removed,
               COALESCE(c.clean_text, '') AS clean_text
        FROM sized s LEFT JOIN cleaned c USING (doc_id)
    ),
    short_docs AS (
        SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
               CAST(0 AS BIGINT) AS n_removed,
               array_to_string(w, ' ') AS clean_text
        FROM words WHERE len(w) < 8
    )
    SELECT * FROM long_docs UNION ALL SELECT * FROM short_docs
"""


def corpus_exactsubstr_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr CUT over the documents table — the removal half of
    the registered ``dedup_exact_substring_spans`` detection gate
    (operators/exact_substring.py has the full plan argument)."""
    return exact_substring_cut(
        read_table(spark, sf_dir, "documents"), k=8
    )


HLL_ORACLE = """
    WITH h AS (
        SELECT event_type,
               CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h60
        FROM events
    )
    SELECT event_type,
           CAST(h60 // 2251799813685248 AS BIGINT) AS bucket,
           CAST(max(CASE WHEN h60 % 2251799813685248 = 0 THEN 52
                    ELSE 52 - length(bin(h60 % 2251799813685248))
                    END) AS INT) AS register
    FROM h GROUP BY 1, 2
"""


def sketch_hll_user_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type HLL registers of distinct users — the
    cross-engine-exact sketch (operators/sketches.hll_registers);
    the streaming twin is bit-identical (tests/test_streaming_hll.py)."""
    return hll_registers(
        read_table(spark, sf_dir, "events").withColumn(
            "uid", F.col("user_id").cast("string")
        ),
        "uid",
        group_cols=["event_type"],
    ).select("event_type", "bucket", "register")


WEIGHTED_JACCARD_ORACLE = """
    WITH words AS (
        SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    shs AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle_s
        FROM words WHERE len(w) >= 3
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               CAST('0x' || substr(md5(shingle_s), 1, 15) AS BIGINT)
                   AS shingle
        FROM shs
    ),
    dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
    wts AS (
        SELECT shingle, df,
               CASE WHEN df <= 1 THEN 4 WHEN df <= 3 THEN 3
                    WHEN df <= 10 THEN 2 ELSE 1 END AS w
        FROM dfreq
    ),
    totals AS (
        SELECT doc_id, CAST(sum(w) AS BIGINT) AS wt
        FROM sh JOIN wts USING (shingle) GROUP BY 1
    ),
    posting AS (
        SELECT doc_id, sh.shingle, w
        FROM sh JOIN wts USING (shingle) WHERE df <= 64
    ),
    shared AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               CAST(sum(a.w) AS BIGINT) AS shared_w
        FROM posting a JOIN posting b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT a_id, b_id, shared_w,
           CAST(shared_w * 1000000
                // (ta.wt + tb.wt - shared_w) AS BIGINT) AS wjacc_micro
    FROM shared
    JOIN totals ta ON a_id = ta.doc_id
    JOIN totals tb ON b_id = tb.doc_id
    WHERE CAST(shared_w * 1000000
               // (ta.wt + tb.wt - shared_w) AS BIGINT) >= 300000
"""


def dedup_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact IDF-weighted Jaccard pairs ≥ 0.3 (micro-units) — the
    boilerplate-downweighting near-dup scorer
    (operators/dedup_approx.weighted_jaccard_pairs)."""
    return weighted_jaccard_pairs(
        read_table(spark, sf_dir, "documents"), threshold_micro=300_000
    )


# name -> (query fn, oracle SQL): r10 registration day moves each
# entry into a @register decorator verbatim.
R10_QUEUE = {
    "corpus_exactsubstr_cut": (corpus_exactsubstr_cut, CUT_ORACLE),
    "sketch_hll_user_registers": (sketch_hll_user_registers, HLL_ORACLE),
    "dedup_weighted_jaccard": (dedup_weighted_jaccard, WEIGHTED_JACCARD_ORACLE),
}


from ..operators.dedup_approx import (  # noqa: E402
    MINHASH_A,
    MINHASH_B,
    MINHASH_FOLD,
    MINHASH_P,
    N_MINHASH,
    weighted_minhash_signatures,
)

_WMH_MIN_COLS = ",\n               ".join(
    f"min(({MINHASH_A[i]} * h30 + {MINHASH_B[i]}) % {MINHASH_P}) AS mh{i}"
    for i in range(N_MINHASH)
)

WEIGHTED_MINHASH_ORACLE = f"""
    WITH words AS (
        SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    shs AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle_s
        FROM words WHERE len(w) >= 3
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               CAST('0x' || substr(md5(shingle_s), 1, 15) AS BIGINT)
                   AS shingle
        FROM shs
    ),
    dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
    wts AS (
        SELECT shingle,
               CASE WHEN df <= 1 THEN 4 WHEN df <= 3 THEN 3
                    WHEN df <= 10 THEN 2 ELSE 1 END AS w
        FROM dfreq
    ),
    variants AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(CAST(shingle AS VARCHAR) || ':'
                    || CAST(r AS VARCHAR)), 1, 15) AS BIGINT)
                   % {MINHASH_FOLD} AS h30
        FROM sh JOIN wts USING (shingle),
             (SELECT unnest([0, 1, 2, 3]) AS r)
        WHERE r < w
    )
    SELECT doc_id,
               {_WMH_MIN_COLS}
    FROM variants GROUP BY doc_id
"""


def dedup_weighted_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-weighted MinHash signatures over documents — the estimator
    twin of ``dedup_weighted_jaccard``
    (operators/dedup_approx.weighted_minhash_signatures; exactly
    unbiased because weights are a global shingle function)."""
    return weighted_minhash_signatures(
        read_table(spark, sf_dir, "documents")
    )


def streaming_hll_users_agree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type HLL registers from a REAL Structured Streaming
    aggregation (complete-mode availableNow replay): the register max
    is monotone, so state is bounded and no watermark is needed, and
    the streamed registers are BIT-IDENTICAL to batch — which is why
    this streaming lane can carry the same exact DuckDB oracle as the
    batch gate (``HLL_ORACLE``). Would be the eighth live streaming
    lane under the gate."""
    from .queries_streaming import (
        _events_replay_dir,
        _fresh_sink,
        _stream_run_conf,
    )
    from ..streaming.events import stream_events

    replay = _events_replay_dir(spark, sf_dir)
    name = _fresh_sink(spark, "stream_hll_gate")
    with _stream_run_conf(spark):
        q = (
            hll_registers(
                stream_events(spark, replay).withColumn(
                    "uid", F.col("user_id").cast("string")
                ),
                "uid",
                group_cols=["event_type"],
            )
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name).select("event_type", "bucket", "register")


R10_QUEUE["dedup_weighted_minhash_sig"] = (
    dedup_weighted_minhash_sig, WEIGHTED_MINHASH_ORACLE
)
R10_QUEUE["streaming_hll_users_agree"] = (
    streaming_hll_users_agree, HLL_ORACLE
)


HLL_ROLLUP_ORACLE = """
    WITH h AS (
        SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h60
        FROM events
    )
    SELECT CAST(h60 // 2251799813685248 AS BIGINT) AS bucket,
           CAST(max(CASE WHEN h60 % 2251799813685248 = 0 THEN 52
                    ELSE 52 - length(bin(h60 % 2251799813685248))
                    END) AS INT) AS register
    FROM h GROUP BY 1
"""


def events_hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch rollup — the continuous-aggregate pattern at 100 TB:
    build one HLL PER DAY (the partial a daily job would persist
    beside its partition), then merge the daily sketches by register
    max at read time. The gate emits the MERGED registers and the
    oracle computes the whole-range sketch directly — hash equality
    proves merge-at-read-time ≡ recompute-over-everything, which is
    the contract that lets a 100 TB deployment answer "distinct users
    this quarter" from 90 × 512 ints instead of a quarter of raw
    events. (HLL is a max-monoid; same idiom as ``merge_cms``.)"""
    from ..operators.sketches import hll_merge

    daily = hll_registers(
        read_table(spark, sf_dir, "events")
        .withColumn("uid", F.col("user_id").cast("string"))
        .withColumn("day", F.to_date("ts")),
        "uid",
        group_cols=["day"],
    )
    return hll_merge(daily.select("bucket", "register")).select(
        "bucket", "register"
    )


# band-union SQL generated locally (importing queries_dedup's private
# fragment here flips the registry's canonical plan-module load order
# and trips its queries_retrieval <- queries_dedup import)
_WMH_BAND_UNION = "\n        UNION ALL\n        ".join(
    "SELECT doc_id, {b} AS band, md5({concat}) AS band_sig FROM wsig".format(
        b=b,
        concat=" || ',' || ".join(
            f"mh{b * 4 + j}::VARCHAR" for j in range(4)
        ),
    )
    for b in range(N_MINHASH // 4)
)

WEIGHTED_LSH_ORACLE = f"""
    WITH words AS (
        SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
    ),
    shs AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle_s
        FROM words WHERE len(w) >= 3
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               CAST('0x' || substr(md5(shingle_s), 1, 15) AS BIGINT)
                   AS shingle
        FROM shs
    ),
    dfreq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY 1),
    wts AS (
        SELECT shingle,
               CASE WHEN df <= 1 THEN 4 WHEN df <= 3 THEN 3
                    WHEN df <= 10 THEN 2 ELSE 1 END AS w
        FROM dfreq
    ),
    variants AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(CAST(shingle AS VARCHAR) || ':'
                    || CAST(r AS VARCHAR)), 1, 15) AS BIGINT)
                   % {MINHASH_FOLD} AS h30
        FROM sh JOIN wts USING (shingle),
             (SELECT unnest([0, 1, 2, 3]) AS r)
        WHERE r < w
    ),
    wsig AS (
        SELECT doc_id,
               {_WMH_MIN_COLS}
        FROM variants GROUP BY doc_id
    ),
    bands AS (
        {_WMH_BAND_UNION}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_sig = b.band_sig
         AND a.doc_id < b.doc_id
    )
    SELECT c.a_id, c.b_id,
           CAST(({" + ".join(
               f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END"
               for i in range(N_MINHASH)
           )}) * 1000000 // {N_MINHASH} AS BIGINT) AS est_micro
    FROM cand c
    JOIN wsig sa ON sa.doc_id = c.a_id
    JOIN wsig sb ON sb.doc_id = c.b_id
"""


def dedup_weighted_lsh_candidates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Banded LSH over the WEIGHTED signatures: same-bucket candidate
    pairs + integer-micro estimated weighted Jaccard (matching
    components / 16). The weighted twin of ``dedup_minhash_lsh`` —
    bucketed, never all-pairs; completes the boilerplate-robust dedup
    lane's scale path."""
    sigs = weighted_minhash_signatures(
        read_table(spark, sf_dir, "documents")
    ).localCheckpoint(eager=False)
    sig_arr = sigs.select(
        "doc_id",
        F.array(*[F.col(f"mh{i}") for i in range(N_MINHASH)]).alias("sig"),
    )
    bands = sig_arr.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * 4 + j + 1).cast(
                                    "string"
                                )
                                for j in range(4)
                            ],
                        )
                    ).alias("band_sig"),
                )
                for b in range(N_MINHASH // 4)
            ])
        ).alias("bs"),
    ).select("doc_id", "sig", F.col("bs.band").alias("band"),
             F.col("bs.band_sig").alias("band_sig"))
    a = bands.select(
        F.col("doc_id").alias("a_id"), F.col("sig").alias("sig_a"),
        "band", "band_sig",
    )
    b = bands.select(
        F.col("doc_id").alias("b_id"), F.col("sig").alias("sig_b"),
        "band", "band_sig",
    )
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id",
            F.aggregate(
                F.zip_with(
                    "sig_a", "sig_b",
                    lambda x, y: F.when(x == y, 1).otherwise(0),
                ),
                F.lit(0),
                lambda acc, v: acc + v,
            ).alias("n_match"),
        )
        .distinct()
        .select(
            "a_id", "b_id",
            F.expr(
                f"CAST(n_match * 1000000 div {N_MINHASH} AS BIGINT)"
            ).alias("est_micro"),
        )
    )


R10_QUEUE["events_hll_daily_rollup"] = (
    events_hll_daily_rollup, HLL_ROLLUP_ORACLE
)
R10_QUEUE["dedup_weighted_lsh_candidates"] = (
    dedup_weighted_lsh_candidates, WEIGHTED_LSH_ORACLE
)


TRIGRAM_BACKOFF_ORACLE = """
    WITH words AS (
        SELECT doc_id,
               list_filter(string_split(trim(text), ' '), x -> x <> '') AS w
        FROM documents WHERE text IS NOT NULL
    ),
    train AS (SELECT * FROM words WHERE doc_id % 2 = 0),
    score_docs AS (SELECT * FROM words WHERE doc_id % 2 = 1 AND len(w) >= 3),
    tr_toks AS (
        SELECT unnest(w) AS token FROM train
    ),
    c1 AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM tr_toks GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tr_toks),
    c2 AS (
        SELECT CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS h2,
               CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(list_transform(range(2, len(w) + 1),
                  i -> w[i-1] || ' ' || w[i])) AS g FROM train)
        GROUP BY 1
    ),
    c3 AS (
        SELECT CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS h3,
               CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(list_transform(range(3, len(w) + 1),
                  i -> w[i-2] || ' ' || w[i-1] || ' ' || w[i])) AS g
              FROM train)
        GROUP BY 1
    ),
    inst AS (
        SELECT doc_id,
               u.g.w2 AS w2, u.g.w3 AS w3,
               CAST('0x' || substr(md5(u.g.t3), 1, 15) AS BIGINT) AS h3,
               CAST('0x' || substr(md5(u.g.p2), 1, 15) AS BIGINT) AS h2p,
               CAST('0x' || substr(md5(u.g.s2), 1, 15) AS BIGINT) AS h2s
        FROM (
          SELECT doc_id,
                 unnest(list_transform(range(3, len(w) + 1), i -> {
                     'w2': w[i-1], 'w3': w[i],
                     't3': w[i-2] || ' ' || w[i-1] || ' ' || w[i],
                     'p2': w[i-2] || ' ' || w[i-1],
                     's2': w[i-1] || ' ' || w[i]
                 })) AS g
          FROM score_docs
        ) u
    ),
    scored AS (
        SELECT i.doc_id,
               CASE
                 WHEN t3.c IS NOT NULL
                   THEN t3.c * 1000000 // p2.c
                 WHEN s2.c IS NOT NULL
                   THEN 2 * s2.c * 1000000 // (5 * u2.c)
                 WHEN u3.c IS NOT NULL
                   THEN 4 * u3.c * 1000000 // (25 * nn.n)
                 ELSE 0
               END AS s_micro
        FROM inst i
        LEFT JOIN c3 t3 ON t3.h3 = i.h3
        LEFT JOIN c2 p2 ON p2.h2 = i.h2p
        LEFT JOIN c2 s2 ON s2.h2 = i.h2s
        LEFT JOIN c1 u2 ON u2.token = i.w2
        LEFT JOIN c1 u3 ON u3.token = i.w3
        CROSS JOIN nn
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           CAST(sum(s_micro) AS BIGINT) AS score_micro,
           CAST(CAST(sum(s_micro) AS BIGINT) // count(*) AS BIGINT)
               AS mean_micro
    FROM scored GROUP BY 1
"""


def quality_trigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram LM quality score (Brants et al. 2007,
    "Large Language Models in Machine Translation" — THE distributed
    LM smoothing: no normalization, no discount estimation, each
    level a count ratio with a fixed 0.4 backoff factor, which is
    what makes it computable as pure count joins at any corpus size).

    HELD-OUT contract, not self-scoring: counts come from even
    doc_ids, scores apply to odd doc_ids — on the training half every
    trigram trivially exists (c3 >= 1 for its own occurrence), so the
    backoff chain only means something against held-out text. Score
    per trigram position, in exact integer micro-units (0.4 = 2/5 and
    0.16 = 4/25 as integer multiply-then-div, identical floors both
    engines):

      S(w3|w1w2) = c3/c2(w1w2)            if the trigram was seen
                 = 0.4 * c2(w2w3)/c1(w2)  else if the suffix bigram was
                 = 0.16 * c1(w3)/N        else if w3 was seen
                 = 0                      else (OOV)

    Plan: training counts are three map-side gram emissions (array
    ``transform`` — no windows) into hash-keyed aggs (8-byte md5
    join keys, the repo discipline); scoring is four LEFT hash joins
    + one 1-row broadcast (N) over the held-out trigram instances —
    all keyed, corpus-linear, no window functions anywhere."""
    # spread_small_input tried and REJECTED here (r14, interleaved
    # fresh-JVM A/B 2.45 -> 2.70 s): the 3 gram emissions + held-out
    # side each re-execute the repartition, so spreading costs 4 small
    # text shuffles while the per-pass split/md5 work is too light to
    # repay them (contrast corpus_ngram_coverage_curve, ONE consumer,
    # 2.13 -> 1.19 s with the same spread).
    base = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.filter(
                F.split(F.trim("text"), " "), lambda x: x != F.lit("")
            ).alias("w"),
        )
        .withColumn("n", F.size("w"))
    )
    train = base.filter(F.col("doc_id") % 2 == 0)
    held = base.filter((F.col("doc_id") % 2 == 1) & (F.col("n") >= 3))

    from ..operators.dedup_approx import seeded_hash60

    tr_toks = train.select(F.explode("w").alias("token"))
    # c1 feeds TWO score joins plus the corpus total; c2 feeds two.
    # Un-pinned, each consumer re-ran the full documents explode (the
    # fixed audit_scans regex measured 7 documents scans). The count
    # dims are vocab-BOUNDED — exactly the frames the checkpoint
    # policy says to pin (never the corpus-sized token stream) — and
    # N_total is just sum(c1.c), so the separate total-count pass
    # collapses into the pinned frame too: 7 scans → 4 (one per gram
    # order + the held-out side), the irreducible floor for three
    # independent gram emissions.
    c1 = (
        tr_toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=False)
    )
    # coalesce: sum() is NULL on an empty train split (tr_toks count
    # returned 0), which would silently nullify every backoff score
    # downstream (ADVICE r10).
    nn = c1.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_total")
    )

    def gram_counts(k: int, out: str):
        # n >= k guard: F.sequence(k, n) is DESCENDING when n < k (Spark
        # emits k..n), which would make element_at probe index 0 and
        # throw — while the oracle's range(k, len+1) is simply empty.
        # Mirrors the held-out side's n >= 3 filter.
        g = train.filter(F.col("n") >= k).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(k), F.col("n")),
                    lambda i: F.concat_ws(
                        " ",
                        *[
                            F.element_at("w", (i - (k - 1 - j)).cast("int"))
                            for j in range(k)
                        ],
                    ),
                )
            ).alias("g")
        )
        return g.select(seeded_hash60(F.col("g")).alias(out)).groupBy(
            out
        ).agg(F.count(F.lit(1)).cast("long").alias("c"))

    c2 = gram_counts(2, "h2").localCheckpoint(eager=False)
    c3 = gram_counts(3, "h3")

    inst = held.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(3), F.col("n")),
                lambda i: F.struct(
                    F.element_at("w", (i - 1).cast("int")).alias("w2"),
                    F.element_at("w", i.cast("int")).alias("w3"),
                    seeded_hash60(
                        F.concat_ws(
                            " ",
                            F.element_at("w", (i - 2).cast("int")),
                            F.element_at("w", (i - 1).cast("int")),
                            F.element_at("w", i.cast("int")),
                        )
                    ).alias("h3"),
                    seeded_hash60(
                        F.concat_ws(
                            " ",
                            F.element_at("w", (i - 2).cast("int")),
                            F.element_at("w", (i - 1).cast("int")),
                        )
                    ).alias("h2p"),
                    seeded_hash60(
                        F.concat_ws(
                            " ",
                            F.element_at("w", (i - 1).cast("int")),
                            F.element_at("w", i.cast("int")),
                        )
                    ).alias("h2s"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", "g.w2", "g.w3", "g.h3", "g.h2p", "g.h2s")

    scored = (
        inst.join(c3.withColumnRenamed("c", "c_t3"), inst.h3 == c3.h3, "left")
        .drop(c3.h3)
        .join(
            c2.select(F.col("h2").alias("h2p_k"), F.col("c").alias("c_p2")),
            F.col("h2p") == F.col("h2p_k"), "left",
        )
        .join(
            c2.select(F.col("h2").alias("h2s_k"), F.col("c").alias("c_s2")),
            F.col("h2s") == F.col("h2s_k"), "left",
        )
        .join(
            c1.select(F.col("token").alias("w2_k"), F.col("c").alias("c_u2")),
            F.col("w2") == F.col("w2_k"), "left",
        )
        .join(
            c1.select(F.col("token").alias("w3_k"), F.col("c").alias("c_u3")),
            F.col("w3") == F.col("w3_k"), "left",
        )
        .crossJoin(F.broadcast(nn))
        .withColumn(
            "s_micro",
            F.expr(
                "CASE WHEN c_t3 IS NOT NULL"
                "       THEN c_t3 * 1000000 div c_p2"
                "     WHEN c_s2 IS NOT NULL"
                "       THEN 2 * c_s2 * 1000000 div (5 * c_u2)"
                "     WHEN c_u3 IS NOT NULL"
                "       THEN 4 * c_u3 * 1000000 div (25 * n_total)"
                "     ELSE 0 END"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        F.sum("s_micro").cast("long").alias("score_micro"),
        F.expr(
            "CAST(CAST(sum(s_micro) AS BIGINT) div count(*) AS BIGINT)"
        ).alias("mean_micro"),
    )


R10_QUEUE["quality_trigram_backoff"] = (
    quality_trigram_backoff, TRIGRAM_BACKOFF_ORACLE
)


CMS_ROLLUP_ORACLE = """
    WITH h AS (
        SELECT j,
               CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                    || CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
                   % 512 AS bucket
        FROM events, (SELECT unnest([0, 1, 2]) AS j)
    )
    SELECT CAST(j AS INT) AS seed, bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM h GROUP BY 1, 2
"""


def events_cms_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The additive twin of ``events_hll_daily_rollup``: one count–min
    sketch of per-user event counts PER DAY (the partial a daily job
    persists), merged by cell-wise SUM at read time. The gate emits
    the merged cells and the oracle computes the whole-range sketch
    directly — hash equality proves the sum-monoid rollup contract
    (``merge_cms``), i.e. "how often did user X appear this quarter,
    within CMS error" is answerable from 90 × 1,536 ints."""
    from ..operators.sketches import count_min_build, merge_cms

    daily = count_min_build(
        read_table(spark, sf_dir, "events")
        .withColumn("uid", F.col("user_id").cast("string"))
        .withColumn("day", F.to_date("ts")),
        "uid",
        depth=3,
        width=512,
        group_cols=["day"],
    )
    return merge_cms(daily.select("seed", "bucket", "cnt")).select(
        F.col("seed").cast("int").alias("seed"),
        "bucket",
        F.col("cnt").cast("long").alias("cnt"),
    )


R10_QUEUE["events_cms_daily_rollup"] = (
    events_cms_daily_rollup, CMS_ROLLUP_ORACLE
)


HARD_NEGATIVES_ORACLE = """
    WITH words AS (
        SELECT doc_id, source, string_split(trim(text), ' ') AS w
        FROM documents WHERE text IS NOT NULL
    ),
    shs AS (
        SELECT doc_id, source,
               unnest(list_transform(range(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle_s
        FROM words WHERE len(w) >= 3
    ),
    sh AS (
        SELECT DISTINCT doc_id, source,
               CAST('0x' || substr(md5(shingle_s), 1, 15) AS BIGINT)
                   AS shingle
        FROM shs
    ),
    df AS (
        SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 64
    ),
    posting AS (SELECT doc_id, source, shingle FROM sh JOIN df USING (shingle)),
    anchors AS (SELECT * FROM posting WHERE doc_id % 97 = 0),
    pairs AS (
        SELECT a.doc_id AS anchor_id, c.doc_id AS neg_id,
               CAST(count(*) AS BIGINT) AS shared_shingles
        FROM anchors a JOIN posting c
          ON c.shingle = a.shingle
         AND c.doc_id <> a.doc_id
         AND c.source <> a.source
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT anchor_id, neg_id, shared_shingles,
               CAST(row_number() OVER (
                   PARTITION BY anchor_id
                   ORDER BY shared_shingles DESC, neg_id
               ) AS BIGINT) AS rank
        FROM pairs
    )
    SELECT anchor_id, neg_id, shared_shingles, rank
    FROM ranked WHERE rank <= 5
"""


def retrieval_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    document (a deterministic 1% sample, doc_id % 97 = 0), the five
    documents from a DIFFERENT source sharing the most distinct
    3-gram shingles — near-misses that share phrasing but are known
    non-positives, the pairs that make an embedding model learn
    boundaries (in-batch random negatives are trivially separable;
    hard ones carry the gradient).

    The overlap key is the word-3-gram shingle, not the unigram
    token: shingle document frequency stays low even on a saturated
    unigram vocabulary (measured mean df ~35 on the sf0.1 fixture
    where nearly every TOKEN exceeds any sane cap), so the df<=64
    boilerplate cap keeps its selectivity at every scale — the same
    df-cap rationale as the containment/winnowing lanes. Exact by
    construction (integer shared counts, deterministic
    (score DESC, neg_id) tiebreak); the per-anchor ranking window
    partitions on the 1% sample. Anchor x posting join is df-capped
    and source-filtered — linear in corpus, never corpus x corpus."""
    from ..operators.dedup_approx import shingle_rows

    docs = read_table(spark, sf_dir, "documents")
    src_map = docs.select("doc_id", "source")
    sh = (
        shingle_rows(docs)
        .join(src_map, "doc_id")
        .localCheckpoint(eager=False)
    )
    keep = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= 64)
        .select("shingle")
    )
    posting = sh.join(keep, "shingle")
    anchors = posting.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("anchor_id"),
        F.col("source").alias("a_source"),
        "shingle",
    )
    cands = posting.select(
        F.col("doc_id").alias("neg_id"),
        F.col("source").alias("c_source"),
        "shingle",
    )
    pairs = (
        anchors.join(cands, "shingle")
        .filter(
            (F.col("neg_id") != F.col("anchor_id"))
            & (F.col("c_source") != F.col("a_source"))
        )
        .groupBy("anchor_id", "neg_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_shingles"))
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("shared_shingles"), F.asc("neg_id")
    )
    return (
        pairs.withColumn(
            "rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("rank") <= 5)
        .select("anchor_id", "neg_id", "shared_shingles", "rank")
    )


R10_QUEUE["retrieval_hard_negatives"] = (
    retrieval_hard_negatives, HARD_NEGATIVES_ORACLE
)


# ---------------------------------------------------------------------------
# r10 registration: publish every queue entry into the driver-facing
# registry. Looping over R10_QUEUE (instead of ten decorators) keeps
# the queue dict — which tests/test_r10_queue.py verifies against the
# DuckDB oracles — and the registry surface mechanically identical.
# ---------------------------------------------------------------------------
from ..registry import register  # noqa: E402

for _name, (_fn, _oracle) in R10_QUEUE.items():
    register(_name, _oracle)(_fn)
