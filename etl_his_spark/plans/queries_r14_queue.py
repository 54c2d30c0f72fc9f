"""Round-14 gate queue — complete (fn, oracle) pairs, UNregistered.

Written in round 12 (one round AHEAD of the usual cadence — the r13
queue was authored the same round, so this is the next tranche in the
same ≤10-registrations-per-round pipeline: r13 registers
``queries_r13_queue.py``, r14 registers this). ``R14_QUEUE`` maps
name -> (query fn, DuckDB oracle); ``tests/test_r14_queue.py`` runs
the REAL driver-style canonicalized comparison over every entry each
pytest run.

The slate (why each earns a gate at 100 TB):

- ``lakehouse_vacuum_plan`` — snapshot-retention vacuum planning over
  a VERSIONED file manifest: superseded file versions are binned into
  delete / retain-grace / live by whether their successor's snapshot
  has aged past retention. Like the compaction gate, the plan reads
  manifest rows only — planning a 100 TB vacuum reads kilobytes.
- ``stats_theil_sen_trend`` — the robust trend estimator: exact
  median of pairwise monthly slopes per order priority, all-integer
  via an offset floor-division identity (no rational comparison
  crosses the engine boundary). Pairs live on the bounded month
  domain (≤ months² per group at any corpus size).
- ``embedding_binary_recall`` — binary-quantization retrieval eval:
  within sign-LSH cells, top-3 by Hamming distance over the 64-bit
  sign packing vs top-3 by full integer dot (the 32×-cheaper storage
  question, the matryoshka gate's sibling). XOR + bit_count on two
  packed 32-bit halves — engine-identical integers.
- ``events_ab_srm`` — sample-ratio-mismatch check per experiment
  (event_type as the exposure, user_id parity as the arm): the
  2-arm chi-square in exact scaled-integer form
  1e6·(a−b)²/(a+b) with the 3.841 critical flag. The first gate any
  A/B pipeline runs; map-side distinct + a per-type row.
- ``multimodal_png_walk`` — PNG chunk walk with REAL CRC-32
  validation (big-endian lengths — the RIFF walker's complement):
  synthesized valid PNGs (Spark's crc32() builds the checksums; docs
  with doc_id % 7 == 0 carry a deliberately corrupted IDAT CRC), so
  the oracle states the chunk table AND the crc_ok outcomes
  analytically without computing a single CRC — proving the
  validation path actually runs.
- ``events_conversion_latency`` — first-view→first-purchase latency
  distribution in fixed dashboard buckets (<1m … ≥7d): bucket
  histogram + exact sum/min/max, all integer seconds. Two min-aggs +
  one as-of-style join; the bounded-bucket histogram is the
  scale-safe alternative to an exact global percentile.
- ``lakehouse_skipping_stats`` — data-clustering quality from the
  file manifest: per day, how many file pairs have overlapping
  [min, max] event_id ranges (overlap = a range query cannot skip
  them). The metric that tells a lakehouse whether its layout needs
  z-ordering; work is files-per-partition², manifest-bounded.
- ``text_vocab_drift`` — vocabulary drift between corpus snapshots
  (even/odd doc halves): per-category top tokens — drifted (both
  halves, largest rate ratio via ppb-normalized integer scores),
  new, dropped. The tokenizer-refresh decision input; token counts
  are vocab-bounded dims.
- ``events_bot_detection`` — burst-rate traffic cleaning: users whose
  busiest minute carries ≥ 10 events are flagged, with cohort volume
  stats. The pass an events pipeline runs before engagement data is
  trusted or harvested; one minute-keyed count + one per-user rollup.
- ``text_encoding_anomalies`` — mojibake / control-character corpus
  QA per source (U+FFFD, C0 controls, the UTF-8-as-Latin-1
  signature): the broken-extraction detector run before a source's
  text enters a training mix. Map-only regexp counting.

Every score is integer or fixed-point micro/ppb units; hashes are the
repo's 60-bit md5 — both engines run bit-identical arithmetic, so
the gates are hash-exact.

Registration-day checklist (the r10-r13 pattern): move each entry
into ``@register``, add names to bench.py HEADLINE and the registry
window, re-measure audit allowlists at sf0.001. Predicted:
- SINGLE_PARTITION_ALLOW + CROSS_JOIN_ALLOW: ``text_vocab_drift``
  (two 1-row half-corpus totals then broadcast — the
  quality_unigram_likelihood idiom).
- audit_scans ALLOW: ``text_vocab_drift`` ("documents" — two half
  scans + totals; measure).

Tri-scale proof: R14_QUEUE_SCALE.json (authored same-round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Finish the registry's plan-module import chain first (same
# circular-import note as the earlier queue modules).
from .. import registry as _registry  # noqa: F401

from ..sources.readers import read_table

# ---------------------------------------------------------------------------
# lakehouse_vacuum_plan — snapshot-retention vacuum over a versioned manifest
# ---------------------------------------------------------------------------

VACUUM_CURRENT_SNAP = 8
VACUUM_RETENTION = 3  # snapshots newer than CUR - R are in grace

VACUUM_ORACLE = f"""
    WITH manifest AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS part,
               o_orderkey % 16 AS file_id,
               CAST(sum(CAST(round(o_totalprice) AS BIGINT))
                    + 100 * count(*) AS BIGINT) AS base_bytes
        FROM orders GROUP BY 1, 2
    ),
    versions AS (
        SELECT part, file_id, v,
               file_id % 3 AS max_v,
               (file_id % 6) + v AS created_snap,
               base_bytes // (v + 1) AS bytes
        FROM manifest, unnest(range(0, (file_id % 3) + 1)) AS t(v)
    ),
    classed AS (
        SELECT part, bytes,
               CASE WHEN v = max_v THEN 'live'
                    WHEN (file_id % 6) + v + 1
                         > {VACUUM_CURRENT_SNAP - VACUUM_RETENTION}
                         THEN 'retain_grace'
                    ELSE 'delete' END AS action
        FROM versions
    )
    SELECT part, action,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(bytes) AS BIGINT) AS total_bytes
    FROM classed GROUP BY 1, 2
"""


def lakehouse_vacuum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vacuum planning over a VERSIONED file manifest: each simulated
    file (one per month-partition × write bucket, the compaction
    gate's manifest) carries 1-3 versions created at successive
    snapshots; only the latest version is live, and a superseded
    version may be deleted once its SUCCESSOR's snapshot has aged past
    retention (current {VACUUM_CURRENT_SNAP}, retention
    {VACUUM_RETENTION}) — before that it stays in grace so readers
    pinned to an old snapshot keep working. Output: per (partition,
    action) version counts and reclaimable bytes — the report a
    VACUUM dry-run prints.

    Like compaction planning, everything runs on the MANIFEST: the
    window-free version classification is a pure projection and the
    rollup is partition-bounded — planning a 100 TB vacuum reads
    kilobytes of metadata, never data.
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
        .alias("base_bytes")
    )
    versions = manifest.select(
        "part",
        "file_id",
        "base_bytes",
        F.explode(
            F.sequence(F.lit(0), (F.col("file_id") % 3).cast("int"))
        ).alias("v"),
    ).select(
        "part",
        F.expr("base_bytes div (v + 1)").alias("bytes"),
        F.when(F.col("v") == F.col("file_id") % 3, F.lit("live"))
        .when(
            (F.col("file_id") % 6) + F.col("v") + 1
            > VACUUM_CURRENT_SNAP - VACUUM_RETENTION,
            F.lit("retain_grace"),
        )
        .otherwise(F.lit("delete"))
        .alias("action"),
    )
    return versions.groupBy("part", "action").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("bytes").cast("long").alias("total_bytes"),
    )


# ---------------------------------------------------------------------------
# stats_theil_sen_trend — exact integer median-of-slopes per priority
# ---------------------------------------------------------------------------

# Offset that makes every slope numerator positive so floor == trunc
# in both engines. int64 bound: |1e6·Δcount| must stay < OFFSET·gap,
# i.e. monthly count deltas < 1e6 at gate scale (holds by orders of
# magnitude on the fixture); an extreme-scale deployment publishes
# milli instead (the corpus_token_gini headroom note).
TS_OFFSET = 10**12

TS_ORACLE = f"""
    WITH monthly AS (
        SELECT o_orderpriority AS grp,
               year(o_orderdate) * 12 + month(o_orderdate) AS m,
               CAST(count(*) AS BIGINT) AS c
        FROM orders GROUP BY 1, 2
    ),
    slopes AS (
        SELECT a.grp, a.m AS m_i, b.m AS m_j,
               (1000000 * (b.c - a.c) + {TS_OFFSET} * (b.m - a.m))
                   // (b.m - a.m) AS slope_off
        FROM monthly a JOIN monthly b
          ON a.grp = b.grp AND a.m < b.m
    ),
    ranked AS (
        SELECT grp, slope_off,
               row_number() OVER (PARTITION BY grp
                   ORDER BY slope_off, m_i, m_j) AS rk,
               count(*) OVER (PARTITION BY grp) AS n
        FROM slopes
    )
    SELECT grp AS o_orderpriority,
           CAST(max(n) AS BIGINT) AS n_pairs,
           CAST(max(CASE WHEN rk = (n + 1) // 2
                    THEN slope_off END) - {TS_OFFSET} AS BIGINT)
               AS median_slope_micro
    FROM ranked GROUP BY 1
"""


def stats_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of monthly order volume per priority:
    the exact MEDIAN of all pairwise slopes (Δcount/Δmonth) — the
    estimator that shrugs off outlier months where least squares
    does not. All-integer: each slope is floor(1e6·Δc/Δm) computed as
    (1e6·Δc + OFFSET·Δm) div Δm − OFFSET, whose numerator is positive
    by construction so Spark's truncating div and DuckDB's flooring
    // agree; the median is an exact rank pick (lower median,
    deterministic (slope, m_i, m_j) tie-break), never an average.

    Scale shape: pairwise slopes live on the MONTH domain — ≤
    months²/2 rows per group at any corpus size (the stats_ks_drift
    bounded-domain argument); the rank window partitions by group.
    """
    orders = read_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    a = monthly.select(
        "grp", F.col("m").alias("m_i"), F.col("c").alias("c_i")
    )
    b = monthly.select(
        "grp", F.col("m").alias("m_j"), F.col("c").alias("c_j")
    )
    slopes = (
        a.join(b, "grp")
        .filter(F.col("m_i") < F.col("m_j"))
        .select(
            "grp",
            "m_i",
            "m_j",
            F.expr(
                f"(1000000 * (c_j - c_i) + {TS_OFFSET}L * (m_j - m_i))"
                " div (m_j - m_i)"
            ).alias("slope_off"),
        )
    )
    wr = Window.partitionBy("grp").orderBy("slope_off", "m_i", "m_j")
    wn = Window.partitionBy("grp")
    ranked = slopes.select(
        "grp",
        "slope_off",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy(F.col("grp").alias("o_orderpriority")).agg(
        F.max("n").cast("long").alias("n_pairs"),
        (
            F.max(
                F.when(
                    F.col("rk") == F.expr("(n + 1) div 2"),
                    F.col("slope_off"),
                )
            )
            - F.lit(TS_OFFSET)
        )
        .cast("long")
        .alias("median_slope_micro"),
    )


# ---------------------------------------------------------------------------
# embedding_binary_recall — Hamming-over-sign-bits retrieval eval
# ---------------------------------------------------------------------------

BIN_BITS = 8       # sign-LSH cell bits (the ann_knn_graph convention)
BIN_TOP = 3

_BIN_CELL_SQL = " + ".join(
    f"(CASE WHEN e[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
    for j in range(BIN_BITS)
)
# 64 sign bits packed as two 32-bit halves (bit 63 of an int64 is the
# sign bit — two halves avoid any signed-overflow edge entirely).
_PACK_LO_SQL = " + ".join(
    f"(CASE WHEN e[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
    for j in range(32)
)
_PACK_HI_SQL = " + ".join(
    f"(CASE WHEN e[{j + 33}] > 0 THEN {1 << j} ELSE 0 END)"
    for j in range(32)
)

BIN_RECALL_ORACLE = f"""
    WITH vi AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 1000) AS BIGINT)) AS q
        FROM embeddings
    ),
    cells AS (
        SELECT vec_id, q,
               {_BIN_CELL_SQL} AS cell,
               CAST({_PACK_LO_SQL} AS BIGINT) AS lo,
               CAST({_PACK_HI_SQL} AS BIGINT) AS hi
        FROM vi
    ),
    pairs AS (
        SELECT a.cell, a.vec_id, b.vec_id AS nb,
               CAST(list_sum(list_transform(range(1, 65),
                    i -> a.q[i] * b.q[i])) AS BIGINT) AS dot_full,
               CAST(bit_count(xor(a.lo, b.lo))
                    + bit_count(xor(a.hi, b.hi)) AS BIGINT) AS ham
        FROM cells a JOIN cells b
          ON a.cell = b.cell AND a.vec_id <> b.vec_id
    ),
    tr AS (
        SELECT cell, vec_id, nb FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY dot_full DESC, nb) AS rk FROM pairs)
        WHERE rk <= {BIN_TOP}
    ),
    ap AS (
        SELECT vec_id, nb FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY ham, nb) AS rk FROM pairs)
        WHERE rk <= {BIN_TOP}
    ),
    pv AS (
        SELECT t.cell, t.vec_id,
               CAST(count(*) AS BIGINT) AS n_truth,
               CAST(count(a.nb) AS BIGINT) AS n_hit
        FROM tr t
        LEFT JOIN ap a ON a.vec_id = t.vec_id AND a.nb = t.nb
        GROUP BY 1, 2
    )
    SELECT CAST(cell AS BIGINT) AS cell,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(n_truth) AS BIGINT) AS n_truth_pairs,
           CAST(sum(n_hit) AS BIGINT) AS n_hits,
           CAST((1000000 * sum(n_hit)) // sum(n_truth) AS BIGINT)
               AS recall_micro
    FROM pv GROUP BY 1
"""


def embedding_binary_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization retrieval eval (the matryoshka gate's
    sibling, asking the STORAGE question instead of the dimension
    one): within sign-LSH cells, does the top-{BIN_TOP} by Hamming
    distance over the 64-bit sign packing recover the top-{BIN_TOP}
    by full integer dot? Sign bits pack into two 32-bit halves
    (avoiding the int64 sign-bit edge); Hamming = bit_count(xor) on
    each half — pure integer ops, engine-identical. Per-cell recall
    in micro: the measured basis for shipping 32×-smaller binary
    embeddings at 100 TB.

    Pair rows are computed ONCE carrying both scores; the cell
    equi-join bounds all pair work to within-cell pairs.
    """
    vi = read_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000).cast("long"),
        ).alias("q"),
    )

    def bitsum(lo: int, n: int) -> "F.Column":
        col = None
        for j in range(n):
            bit = F.when(
                F.element_at("e", lo + j + 1) > 0, F.lit(1 << j)
            ).otherwise(F.lit(0))
            col = bit if col is None else col + bit
        return col

    cells = vi.select(
        "vec_id",
        "q",
        bitsum(0, BIN_BITS).alias("cell"),
        bitsum(0, 32).cast("long").alias("lo"),
        bitsum(32, 32).cast("long").alias("hi"),
    )
    a = cells.select("cell", "vec_id", F.col("q").alias("a_q"),
                     F.col("lo").alias("a_lo"), F.col("hi").alias("a_hi"))
    b = cells.select(
        "cell", F.col("vec_id").alias("nb"), F.col("q").alias("b_q"),
        F.col("lo").alias("b_lo"), F.col("hi").alias("b_hi"),
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("vec_id") != F.col("nb"))
        .select(
            "cell",
            "vec_id",
            "nb",
            F.aggregate(
                F.zip_with("a_q", "b_q", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot_full"),
            (
                F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
                + F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
            )
            .cast("long")
            .alias("ham"),
        )
        .localCheckpoint(eager=False)
    )
    wf = Window.partitionBy("vec_id").orderBy(F.desc("dot_full"), F.asc("nb"))
    wh = Window.partitionBy("vec_id").orderBy(F.asc("ham"), F.asc("nb"))
    tr = (
        pairs.withColumn("rk", F.row_number().over(wf))
        .filter(F.col("rk") <= BIN_TOP)
        .select("cell", "vec_id", "nb")
    )
    ap = (
        pairs.withColumn("rk", F.row_number().over(wh))
        .filter(F.col("rk") <= BIN_TOP)
        .select(F.col("vec_id").alias("a_vid"), F.col("nb").alias("a_nb"))
        .withColumn("matched", F.lit(1))
    )
    pv = (
        tr.join(
            ap,
            (F.col("vec_id") == F.col("a_vid"))
            & (F.col("nb") == F.col("a_nb")),
            "left",
        )
        .groupBy("cell", "vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_truth"),
            F.count("matched").cast("long").alias("n_hit"),
        )
    )
    return pv.groupBy(F.col("cell").cast("long").alias("cell")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.sum("n_truth").cast("long").alias("n_truth_pairs"),
        F.sum("n_hit").cast("long").alias("n_hits"),
        F.expr(
            "CAST((1000000 * sum(n_hit)) div sum(n_truth) AS BIGINT)"
        ).alias("recall_micro"),
    )


# ---------------------------------------------------------------------------
# events_ab_srm — sample-ratio-mismatch per experiment exposure
# ---------------------------------------------------------------------------

SRM_CRIT_MICRO = 3841000  # chi-square(1 dof) 5% critical value, micro

SRM_ORACLE = f"""
    WITH arms AS (
        SELECT event_type,
               CAST(count(DISTINCT CASE WHEN user_id % 2 = 0
                          THEN user_id END) AS BIGINT) AS n_arm0,
               CAST(count(DISTINCT CASE WHEN user_id % 2 = 1
                          THEN user_id END) AS BIGINT) AS n_arm1
        FROM events GROUP BY 1
    )
    SELECT event_type, n_arm0, n_arm1,
           CAST((1000000 * (n_arm0 - n_arm1) * (n_arm0 - n_arm1))
                // greatest(n_arm0 + n_arm1, 1) AS BIGINT) AS chi2_micro,
           (1000000 * (n_arm0 - n_arm1) * (n_arm0 - n_arm1))
               // greatest(n_arm0 + n_arm1, 1) >= {SRM_CRIT_MICRO}
               AS srm_flag
    FROM arms
"""


def events_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check — the first sanity gate any A/B
    pipeline runs before reading a single metric: with a 50/50 split
    (user_id parity as the arm, event_type as the exposure), the
    2-arm chi-square statistic (a−b)²/(a+b) in exact scaled-integer
    micro against the 3.841 (5%, 1 dof) critical value. A flagged
    exposure means assignment or logging is broken and every
    downstream metric is untrustworthy.

    One distinct-user aggregation per type (map-side partial), one
    row per exposure — linear at any event volume.
    """
    ev = read_table(spark, sf_dir, "events")
    arms = ev.groupBy("event_type").agg(
        F.countDistinct(
            F.when(F.col("user_id") % 2 == 0, F.col("user_id"))
        )
        .cast("long")
        .alias("n_arm0"),
        F.countDistinct(
            F.when(F.col("user_id") % 2 == 1, F.col("user_id"))
        )
        .cast("long")
        .alias("n_arm1"),
    )
    chi2 = F.expr(
        "(1000000 * (n_arm0 - n_arm1) * (n_arm0 - n_arm1))"
        " div greatest(n_arm0 + n_arm1, 1)"
    )
    return arms.select(
        "event_type",
        "n_arm0",
        "n_arm1",
        chi2.cast("long").alias("chi2_micro"),
        (chi2 >= SRM_CRIT_MICRO).alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# multimodal_png_walk — PNG chunk walk with real CRC-32 validation
# ---------------------------------------------------------------------------

PNG_ORACLE = """
    SELECT doc_id AS media_id, 'IHDR' AS chunk_type,
           CAST(8 AS BIGINT) AS chunk_offset,
           CAST(13 AS BIGINT) AS chunk_length,
           TRUE AS crc_ok
    FROM documents
    UNION ALL
    SELECT doc_id, 'IDAT', CAST(33 AS BIGINT),
           CAST((doc_id % 32) + 1 AS BIGINT),
           doc_id % 7 <> 0
    FROM documents
    UNION ALL
    SELECT doc_id, 'IEND', CAST(46 + (doc_id % 32) AS BIGINT),
           CAST(0 AS BIGINT), TRUE
    FROM documents
"""


def multimodal_png_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container-integrity walk under a hard oracle — the PNG
    complement of the RIFF lane: big-endian lengths and per-chunk
    CRC-32 validation (crc32 over type+payload, the PNG spec rule).

    Spark-side: each doc becomes a valid PNG built with column
    expressions — signature, an 8×8 grayscale IHDR, an IDAT of
    doc-varying length whose CRC is computed by Spark's own crc32()
    builtin, and IEND. Docs with doc_id % 7 == 0 get a deliberately
    corrupted IDAT CRC (+1 mod 2³²), so the oracle can assert
    crc_ok = false exactly there — proving the walker's validation
    path runs rather than rubber-stamping. The oracle states chunk
    types, offsets, lengths and CRC outcomes analytically WITHOUT
    computing any CRC itself. Per-asset work is the byte walk + one
    CRC pass — metadata-priced at any corpus size.
    """
    from ..operators.multimodal import png_chunks

    L = "((doc_id % 32) + 1)"
    ihdr_payload = "0000000800000008" + "08" + "00000000"  # 13 bytes
    idat_payload = f"repeat(lpad(hex(doc_id % 256), 2, '0'), {L})"
    # crc32 over type+payload; the % 7 == 0 corruption adds 1 mod 2^32
    idat_crc = (
        f"(crc32(unhex(concat('49444154', {idat_payload})))"
        f" + CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END) % 4294967296"
    )
    media_hex = (
        "concat('89504E470D0A1A0A',"  # signature
        f" '0000000D', '49484452', '{ihdr_payload}',"
        f" lpad(hex(crc32(unhex(concat('49484452', '{ihdr_payload}')))), 8, '0'),"
        f" lpad(hex({L}), 8, '0'), '49444154', {idat_payload},"
        f" lpad(hex({idat_crc}), 8, '0'),"
        " '00000000', '49454E44',"
        " lpad(hex(crc32(unhex('49454E44'))), 8, '0'))"
    )
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.unhex(F.expr(media_hex)).alias("media_bytes"),
    )
    return png_chunks(media)


# ---------------------------------------------------------------------------
# events_conversion_latency — first-view→first-purchase latency buckets
# ---------------------------------------------------------------------------

LATENCY_BUCKETS_SQL = """
    CASE WHEN lat < 60 THEN 'lt_1m'
         WHEN lat < 600 THEN 'lt_10m'
         WHEN lat < 3600 THEN 'lt_1h'
         WHEN lat < 21600 THEN 'lt_6h'
         WHEN lat < 86400 THEN 'lt_1d'
         WHEN lat < 604800 THEN 'lt_7d'
         ELSE 'ge_7d' END
"""

LATENCY_ORACLE = f"""
    WITH fv AS (
        SELECT user_id, min(ts) AS vts FROM events
        WHERE event_type = 'view' GROUP BY 1
    ),
    fp AS (
        SELECT f.user_id,
               (epoch_us(min(e.ts)) - epoch_us(f.vts)) // 1000000 AS lat
        FROM fv f JOIN events e
          ON e.user_id = f.user_id
         AND e.event_type = 'purchase' AND e.ts >= f.vts
        GROUP BY f.user_id, f.vts
    )
    SELECT {LATENCY_BUCKETS_SQL} AS bucket,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(lat) AS BIGINT) AS min_latency_sec,
           CAST(max(lat) AS BIGINT) AS max_latency_sec,
           CAST(sum(lat) AS BIGINT) AS sum_latency_sec
    FROM fp GROUP BY 1
"""


def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-view→first-subsequent-purchase conversion latency in the
    fixed dashboard buckets (<1m, <10m, <1h, <6h, <1d, <7d, ≥7d):
    per-bucket user counts with exact integer-seconds min/max/sum.
    The bounded-bucket histogram is the scale-safe distribution
    report (a fixed output size at any user count) — exact global
    percentiles would need a full sort, and the bottom-k sketch lane
    already covers sampled quantiles.

    Plan: one min-agg for first views, one user-keyed join +
    min-agg for first subsequent purchases, one 7-row rollup.
    """
    ev = read_table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vts"))
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    fp = (
        fv.join(p, "user_id")
        .filter(F.col("pts") >= F.col("vts"))
        .groupBy("user_id", "vts")
        .agg(F.min("pts").alias("pts"))
        .select(
            F.expr(
                "(unix_micros(pts) - unix_micros(vts)) div 1000000"
            ).alias("lat")
        )
    )
    return fp.select(
        F.expr(LATENCY_BUCKETS_SQL).alias("bucket"), "lat"
    ).groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.min("lat").cast("long").alias("min_latency_sec"),
        F.max("lat").cast("long").alias("max_latency_sec"),
        F.sum("lat").cast("long").alias("sum_latency_sec"),
    )


# ---------------------------------------------------------------------------
# lakehouse_skipping_stats — manifest range-overlap clustering quality
# ---------------------------------------------------------------------------

SKIP_ORACLE = """
    WITH manifest AS (
        SELECT CAST(ts AS DATE) AS day,
               CAST(user_id % 16 AS BIGINT) AS bucket,
               CAST(min(event_id) AS BIGINT) AS mn,
               CAST(max(event_id) AS BIGINT) AS mx
        FROM events GROUP BY 1, 2
    ),
    ov AS (
        SELECT a.day,
               CAST(count(*) AS BIGINT) AS n_overlapping
        FROM manifest a JOIN manifest b
          ON a.day = b.day AND a.bucket < b.bucket
         AND a.mn <= b.mx AND b.mn <= a.mx
        GROUP BY 1
    ),
    files AS (
        SELECT day, CAST(count(*) AS BIGINT) AS n_files FROM manifest
        GROUP BY 1
    )
    SELECT f.day, f.n_files,
           CAST(f.n_files * (f.n_files - 1) // 2 AS BIGINT) AS n_pairs,
           CAST(coalesce(o.n_overlapping, 0) AS BIGINT) AS n_overlapping,
           CAST((1000000 * (f.n_files * (f.n_files - 1) // 2
                            - coalesce(o.n_overlapping, 0)))
                // greatest(f.n_files * (f.n_files - 1) // 2, 1)
                AS BIGINT) AS skipping_quality_micro
    FROM files f LEFT JOIN ov o ON o.day = f.day
"""


def lakehouse_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-clustering quality from the file manifest (the
    streaming_manifest_agree lane's stats, read back for layout
    decisions): per day-partition, how many of the
    files×(files−1)/2 pairs have OVERLAPPING [min, max] event_id
    ranges — an overlapping pair means a range query on event_id
    cannot skip either file. skipping_quality = fraction of
    non-overlapping pairs in micro (user-bucketed layout scores ~0 on
    interleaved ids — exactly the signal that says "z-order this
    table", the lakehouse_zorder gate's before picture).

    The overlap self-join runs WITHIN day over the manifest — ≤ 16
    files per partition by the writer's bucket count at any data
    size — so the audit is manifest-priced.
    """
    ev = read_table(spark, sf_dir, "events")
    manifest = ev.groupBy(
        F.to_date("ts").alias("day"),
        # dividend-sign %, NOT pmod: DuckDB's % takes the dividend's
        # sign, and the oracle buckets with user_id % 16 — the two
        # diverge for negative ids (ADVICE r12 low). Same convention
        # on both sides keeps the gate exact for ANY id domain.
        (F.col("user_id") % F.lit(16)).cast("long").alias("bucket"),
    ).agg(
        F.min("event_id").cast("long").alias("mn"),
        F.max("event_id").cast("long").alias("mx"),
    )
    manifest = manifest.localCheckpoint(eager=False)
    a = manifest.select(
        "day", F.col("bucket").alias("b_a"),
        F.col("mn").alias("mn_a"), F.col("mx").alias("mx_a"),
    )
    b = manifest.select(
        "day", F.col("bucket").alias("b_b"),
        F.col("mn").alias("mn_b"), F.col("mx").alias("mx_b"),
    )
    ov = (
        a.join(b, "day")
        .filter(
            (F.col("b_a") < F.col("b_b"))
            & (F.col("mn_a") <= F.col("mx_b"))
            & (F.col("mn_b") <= F.col("mx_a"))
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlapping"))
    )
    files = manifest.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_files")
    )
    return (
        files.join(ov, "day", "left")
        .select(
            "day",
            "n_files",
            F.expr("CAST(n_files * (n_files - 1) div 2 AS BIGINT)").alias(
                "n_pairs"
            ),
            F.coalesce("n_overlapping", F.lit(0))
            .cast("long")
            .alias("n_overlapping"),
        )
        .withColumn(
            "skipping_quality_micro",
            F.expr(
                "CAST((1000000 * (n_pairs - n_overlapping))"
                " div greatest(n_pairs, 1) AS BIGINT)"
            ),
        )
    )


# ---------------------------------------------------------------------------
# text_vocab_drift — snapshot-to-snapshot vocabulary drift report
# ---------------------------------------------------------------------------

DRIFT_MIN_COUNT = 5
DRIFT_TOP = 10

DRIFT_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split(trim(text), ' '),
                                  x -> x <> '')) AS token
        FROM documents WHERE text IS NOT NULL
    ),
    oldc AS (
        SELECT token, CAST(count(*) AS BIGINT) AS c_old FROM toks
        WHERE doc_id % 2 = 0 GROUP BY 1
    ),
    newc AS (
        SELECT token, CAST(count(*) AS BIGINT) AS c_new FROM toks
        WHERE doc_id % 2 = 1 GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS tot_old,
               CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS tot_new
        FROM toks
    ),
    joined AS (
        SELECT coalesce(o.token, n.token) AS token,
               coalesce(o.c_old, 0) AS c_old,
               coalesce(n.c_new, 0) AS c_new,
               (1000000000 * coalesce(o.c_old, 0)) // t.tot_old
                   AS rate_old_ppb,
               (1000000000 * coalesce(n.c_new, 0)) // t.tot_new
                   AS rate_new_ppb
        FROM oldc o FULL OUTER JOIN newc n ON o.token = n.token
        CROSS JOIN tot t
    ),
    classed AS (
        SELECT token, c_old, c_new,
               CASE WHEN c_old >= {DRIFT_MIN_COUNT}
                         AND c_new >= {DRIFT_MIN_COUNT} THEN 'drifted'
                    WHEN c_old = 0 AND c_new >= {DRIFT_MIN_COUNT}
                         THEN 'new'
                    WHEN c_new = 0 AND c_old >= {DRIFT_MIN_COUNT}
                         THEN 'dropped'
                    ELSE NULL END AS category,
               CASE WHEN c_old >= {DRIFT_MIN_COUNT}
                         AND c_new >= {DRIFT_MIN_COUNT}
                    THEN (1000000 * greatest(rate_old_ppb, rate_new_ppb))
                         // greatest(least(rate_old_ppb, rate_new_ppb), 1)
                    WHEN c_old = 0 THEN 1000000 * rate_new_ppb
                    ELSE 1000000 * rate_old_ppb END AS score
        FROM joined
    )
    SELECT category, token,
           CAST(c_old AS BIGINT) AS c_old,
           CAST(c_new AS BIGINT) AS c_new,
           CAST(score AS BIGINT) AS score,
           CAST(rk AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY category ORDER BY score DESC, token) AS rk
          FROM classed WHERE category IS NOT NULL)
    WHERE rk <= {DRIFT_TOP}
"""


def text_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift between corpus snapshots (doc_id parity as
    the old/new split, the dedup_snapshot_incremental convention):
    per category the top-{DRIFT_TOP} tokens — ``drifted`` (present in
    both halves at ≥ {DRIFT_MIN_COUNT}, ranked by the max/min ratio
    of ppb-normalized rates, integer cross-division — no float
    ratio), ``new`` and ``dropped`` (ranked by their one-sided
    rate). The report a tokenizer-refresh / distribution-shift
    review reads before retraining.

    The token-count dims are vocab-bounded; the two corpus totals
    are a 1-row aggregate broadcast (the quality_unigram_likelihood
    idiom); the rank window partitions by category over the
    vocab-bounded classed dim.
    """
    toks = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.trim("text"), " "), lambda x: x != F.lit("")
                )
            ).alias("token"),
        )
    )
    toks = toks.localCheckpoint(eager=False)
    oldc = (
        toks.filter(F.col("doc_id") % 2 == 0)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c_old"))
    )
    newc = (
        toks.filter(F.col("doc_id") % 2 == 1)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c_new"))
    )
    tot = toks.agg(
        F.sum(F.when(F.col("doc_id") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("tot_old"),
        F.sum(F.when(F.col("doc_id") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("tot_new"),
    )
    joined = (
        oldc.join(newc, "token", "full_outer")
        .crossJoin(F.broadcast(tot))
        .select(
            "token",
            F.coalesce("c_old", F.lit(0)).alias("c_old"),
            F.coalesce("c_new", F.lit(0)).alias("c_new"),
            F.expr(
                "(1000000000 * coalesce(c_old, 0)) div tot_old"
            ).alias("rate_old_ppb"),
            F.expr(
                "(1000000000 * coalesce(c_new, 0)) div tot_new"
            ).alias("rate_new_ppb"),
        )
    )
    both = (F.col("c_old") >= DRIFT_MIN_COUNT) & (
        F.col("c_new") >= DRIFT_MIN_COUNT
    )
    classed = joined.select(
        "token",
        "c_old",
        "c_new",
        F.when(both, F.lit("drifted"))
        .when(
            (F.col("c_old") == 0) & (F.col("c_new") >= DRIFT_MIN_COUNT),
            F.lit("new"),
        )
        .when(
            (F.col("c_new") == 0) & (F.col("c_old") >= DRIFT_MIN_COUNT),
            F.lit("dropped"),
        )
        .alias("category"),
        F.when(
            both,
            F.expr(
                "(1000000 * greatest(rate_old_ppb, rate_new_ppb))"
                " div greatest(least(rate_old_ppb, rate_new_ppb), 1)"
            ),
        )
        .when(F.col("c_old") == 0, 1000000 * F.col("rate_new_ppb"))
        .otherwise(1000000 * F.col("rate_old_ppb"))
        .alias("score"),
    ).filter(F.col("category").isNotNull())
    wr = Window.partitionBy("category").orderBy(
        F.desc("score"), F.asc("token")
    )
    return (
        classed.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= DRIFT_TOP)
        .select(
            "category", "token", "c_old", "c_new",
            F.col("score").cast("long").alias("score"), "rank",
        )
    )


# ---------------------------------------------------------------------------
# events_bot_detection — burst-rate traffic cleaning
# ---------------------------------------------------------------------------

BOT_BURST_PER_MIN = 10

BOT_ORACLE = f"""
    WITH permin AS (
        SELECT user_id, date_trunc('minute', ts) AS minute,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    peruser AS (
        SELECT user_id,
               CAST(sum(c) AS BIGINT) AS n_events,
               CAST(max(c) AS BIGINT) AS max_per_min,
               CAST(count(*) AS BIGINT) AS n_active_minutes
        FROM permin GROUP BY 1
    )
    SELECT max_per_min >= {BOT_BURST_PER_MIN} AS is_bot,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(sum(max_per_min) AS BIGINT) AS sum_max_per_min,
           CAST(max(max_per_min) AS BIGINT) AS peak_per_min,
           CAST(sum(n_active_minutes) AS BIGINT) AS n_active_minutes
    FROM peruser GROUP BY 1
"""


def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst-rate bot detection — the traffic-cleaning pass an events
    pipeline runs before any engagement data is trusted (or harvested
    for training): a user whose busiest minute carries ≥
    {BOT_BURST_PER_MIN} events is flagged, and the gate reports the
    two cohorts' volumes (users, events, burst mass, peak rate,
    active minutes). All integer counts.

    Plan: one (user, minute) count (map-side combined), one per-user
    rollup, one 2-row cohort aggregate — linear at any event volume,
    no windows.
    """
    ev = read_table(spark, sf_dir, "events")
    permin = ev.groupBy(
        "user_id", F.date_trunc("minute", F.col("ts")).alias("minute")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    peruser = permin.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.max("c").cast("long").alias("max_per_min"),
        F.count(F.lit(1)).cast("long").alias("n_active_minutes"),
    )
    return peruser.groupBy(
        (F.col("max_per_min") >= BOT_BURST_PER_MIN).alias("is_bot")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("max_per_min").cast("long").alias("sum_max_per_min"),
        F.max("max_per_min").cast("long").alias("peak_per_min"),
        F.sum("n_active_minutes").cast("long").alias("n_active_minutes"),
    )


# ---------------------------------------------------------------------------
# text_encoding_anomalies — mojibake / control-character corpus QA
# ---------------------------------------------------------------------------

ENC_ORACLE = r"""
    WITH scored AS (
        SELECT source,
               CAST(len(regexp_extract_all(text, '\x{FFFD}')) AS BIGINT)
                   AS n_replacement,
               CAST(len(regexp_extract_all(text,
                        '[\x01-\x08\x0b\x0c\x0e-\x1f]')) AS BIGINT)
                   AS n_control,
               CAST(len(regexp_extract_all(text,
                        '[\x{00C2}-\x{00C3}][\x{0080}-\x{00BF}]'))
                   AS BIGINT) AS n_mojibake_pairs,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents WHERE text IS NOT NULL
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_replacement + n_control
                         + n_mojibake_pairs > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_flagged,
           CAST(sum(n_replacement) AS BIGINT) AS n_replacement,
           CAST(sum(n_control) AS BIGINT) AS n_control,
           CAST(sum(n_mojibake_pairs) AS BIGINT) AS n_mojibake_pairs,
           CAST((1000000 * sum(n_replacement + n_control
                               + n_mojibake_pairs))
                // greatest(sum(n_chars), 1) AS BIGINT)
               AS anomaly_rate_micro
    FROM scored GROUP BY 1
"""


def text_encoding_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-anomaly corpus QA per source: U+FFFD replacement
    characters (a decoder already gave up), C0 control characters
    (excluding tab/newlines — binary junk in "text"), and the
    classic UTF-8-read-as-Latin-1 mojibake signature (Â/Ã followed by
    a continuation-range codepoint). Per source: doc counts, flagged
    docs, per-class totals, and the anomaly rate per character in
    micro — the signal that says a source's extraction pipeline is
    broken before its text poisons a training mix.

    Map-only regexp counting + one hash-agg; linear at any corpus
    size. Regex classes are pure codepoint ranges — engine-identical.
    """
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    n_repl = F.expr(
        "size(regexp_extract_all(text, '\\ufffd', 0))"
    ).cast("long")
    # \uXXXX (not \xNN): Spark SQL string literals unescape \u to the
    # literal codepoint, while an unrecognized \x silently drops the
    # backslash and turns the class into garbage (caught by the
    # sf0.001 oracle run on authoring day).
    n_ctrl = F.expr(
        "size(regexp_extract_all(text,"
        " '[\\u0001-\\u0008\\u000b\\u000c\\u000e-\\u001f]', 0))"
    ).cast("long")
    n_moji = F.expr(
        "size(regexp_extract_all(text,"
        " '[\\u00c2-\\u00c3][\\u0080-\\u00bf]', 0))"
    ).cast("long")
    scored = docs.select(
        "source",
        n_repl.alias("n_replacement"),
        n_ctrl.alias("n_control"),
        n_moji.alias("n_mojibake_pairs"),
        F.length("text").cast("long").alias("n_chars"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(
                F.col("n_replacement")
                + F.col("n_control")
                + F.col("n_mojibake_pairs")
                > 0,
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_docs_flagged"),
        F.sum("n_replacement").cast("long").alias("n_replacement"),
        F.sum("n_control").cast("long").alias("n_control"),
        F.sum("n_mojibake_pairs").cast("long").alias("n_mojibake_pairs"),
        F.expr(
            "CAST((1000000 * sum(n_replacement + n_control"
            " + n_mojibake_pairs)) div greatest(sum(n_chars), 1)"
            " AS BIGINT)"
        ).alias("anomaly_rate_micro"),
    )


# name -> (query fn, oracle SQL): r14 registration day moves each
# entry into the @register loop verbatim.
R14_QUEUE = {
    "lakehouse_vacuum_plan": (lakehouse_vacuum_plan, VACUUM_ORACLE),
    "stats_theil_sen_trend": (stats_theil_sen_trend, TS_ORACLE),
    "embedding_binary_recall": (
        embedding_binary_recall,
        BIN_RECALL_ORACLE,
    ),
    "events_ab_srm": (events_ab_srm, SRM_ORACLE),
    "multimodal_png_walk": (multimodal_png_walk, PNG_ORACLE),
    "events_conversion_latency": (
        events_conversion_latency,
        LATENCY_ORACLE,
    ),
    "lakehouse_skipping_stats": (
        lakehouse_skipping_stats,
        SKIP_ORACLE,
    ),
    "text_vocab_drift": (text_vocab_drift, DRIFT_ORACLE),
    "events_bot_detection": (events_bot_detection, BOT_ORACLE),
    "text_encoding_anomalies": (
        text_encoding_anomalies,
        ENC_ORACLE,
    ),
}


# ---------------------------------------------------------------------------
# r14 registration: publish every queue entry into the driver-facing
# registry (the r10/r11/r12/r13 pattern — looping over R14_QUEUE keeps
# the queue dict, which tests/test_r14_queue.py verifies against the
# DuckDB oracles, and the registry surface mechanically identical).
# ---------------------------------------------------------------------------
from ..registry import register  # noqa: E402

for _name, (_fn, _oracle) in R14_QUEUE.items():
    register(_name, _oracle)(_fn)
