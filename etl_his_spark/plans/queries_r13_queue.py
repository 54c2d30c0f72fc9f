"""Round-13 gate queue — complete (fn, oracle) pairs, UNregistered.

Round 12 registered the ten r12-queue gates, so this round's net-new
work waits here under the ≤10-additions-per-round cap, exactly like
``queries_r10_queue.py`` (written r9, registered r10),
``queries_r11_queue.py`` (written r10, registered r11) and
``queries_r12_queue.py`` (written r11, registered r12) did.
``R13_QUEUE`` maps name -> (query fn, DuckDB oracle);
``tests/test_r13_queue.py`` runs the REAL driver-style canonicalized
comparison over every entry each pytest run, so r13 registration day
is a decorator move, not new code.

The slate (why each earns a gate at 100 TB; the first four are the
r11 verdict's item-8 candidates):

- ``retrieval_rerank_eval`` — two-stage retrieval eval on the MRR
  truth set: the cheap shared-shingle first stage proposes top-20
  candidates, a rarity-weighted token-overlap scorer (the
  deterministic stand-in for a cross-encoder reranker — a pairwise
  function of BOTH texts, richer than the retrieval index) re-ranks
  them, and the gate reports best-rank + reciprocal rank micro for
  BOTH stages per query. The measured before/after a reranker rollout
  needs; rerank work is panel × 20 pairs, never corpus².
- ``ann_index_maintenance`` — incremental ANN index maintenance:
  assign the NEW batch (odd vec_ids) to the BASE index's centroids
  (even vec_ids, deterministic lowest-id init — the kmeans_assign
  convention) and report per-cell base/new counts, growth micro, and
  the needs-rebuild flag (growth ≥ 0.5). The decision table that
  tells an ingest pipeline when cell skew demands re-clustering,
  without re-indexing the corpus.
- ``multimodal_riff_walk`` — RIFF container chunk-index walk
  (dependency-free, the netpbm discipline): synthesize a VALID
  RIFF/WAVE container per doc with column expressions (three chunks,
  one with doc-varying odd sizes to exercise word-alignment padding),
  walk it with the real ``riff_chunks`` operator (mapInPandas byte
  arithmetic, metadata only — no payload decode), and hash-check
  against the analytically-stated chunk table. The census an ingest
  pipeline runs before deciding what to decode at all.
- ``curation_contamination_attribution`` — per-(source, benchmark)
  contamination rollup: which corpus sources leak which benchmark
  (3-gram hash overlap, eval set = doc_id%97 split into three
  benchmarks by doc_id%3), with doc counts, gram-hit counts and the
  per-source contaminated share in micro. The attribution report that
  turns the per-doc decontamination probe into a data-sourcing
  decision.
- ``events_cusum_changepoint`` — CUSUM changepoint detection per
  event type over daily counts: cumulative sums of D·cᵢ − total
  (all-integer — the mean comparison cross-multiplied by the day
  count, no division), argmax |S| with earliest-day tie-break. The
  classic drift/changepoint monitor next to stats_ks_drift; windows
  run over the bounded day domain.
- ``graph_jaccard_neighbors`` — link prediction by neighbor-set
  Jaccard on the supplier↔customer trade graph via bottom-k sketches
  (md5-ordered, so deterministic): candidates through shared sketch
  elements only, per-pair work ≤ 2k, top-5 similar nodes per node.
  Two earlier designs were REPLACED on tri-scale evidence — a fixed
  hub cap emptied at sf0.1, and the exact postings join measured
  α = 0.72 (Σ deg² densification) — the sketch join is the design
  that survives a graph that densifies.
- ``text_keyword_rake`` — RAKE-style keyword extraction per source:
  stopword-delimited candidate phrases (≤ 4 words), per-source word
  degree/frequency stats over phrase occurrences, phrase score =
  Σ floor(1e6·deg(w)/freq(w)) over its word positions, top-10
  phrases per source. All-integer scoring.
- ``training_tokenizer_fertility`` — tokens-per-whitespace-word and
  chars-per-token per (lang, source) with the repo's BPE-ish regex
  token count vs the whitespace baseline: the corpus-balance signal
  (fertility) every multilingual tokenizer decision reads. Map-only
  + one hash-agg.
- ``embedding_matryoshka_eval`` — truncated-prefix retrieval eval:
  within sign-LSH cells, top-3 by 16-dim-prefix integer dot vs top-3
  by full 64-dim dot (the matryoshka question: how much recall does
  a 4× cheaper prefix keep?); per-cell recall in micro. Pair rows are
  computed ONCE carrying both dots; in-cell pairs only, never
  corpus².
- ``streaming_manifest_agree`` — the eleventh live streaming lane:
  a lakehouse FILE-MANIFEST (per (day, bucket): row count, byte
  proxy, min/max event_id — the file-skipping stats) maintained by
  foreachBatch merges of the (sum, sum, min, max) monoid vector,
  hash-equal to the batch manifest under the same oracle. CONTRAST
  with the bottom-k lane documented in the docstring: this monoid is
  commutative but NOT idempotent, so replay protection comes from the
  checkpoint offsets log (exactly-once within an availableNow run),
  not from the algebra.

Every score is integer or fixed-point micro-units; every hash is the
repo's 60-bit md5 — both engines run bit-identical arithmetic, so the
gates are hash-exact, not approximately equal.

Registration-day checklist for r13 (the r10-r12-queue pattern): move
each entry into ``@register`` (the loop), add the names to bench.py
HEADLINE and the registry _CHECK_FIRST window (after the thirty-nine
queued r7-last leaders at positions 51-89 of the r12 window — more
leaders than slots, so split across r13/r14 windows oldest-first),
and re-measure audit allowlist entries at sf0.001. Predicted on
authoring-day measurements (verify on registration day):
- ``tools/audit_plans.py`` SINGLE_PARTITION_ALLOW / CROSS_JOIN_ALLOW:
  none expected — every rank window here partitions by
  query/source/vec/cell/node/pair keys and no gate broadcasts a
  scalar subquery.
- ``tools/audit_scans.py`` ALLOW: ``retrieval_rerank_eval``
  ("documents" — shingle pin + token lanes; measure),
  ``curation_contamination_attribution`` ("documents" — gram lane +
  source totals; measure).

Tri-scale proof: R13_QUEUE_SCALE.json (authored same-day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Finish the registry's plan-module import chain first (same
# circular-import note as queries_r11_queue / queries_r12_queue).
from .. import registry as _registry  # noqa: F401

from ..functions.text import _STOPWORDS_EN, token_count, word_token_count
from ..operators.dedup_approx import seeded_hash60, shingle_rows, word_shingles
from ..sources.readers import read_table

# ---------------------------------------------------------------------------
# retrieval_rerank_eval — two-stage retrieval eval on the near-dup truth set
# ---------------------------------------------------------------------------

RERANK_STAGE1_TOP = 20

RERANK_ORACLE = f"""
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
        SELECT q.query_id, s.doc_id AS cand_id, count(*) AS score1
        FROM queries q
        JOIN sh qs ON qs.doc_id = q.query_id
        JOIN sh s ON s.shingle = qs.shingle AND s.doc_id <> q.query_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT query_id, cand_id, rank1
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY score1 DESC, cand_id) AS rank1
              FROM scored)
        WHERE rank1 <= {RERANK_STAGE1_TOP}
    ),
    tok AS (
        SELECT DISTINCT doc_id,
               CAST('0x' || substr(md5(t), 1, 15) AS BIGINT) AS tok
        FROM (SELECT doc_id,
                     unnest(list_filter(string_split(trim(text), ' '),
                                        x -> x <> '')) AS t
              FROM documents WHERE text IS NOT NULL)
    ),
    dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tok GROUP BY 1),
    overlap AS (
        SELECT p.query_id, p.cand_id,
               SUM(1000000 // d.df) AS score2
        FROM pairs p
        JOIN tok qt ON qt.doc_id = p.query_id
        JOIN tok ct ON ct.doc_id = p.cand_id AND ct.tok = qt.tok
        JOIN dfreq d ON d.tok = qt.tok
        GROUP BY 1, 2
    ),
    rerank AS (
        SELECT p.query_id, p.cand_id, p.rank1,
               row_number() OVER (
                   PARTITION BY p.query_id
                   ORDER BY coalesce(o.score2, 0) DESC, p.cand_id) AS rank2
        FROM pairs p
        LEFT JOIN overlap o ON o.query_id = p.query_id
                           AND o.cand_id = p.cand_id
    )
    SELECT t.query_id,
           CAST(count(DISTINCT t.target_id) AS BIGINT) AS n_targets,
           CAST(coalesce(min(r.rank1), 0) AS BIGINT) AS best_rank1,
           CAST(CASE WHEN min(r.rank1) IS NOT NULL
                THEN 1000000 // min(r.rank1) ELSE 0 END AS BIGINT)
               AS rr1_micro,
           CAST(coalesce(min(r.rank2), 0) AS BIGINT) AS best_rank2,
           CAST(CASE WHEN min(r.rank2) IS NOT NULL
                THEN 1000000 // min(r.rank2) ELSE 0 END AS BIGINT)
               AS rr2_micro
    FROM truth t
    LEFT JOIN rerank r ON r.query_id = t.query_id
                      AND r.cand_id = t.target_id
    GROUP BY 1
"""


def retrieval_rerank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval eval against the Jaccard-verified near-dup
    truth set (the retrieval_mrr_eval panel): stage 1 ranks all docs
    by shared-distinct-shingle count and keeps the top-20 per query;
    stage 2 re-ranks those 20 by a rarity-weighted token-overlap
    score Σ floor(1e6/df(t)) over shared distinct tokens — the
    deterministic stand-in for a cross-encoder reranker (a pairwise
    function of both documents, strictly richer than the index that
    proposed the candidates). Output per query: number of truth
    targets, best target rank and reciprocal-rank micro under BOTH
    stages (0 when no target survived stage 1 — the recall ceiling a
    reranker cannot fix, reported rather than hidden).

    Scale shape: the query panel is the verified near-dup doc set
    (bounded ≪ corpus); stage-1 scoring is a posting-list equi-join
    keyed on the panel's shingles; stage-2 work is |panel| × 20 pairs
    joined through distinct-token postings — never corpus². The df
    dimension is vocab-bounded.
    """
    docs = read_table(spark, sf_dir, "documents")
    sh = shingle_rows(docs).localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("a_id"), "shingle")
    b = sh.select(F.col("doc_id").alias("b_id"), "shingle")
    # inter feeds the truth derivation AND (symmetrized, below) the
    # stage-1 scoring — pin it so the posting-list self-join runs once
    # (r13; the same rewrite as retrieval_mrr_eval). SIZE ASSUMPTION
    # (ADVICE r13): pair-count-sized = every doc pair sharing ≥1
    # shingle — the full rationale and the 100 TB posting-cap caveat
    # are at retrieval_mrr_eval's identical pin
    # (queries_r12_queue.py).
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
            F.col("a_id").alias("query_id"),
            F.col("b_id").alias("target_id"),
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
    # Stage-1 score of (query, cand) — shared-distinct-shingle count —
    # is exactly inter's i for the unordered pair (both count over the
    # same distinct (doc_id, shingle) frame), so stage 1 needs NO
    # second posting-list join (r13: the previous qsh⋈sh join
    # recomputed every intersection the pair stage already counted).
    # queries is distinct, so the inner join is a pure filter.
    sym = inter.select(
        F.col("a_id").alias("query_id"),
        F.col("b_id").alias("cand_id"),
        F.col("i").alias("score1"),
    ).unionAll(
        inter.select(
            F.col("b_id").alias("query_id"),
            F.col("a_id").alias("cand_id"),
            F.col("i").alias("score1"),
        )
    )
    scored = sym.join(queries, "query_id")
    w1 = Window.partitionBy("query_id").orderBy(
        F.desc("score1"), F.asc("cand_id")
    )
    pairs = (
        scored.withColumn("rank1", F.row_number().over(w1))
        .filter(F.col("rank1") <= RERANK_STAGE1_TOP)
        .select("query_id", "cand_id", "rank1")
        .localCheckpoint(eager=False)
    )
    # distinct-token postings + document frequency (vocab-bounded dim)
    tok = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.explode(
                F.filter(
                    F.split(F.trim("text"), " "), lambda x: x != F.lit("")
                )
            ).alias("t"),
        )
        .select("doc_id", seeded_hash60(F.col("t")).alias("tok"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    dfreq = tok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    ctok = tok.select(
        F.col("doc_id").alias("c_did"), F.col("tok").alias("c_tok")
    )
    overlap = (
        pairs.join(
            tok.withColumnRenamed("doc_id", "query_id"), "query_id"
        )
        .join(
            ctok,
            (F.col("cand_id") == F.col("c_did"))
            & (F.col("tok") == F.col("c_tok")),
        )
        .join(dfreq, "tok")
        .groupBy("query_id", "cand_id")
        .agg(F.sum(F.expr("1000000 div df")).alias("score2"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc(F.coalesce(F.col("score2"), F.lit(0))), F.asc("cand_id")
    )
    rerank = (
        pairs.join(overlap, ["query_id", "cand_id"], "left")
        .withColumn("rank2", F.row_number().over(w2))
        .select(
            F.col("query_id").alias("r_qid"),
            F.col("cand_id").alias("r_cid"),
            "rank1",
            "rank2",
        )
    )
    joined = truth.join(
        rerank,
        (F.col("query_id") == F.col("r_qid"))
        & (F.col("target_id") == F.col("r_cid")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.countDistinct("target_id").cast("long").alias("n_targets"),
        F.coalesce(F.min("rank1"), F.lit(0)).cast("long").alias(
            "best_rank1"
        ),
        F.when(
            F.min("rank1").isNotNull(), F.expr("1000000 div min(rank1)")
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rr1_micro"),
        F.coalesce(F.min("rank2"), F.lit(0)).cast("long").alias(
            "best_rank2"
        ),
        F.when(
            F.min("rank2").isNotNull(), F.expr("1000000 div min(rank2)")
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("rr2_micro"),
    )


# ---------------------------------------------------------------------------
# ann_index_maintenance — new-batch cell assignment vs the base index
# ---------------------------------------------------------------------------

ANN_MAINT_K = 8

ANN_MAINT_ORACLE = f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    base AS (SELECT * FROM v WHERE vec_id % 2 = 0),
    newb AS (SELECT * FROM v WHERE vec_id % 2 = 1),
    cents AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster_id, e
        FROM (SELECT vec_id, e FROM base ORDER BY vec_id LIMIT {ANN_MAINT_K})
    ),
    db AS (
        SELECT v.vec_id, c.cluster_id,
               round(list_sum(list_transform(generate_series(1, len(v.e)),
                     i -> (v.e[i] - c.e[i]) * (v.e[i] - c.e[i]))), 6) AS d2
        FROM base v CROSS JOIN cents c
    ),
    dn AS (
        SELECT v.vec_id, c.cluster_id,
               round(list_sum(list_transform(generate_series(1, len(v.e)),
                     i -> (v.e[i] - c.e[i]) * (v.e[i] - c.e[i]))), 6) AS d2
        FROM newb v CROSS JOIN cents c
    ),
    ab AS (
        SELECT vec_id, cluster_id FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY d2, cluster_id) AS rk FROM db) WHERE rk = 1
    ),
    an AS (
        SELECT vec_id, cluster_id FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY d2, cluster_id) AS rk FROM dn) WHERE rk = 1
    ),
    cb AS (SELECT cluster_id, count(*) AS n_base FROM ab GROUP BY 1),
    cn AS (SELECT cluster_id, count(*) AS n_new FROM an GROUP BY 1)
    SELECT CAST(c.cluster_id AS INT) AS cluster_id,
           CAST(coalesce(cb.n_base, 0) AS BIGINT) AS n_base,
           CAST(coalesce(cn.n_new, 0) AS BIGINT) AS n_new,
           CAST((1000000 * coalesce(cn.n_new, 0))
                // greatest(coalesce(cb.n_base, 0), 1) AS BIGINT)
               AS growth_micro,
           (1000000 * coalesce(cn.n_new, 0))
               // greatest(coalesce(cb.n_base, 0), 1) >= 500000
               AS needs_rebuild
    FROM cents c
    LEFT JOIN cb ON cb.cluster_id = c.cluster_id
    LEFT JOIN cn ON cn.cluster_id = c.cluster_id
"""


def ann_index_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index maintenance: the NEW batch (odd vec_ids)
    is assigned to the BASE index's existing centroids (even vec_ids,
    deterministic lowest-id init — the kmeans_assign convention shared
    with embedding_kmeans_assign / ann_topk_ivf), and the gate reports
    per-cell base count, new count, growth in micro and the
    needs-rebuild flag (growth ≥ 0.5) — the decision table that tells
    an ingest pipeline when new data has skewed the cells enough to
    justify re-clustering, WITHOUT re-indexing the corpus.

    Both assignment passes are pure projections (centroids ride as
    k·d literals — see operators/clustering.py): zero joins, zero
    shuffles before the 8-row count aggregates. Linear at any batch
    size.
    """
    from ..functions.vector import to_double_array
    from ..operators.clustering import kmeans_assign

    vecs = read_table(spark, sf_dir, "embeddings")
    base = vecs.filter(F.col("vec_id") % 2 == 0)
    new = vecs.filter(F.col("vec_id") % 2 == 1)
    cents = [
        list(row["e"])
        for row in (
            base.select("vec_id", to_double_array("embedding").alias("e"))
            .orderBy("vec_id")
            .limit(ANN_MAINT_K)
            .collect()
        )
    ]
    cb = (
        kmeans_assign(base, k=ANN_MAINT_K, centroids=cents)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_base"))
    )
    cn = (
        kmeans_assign(new, k=ANN_MAINT_K, centroids=cents)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    )
    cells = spark.createDataFrame(
        [(i,) for i in range(len(cents))], "cluster_id int"
    )
    out = (
        cells.join(cb, "cluster_id", "left")
        .join(cn, "cluster_id", "left")
        .select(
            "cluster_id",
            F.coalesce("n_base", F.lit(0)).cast("long").alias("n_base"),
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        )
    )
    growth = F.expr("(1000000 * n_new) div greatest(n_base, 1)")
    return out.select(
        "cluster_id",
        "n_base",
        "n_new",
        growth.cast("long").alias("growth_micro"),
        (growth >= 500000).alias("needs_rebuild"),
    )


# ---------------------------------------------------------------------------
# multimodal_riff_walk — RIFF container chunk-index walk, analytic oracle
# ---------------------------------------------------------------------------

RIFF_ORACLE = """
    SELECT doc_id AS media_id, 'WAVE' AS form, 'fmt ' AS chunk_id,
           CAST(12 AS BIGINT) AS chunk_offset,
           CAST(16 AS BIGINT) AS chunk_size
    FROM documents
    UNION ALL
    SELECT doc_id, 'WAVE', 'note', CAST(36 AS BIGINT),
           CAST(doc_id % 5 AS BIGINT)
    FROM documents
    UNION ALL
    SELECT doc_id, 'WAVE', 'data',
           CAST(44 + (doc_id % 5) + ((doc_id % 5) % 2) AS BIGINT),
           CAST((doc_id % 64) + 1 AS BIGINT)
    FROM documents
"""


def multimodal_riff_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container-metadata walk under a hard oracle — no codec
    library (the netpbm/y4m/wav discipline, applied to the container
    INDEX rather than the payload).

    Spark-side: each doc becomes a VALID RIFF/WAVE container built
    with pure column expressions — 'RIFF' + LE32 size + 'WAVE', a
    16-byte fmt chunk, a 'note' chunk of doc-varying size doc_id % 5
    (sizes 1 and 3 exercise the word-alignment pad byte), and a data
    chunk of doc_id % 64 + 1 bytes — then walked by the real
    ``riff_chunks`` operator (mapInPandas byte arithmetic: magic
    check, LE32 sizes, aligned stepping; payloads never decoded).
    Because the container layout is known analytically, DuckDB states
    the expected chunk table exactly — a hash-verified end-to-end
    check of the encoder, the chunk walker, the alignment rule, and
    the 1:N fan-out contract. Per-asset work is O(#chunks), so the
    lane is metadata-priced at any corpus size.
    """
    from ..operators.multimodal import riff_chunks

    def le32(v_sql: str) -> str:
        return (
            f"concat(lpad(hex(({v_sql}) % 256), 2, '0'),"
            f" lpad(hex((({v_sql}) div 256) % 256), 2, '0'),"
            f" lpad(hex((({v_sql}) div 65536) % 256), 2, '0'),"
            f" lpad(hex((({v_sql}) div 16777216) % 256), 2, '0'))"
        )

    s2 = "(doc_id % 5)"
    dl = "((doc_id % 64) + 1)"
    riff_size = f"(44 + {s2} + ({s2} % 2) + {dl} + ({dl} % 2))"
    media_hex = (
        "concat('52494646', "  # RIFF
        + le32(riff_size)
        + ", '57415645'"  # WAVE
        + ", '666D7420', "  # 'fmt '
        + le32("16")
        + ", '0100010044AC00008858010002001000'"  # 16-byte fmt payload
        + f", '6E6F7465', {le32(s2)}, repeat('AB', {s2})"  # 'note'
        + f", CASE WHEN {s2} % 2 = 1 THEN '00' ELSE '' END"
        + f", '64617461', {le32(dl)},"  # 'data'
        + f" repeat(lpad(hex(doc_id % 256), 2, '0'), {dl})"
        + f", CASE WHEN {dl} % 2 = 1 THEN '00' ELSE '' END)"
    )
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.unhex(F.expr(media_hex)).alias("media_bytes"),
    )
    return riff_chunks(media)


# ---------------------------------------------------------------------------
# curation_contamination_attribution — per-(source, benchmark) rollup
# ---------------------------------------------------------------------------

CONTAM_ATTR_ORACLE = """
    WITH words AS (
        SELECT doc_id, source, string_split(trim(text), ' ') AS w
        FROM documents WHERE text IS NOT NULL
    ),
    grams AS (
        SELECT DISTINCT doc_id, source,
               CAST('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' '
                    || w[i+2]), 1, 15) AS BIGINT) AS gram
        FROM (SELECT doc_id, source, w,
                     unnest(range(1, len(w) - 1)) AS i
              FROM words WHERE len(w) >= 3)
    ),
    bench AS (
        SELECT DISTINCT 'bench_' || CAST(doc_id % 3 AS VARCHAR)
                   AS benchmark, gram
        FROM grams WHERE doc_id % 97 = 0
    ),
    corp AS (SELECT * FROM grams WHERE doc_id % 97 <> 0),
    hits AS (
        SELECT DISTINCT c.source, b.benchmark, c.doc_id, c.gram
        FROM corp c JOIN bench b ON c.gram = b.gram
    ),
    tot AS (
        SELECT source, count(*) AS n_src FROM documents
        WHERE text IS NOT NULL AND doc_id % 97 <> 0 GROUP BY 1
    )
    SELECT h.source, h.benchmark,
           CAST(count(DISTINCT h.doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_gram_hits,
           CAST((1000000 * count(DISTINCT h.doc_id)) // max(t.n_src)
                AS BIGINT) AS share_micro
    FROM hits h JOIN tot t ON t.source = h.source
    GROUP BY 1, 2
"""


def curation_contamination_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-(source, benchmark) contamination attribution: the eval
    set (doc_id % 97 == 0, split into three benchmarks by doc_id % 3)
    is compared by 3-gram hash overlap against every corpus source,
    and the rollup reports contaminated doc counts, distinct
    (doc, gram) hit counts and the contaminated share of each source
    in micro — the report that turns the per-doc decontamination
    probe (curation_contamination) into a data-SOURCING decision:
    which supplier leaks which benchmark, and how badly.

    Scale shape: the benchmark gram dim is eval-set-sized (broadcast
    at any corpus size); the corpus side is one distinct-gram explode
    + the postings equi-join; source totals are a source-bounded dim.
    """
    from ..operators.dedup_approx import spread_small_input

    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    # spread (r14, guide §2.5): the shingle explode + md5 ahead of the
    # distinct is this query's whole map cost and a single-file corpus
    # scan runs it on ONE core; one consumer chain before the pin, so
    # the spread shuffle is paid once (the coverage-curve profile, not
    # the trigram-backoff one). `tot` stays on the raw scan — its
    # count agg is too cheap to repay a second repartition.
    # inputFiles-gated: no-op at cluster scale.
    grams = (
        spread_small_input(docs)
        .select(
            "doc_id",
            "source",
            F.explode(word_shingles("text")).alias("g"),
        )
        .select(
            "doc_id", "source", seeded_hash60(F.col("g")).alias("gram")
        )
        .distinct()
    )
    grams = grams.localCheckpoint(eager=False)
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0)
        .select(
            F.concat(
                F.lit("bench_"), (F.col("doc_id") % 3).cast("string")
            ).alias("benchmark"),
            "gram",
        )
        .distinct()
    )
    corp = grams.filter(F.col("doc_id") % 97 != 0)
    hits = (
        corp.join(F.broadcast(bench), "gram")
        .select("source", "benchmark", "doc_id", "gram")
        .distinct()
    )
    tot = (
        docs.filter(F.col("doc_id") % 97 != 0)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_src"))
    )
    return (
        hits.join(tot, "source")
        .groupBy("source", "benchmark")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_gram_hits"),
            F.expr(
                "CAST((1000000 * count(DISTINCT doc_id)) div max(n_src)"
                " AS BIGINT)"
            ).alias("share_micro"),
        )
    )


# ---------------------------------------------------------------------------
# events_cusum_changepoint — integer CUSUM drift detection per event type
# ---------------------------------------------------------------------------

CUSUM_ORACLE = """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS d,
               CAST(sum(c) AS BIGINT) AS total
        FROM daily GROUP BY 1
    ),
    cu AS (
        SELECT d.event_type, d.day,
               SUM(t.d * d.c - t.total) OVER (
                   PARTITION BY d.event_type ORDER BY d.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS s
        FROM daily d JOIN tot t USING (event_type)
    ),
    mx AS (
        SELECT event_type, day, abs(s) AS a,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY abs(s) DESC, day) AS rk
        FROM cu
    )
    SELECT m.event_type,
           CAST(t.d AS BIGINT) AS n_days,
           CAST(t.total AS BIGINT) AS total,
           CAST(m.a AS BIGINT) AS cusum_max_abs,
           m.day AS changepoint_day
    FROM mx m JOIN tot t USING (event_type) WHERE m.rk = 1
"""


def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type over daily counts:
    Sᵢ = Σ_{j≤i} (D·cⱼ − total) — the classic mean-shift statistic
    with the per-day deviation cross-multiplied by the day count D so
    everything stays integer (no mean division crosses the engine
    boundary) — and the changepoint is the day maximizing |S|
    (earliest-day tie-break). The monitoring primitive that localizes
    WHEN a metric drifted, next to stats_ks_drift's did-it-drift.

    Plan: one (type, day) count shuffle; the cumulative and argmax
    windows run over the DAY-BOUNDED per-type daily table (≤ days
    rows per type at any corpus size — the stats_ks_drift bounded-
    window argument).
    """
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("d"),
        F.sum("c").cast("long").alias("total"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cu = (
        daily.join(tot, "event_type")
        .withColumn(
            "s", F.sum(F.col("d") * F.col("c") - F.col("total")).over(wcum)
        )
    )
    wmax = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("s"))), F.asc("day")
    )
    return (
        cu.withColumn("rk", F.row_number().over(wmax))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("d").cast("long").alias("n_days"),
            F.col("total").cast("long").alias("total"),
            F.abs(F.col("s")).cast("long").alias("cusum_max_abs"),
            F.col("day").alias("changepoint_day"),
        )
    )


# ---------------------------------------------------------------------------
# graph_jaccard_neighbors — hub-capped neighbor-set Jaccard link prediction
# ---------------------------------------------------------------------------

JACC_SKETCH_K = 128
JACC_CAND_MIN = 8  # candidate floor: shared sketch elements required
JACC_TOP = 5

JACC_ORACLE = f"""
    WITH base AS (
        SELECT DISTINCT l_suppkey AS s, o_custkey AS c
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    hashed AS (
        SELECT s, CAST('0x' || substr(md5(CAST(c AS VARCHAR)), 1, 15)
                       AS BIGINT) AS h
        FROM base
    ),
    sizes AS (SELECT s, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1),
    sk AS (
        SELECT s, h FROM (
            SELECT s, h, row_number() OVER (
                PARTITION BY s ORDER BY h) AS rk
            FROM hashed)
        WHERE rk <= {JACC_SKETCH_K}
    ),
    cand AS (
        SELECT a.s AS s_a, b.s AS s_b
        FROM sk a JOIN sk b ON a.h = b.h AND a.s < b.s
        GROUP BY 1, 2
        HAVING count(*) >= {JACC_CAND_MIN}
    ),
    melem AS (
        SELECT s_a, s_b, h, max(in_a) AS in_a, max(in_b) AS in_b
        FROM (
            SELECT c.s_a, c.s_b, k.h, 1 AS in_a, 0 AS in_b
            FROM cand c JOIN sk k ON k.s = c.s_a
            UNION ALL
            SELECT c.s_a, c.s_b, k.h, 0 AS in_a, 1 AS in_b
            FROM cand c JOIN sk k ON k.s = c.s_b
        )
        GROUP BY 1, 2, 3
    ),
    merged AS (
        SELECT s_a, s_b, h, in_a, in_b FROM (
            SELECT *, row_number() OVER (
                PARTITION BY s_a, s_b ORDER BY h) AS rk
            FROM melem)
        WHERE rk <= {JACC_SKETCH_K}
    ),
    est AS (
        SELECT s_a, s_b,
               CAST(sum(in_a * in_b) AS BIGINT) AS k_inter,
               CAST(count(*) AS BIGINT) AS k_merged
        FROM merged GROUP BY 1, 2
    ),
    sym AS (
        SELECT s_a AS s, s_b AS neighbor, k_inter, k_merged FROM est
        UNION ALL
        SELECT s_b AS s, s_a AS neighbor, k_inter, k_merged FROM est
    ),
    scored AS (
        SELECT y.s, y.neighbor, y.k_inter, y.k_merged,
               sa.n AS n_s, sb.n AS n_neighbor,
               CAST((1000000 * y.k_inter) // y.k_merged AS BIGINT)
                   AS jaccard_est_micro
        FROM sym y
        JOIN sizes sa ON sa.s = y.s
        JOIN sizes sb ON sb.s = y.neighbor
    )
    SELECT s, neighbor, k_inter, k_merged, n_s, n_neighbor,
           jaccard_est_micro, CAST(rk AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY s
              ORDER BY jaccard_est_micro DESC, k_inter DESC, neighbor)
              AS rk
          FROM scored)
    WHERE rk <= {JACC_TOP}
"""


def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighbor-set Jaccard on the supplier side of
    the supplier<->customer trade graph, via bottom-k SKETCHES — the
    big-graph similarity-join technique: each supplier's customer set
    is reduced to its {JACC_SKETCH_K} smallest 60-bit md5 hashes,
    candidate pairs are generated ONLY through shared sketch elements,
    and Jaccard is estimated per pair as |sk(A) ∩ sk(B) ∩
    bottom-k(sk(A) ∪ sk(B))| / |bottom-k(sk(A) ∪ sk(B))| — the
    classic bottom-k estimator, DETERMINISTIC here because the sketch
    is md5-ordered (no RNG), so the gate stays hash-exact
    cross-engine. Candidates must share ≥ {JACC_CAND_MIN} sketch
    elements before the ≤2k-row merge stage runs (the LSH-style
    candidate floor: on a dense co-engagement graph nearly every pair
    shares SOME element, and without the floor the merge fan-out is
    |pairs|·2k — measured as the sf0.1 wall-time driver; pairs below
    ~{JACC_CAND_MIN}/{JACC_SKETCH_K} estimated Jaccard are not
    similarity candidates by construction). Exact set sizes ride
    along for reporting; output is each node's top-{JACC_TOP}
    most-similar nodes.

    Why sketches and not the exact postings join (the first design,
    replaced after its tri-scale run): exact pair generation through
    shared customers does Σ_c deg(c)² work, which DENSIFIES
    super-linearly on graphs whose edge count grows faster than the
    node count (measured α = 0.72 on the fixture; a fixed or
    percentile hub cap only trims the tail). Sketching self-limits
    instead: a customer enters a supplier's sketch with probability
    ~k/deg(s), so postings are ≤ k·|nodes| and candidate work shrinks
    as the graph densifies — per-pair work is ≤ 2k rows, flat at any
    scale.

    Plan: one distinct edge build, one per-node rank window
    (node-partitioned), one sketch-element equi-join for candidates,
    then per-pair bottom-k merge as ARRAY math on the candidate rows
    (each node's sketch collected once into a sorted ≤k array;
    merged = slice(sort(union), k), k_inter = |a ∩ b ∩ merged| — no
    fan-out join, no per-pair window), broadcast-able size dims, one
    per-node top-k window. No global windows, no cartesian joins.
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
            F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    # Machinery factored to operators.graph.bottomk_neighbor_topk (r14,
    # verbatim move — the r13 array-math merge stage and est/sk pins
    # unchanged; the module docstring keeps the full merge-stage A/B
    # history) so the planted hot-node skew test exercises the same
    # code path.
    from ..operators.graph import bottomk_neighbor_topk

    return bottomk_neighbor_topk(
        base, JACC_SKETCH_K, JACC_CAND_MIN, JACC_TOP
    )


# ---------------------------------------------------------------------------
# text_keyword_rake — RAKE-style keyword extraction per source
# ---------------------------------------------------------------------------

RAKE_MAX_PHRASE = 4
RAKE_TOP = 10

_STOPLIST_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS_EN)

RAKE_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, source, i, lower(w[i]) AS t
        FROM (SELECT doc_id, source, w,
                     unnest(range(1, len(w) + 1)) AS i
              FROM (SELECT doc_id, source,
                           string_split(trim(text), ' ') AS w
                    FROM documents WHERE text IS NOT NULL))
        WHERE w[i] <> ''
    ),
    marked AS (
        SELECT *, CASE WHEN t IN ({_STOPLIST_SQL}) THEN 1 ELSE 0 END
                      AS is_stop
        FROM toks
    ),
    grp AS (
        SELECT *, SUM(is_stop) OVER (
                      PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                  ) AS g
        FROM marked
    ),
    phr AS (
        SELECT doc_id, source, g,
               string_agg(t, ' ' ORDER BY i) AS phrase,
               CAST(count(*) AS BIGINT) AS plen
        FROM grp WHERE is_stop = 0
        GROUP BY 1, 2, 3
        HAVING count(*) <= {RAKE_MAX_PHRASE}
    ),
    pw AS (
        SELECT source, phrase, plen,
               unnest(string_split(phrase, ' ')) AS word
        FROM phr
    ),
    ws AS (
        SELECT source, word, CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(plen) AS BIGINT) AS deg
        FROM pw GROUP BY 1, 2
    ),
    occ AS (
        SELECT source, phrase, CAST(count(*) AS BIGINT) AS n_occ
        FROM phr GROUP BY 1, 2
    ),
    scsum AS (
        SELECT p.source, p.phrase,
               SUM((1000000 * w.deg) // w.freq) AS ssum
        FROM pw p JOIN ws w ON w.source = p.source AND w.word = p.word
        GROUP BY 1, 2
    ),
    fin AS (
        SELECT o.source, o.phrase, o.n_occ,
               CAST(s.ssum // o.n_occ AS BIGINT) AS score_micro
        FROM occ o
        JOIN scsum s ON s.source = o.source AND s.phrase = o.phrase
    )
    SELECT source, phrase, n_occ, score_micro,
           CAST(rk AS BIGINT) AS rank
    FROM (SELECT *, row_number() OVER (
              PARTITION BY source
              ORDER BY score_micro DESC, phrase) AS rk
          FROM fin)
    WHERE rk <= {RAKE_TOP}
"""


def text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE-style keyword extraction per source: candidate phrases
    are maximal stopword-delimited runs of ≤ {RAKE_MAX_PHRASE} words
    (stopword list = functions.text._STOPWORDS_EN, shared with the
    langid heuristics); each word's degree (Σ length of phrases it
    occurs in) and frequency are aggregated per source over phrase
    occurrences; a phrase scores Σ floor(1e6·deg(w)/freq(w)) over its
    word positions (per-occurrence sums divide back exactly by the
    occurrence count — every occurrence of a phrase contributes the
    identical word-score sum); top-{RAKE_TOP} phrases per source by
    (score, phrase). All-integer scoring — hash-exact cross-engine.

    Plan: the phrase-grouping window runs per document (doc-bounded);
    word stats and the final rank window run over source-partitioned
    vocab/phrase dimensions (≪ corpus at any size). No pair joins.
    """
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    toks = (
        docs.select(
            "doc_id",
            "source",
            F.posexplode(F.split(F.trim("text"), " ")).alias("pos", "w"),
        )
        .filter(F.col("w") != "")
        .select(
            "doc_id",
            "source",
            (F.col("pos") + 1).alias("i"),
            F.lower("w").alias("t"),
        )
    )
    marked = toks.withColumn(
        "is_stop",
        F.when(F.col("t").isin(_STOPWORDS_EN), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    wg = (
        Window.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = marked.withColumn("g", F.sum("is_stop").over(wg))
    phr = (
        grp.filter(F.col("is_stop") == 0)
        .groupBy("doc_id", "source", "g")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("i", "t"))
                    ),
                    lambda x: x["t"],
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("plen"),
        )
        .filter(F.col("plen") <= RAKE_MAX_PHRASE)
        .localCheckpoint(eager=False)
    )
    pw = phr.select(
        "source", "phrase", "plen", F.explode(F.split("phrase", " ")).alias("word")
    )
    ws = pw.groupBy("source", "word").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("plen").cast("long").alias("deg"),
    )
    occ = phr.groupBy("source", "phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occ")
    )
    scsum = (
        pw.join(ws, ["source", "word"])
        .groupBy("source", "phrase")
        .agg(F.sum(F.expr("(1000000 * deg) div freq")).alias("ssum"))
    )
    fin = occ.join(scsum, ["source", "phrase"]).select(
        "source",
        "phrase",
        "n_occ",
        F.expr("CAST(ssum div n_occ AS BIGINT)").alias("score_micro"),
    )
    wr = Window.partitionBy("source").orderBy(
        F.desc("score_micro"), F.asc("phrase")
    )
    return (
        fin.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= RAKE_TOP)
        .select("source", "phrase", "n_occ", "score_micro", "rank")
    )


# ---------------------------------------------------------------------------
# training_tokenizer_fertility — regex-vs-whitespace token fertility
# ---------------------------------------------------------------------------

FERTILITY_ORACLE = r"""
    WITH d AS (
        SELECT lang, source,
               CAST(length(text) AS BIGINT) AS nc,
               CAST(len(string_split_regex(trim(text), '\s+'))
                    AS BIGINT) AS ws,
               CAST(len(list_filter(
                        string_split_regex(trim(text), '[^A-Za-z0-9]+'),
                        x -> x <> ''))
                    + length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                    AS BIGINT) AS re_t
        FROM documents WHERE text IS NOT NULL AND trim(text) <> ''
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ws) AS BIGINT) AS ws_tokens,
           CAST(sum(re_t) AS BIGINT) AS re_tokens,
           CAST((1000000 * sum(re_t)) // sum(ws) AS BIGINT)
               AS fertility_micro,
           CAST((1000000 * sum(nc)) // greatest(sum(re_t), 1) AS BIGINT)
               AS chars_per_token_micro
    FROM d GROUP BY 1, 2
"""


def training_tokenizer_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer fertility per (lang, source): the repo's BPE-ish
    regex token count (functions.text.word_token_count — alphanumeric
    runs + punctuation characters, the cheap subword proxy) against
    the whitespace-word baseline (token_count), with chars-per-token.
    Fertility (tokens per word) is THE corpus-balance signal a
    multilingual tokenizer decision reads: a language whose fertility
    runs high gets fewer effective tokens per byte budget.

    Map-only scoring + one hash-agg; sums cross the engine boundary
    and the two ratios are integer div over positive sums — linear at
    any corpus size.
    """
    docs = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.trim("text") != "")
    )
    d = docs.select(
        "lang",
        "source",
        F.length("text").cast("long").alias("nc"),
        token_count("text").cast("long").alias("ws"),
        word_token_count("text").cast("long").alias("re_t"),
    )
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ws").cast("long").alias("ws_tokens"),
        F.sum("re_t").cast("long").alias("re_tokens"),
        F.expr("CAST((1000000 * sum(re_t)) div sum(ws) AS BIGINT)").alias(
            "fertility_micro"
        ),
        F.expr(
            "CAST((1000000 * sum(nc)) div greatest(sum(re_t), 1)"
            " AS BIGINT)"
        ).alias("chars_per_token_micro"),
    )


# ---------------------------------------------------------------------------
# embedding_matryoshka_eval — truncated-prefix retrieval recall in-cell
# ---------------------------------------------------------------------------

MATRYOSHKA_BITS = 8
MATRYOSHKA_PREFIX = 16
MATRYOSHKA_TOP = 3

_MAT_CELL_SQL = " + ".join(
    f"(CASE WHEN e[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
    for j in range(MATRYOSHKA_BITS)
)

MATRYOSHKA_ORACLE = f"""
    WITH vi AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
               list_transform(CAST(embedding AS DOUBLE[]),
                              x -> CAST(floor(x * 1000) AS BIGINT)) AS q
        FROM embeddings
    ),
    cells AS (
        SELECT vec_id, q, {_MAT_CELL_SQL} AS cell FROM vi
    ),
    pairs AS (
        SELECT a.cell, a.vec_id, b.vec_id AS nb,
               CAST(list_sum(list_transform(range(1, 65),
                    i -> a.q[i] * b.q[i])) AS BIGINT) AS dot_full,
               CAST(list_sum(list_transform(range(1, {MATRYOSHKA_PREFIX + 1}),
                    i -> a.q[i] * b.q[i])) AS BIGINT) AS dot_pre
        FROM cells a JOIN cells b
          ON a.cell = b.cell AND a.vec_id <> b.vec_id
    ),
    tr AS (
        SELECT cell, vec_id, nb FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY dot_full DESC, nb) AS rk FROM pairs)
        WHERE rk <= {MATRYOSHKA_TOP}
    ),
    ap AS (
        SELECT vec_id, nb FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY dot_pre DESC, nb) AS rk FROM pairs)
        WHERE rk <= {MATRYOSHKA_TOP}
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


def embedding_matryoshka_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-prefix retrieval eval (the matryoshka question): how
    much of the full-dimension top-{MATRYOSHKA_TOP} does the
    {MATRYOSHKA_PREFIX}-dim PREFIX dot recover? Within each sign-LSH
    cell (the ann_knn_graph convention), every in-cell pair is scored
    ONCE carrying BOTH integer milli-quantized dots; truth = top-3 by
    full 64-dim dot, approx = top-3 by prefix dot; per-cell recall in
    micro. The measured basis for shipping a 4×-cheaper prefix index
    at 100 TB — the ann_recall_eval discipline applied to dimension
    truncation instead of cell probing.

    The cell equi-join bounds ALL pair work to within-cell pairs;
    dots are exact int64 — hash-exact cross-engine, no float
    summation-order hazard.
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
    for j in range(MATRYOSHKA_BITS):
        bit = F.when(
            F.element_at("e", j + 1) > 0, F.lit(1 << j)
        ).otherwise(F.lit(0))
        cell = bit if cell is None else cell + bit
    cells = vi.select("vec_id", "q", cell.alias("cell"))
    a = cells.select(
        "cell", "vec_id", F.col("q").alias("a_q")
    )
    b = cells.select(
        "cell", F.col("vec_id").alias("nb"), F.col("q").alias("b_q")
    )
    dot = lambda l, r: F.aggregate(  # noqa: E731
        F.zip_with(l, r, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("vec_id") != F.col("nb"))
        .select(
            "cell",
            "vec_id",
            "nb",
            dot(F.col("a_q"), F.col("b_q")).alias("dot_full"),
            dot(
                F.slice("a_q", 1, MATRYOSHKA_PREFIX),
                F.slice("b_q", 1, MATRYOSHKA_PREFIX),
            ).alias("dot_pre"),
        )
        .localCheckpoint(eager=False)
    )
    wf = Window.partitionBy("vec_id").orderBy(F.desc("dot_full"), F.asc("nb"))
    wp = Window.partitionBy("vec_id").orderBy(F.desc("dot_pre"), F.asc("nb"))
    tr = (
        pairs.withColumn("rk", F.row_number().over(wf))
        .filter(F.col("rk") <= MATRYOSHKA_TOP)
        .select("cell", "vec_id", "nb")
    )
    ap = (
        pairs.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= MATRYOSHKA_TOP)
        .select(
            F.col("vec_id").alias("a_vid"), F.col("nb").alias("a_nb")
        )
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
# streaming_manifest_agree — foreachBatch-maintained file manifest
# ---------------------------------------------------------------------------

MANIFEST_ORACLE = """
    SELECT CAST(ts AS DATE) AS day,
           CAST(user_id % 16 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(length(coalesce(props, '')) + 16) AS BIGINT)
               AS bytes_proxy,
           CAST(min(event_id) AS BIGINT) AS min_event_id,
           CAST(max(event_id) AS BIGINT) AS max_event_id
    FROM events GROUP BY 1, 2
"""


def _manifest_partial(ev: DataFrame) -> DataFrame:
    """Per-(day, bucket) manifest stats of one events frame — the
    (count, sum, min, max) monoid vector a lakehouse writer records
    per file for skipping (min/max) and compaction (rows/bytes)."""
    return ev.groupBy(
        F.to_date("ts").alias("day"),
        # dividend-sign %, NOT pmod: DuckDB's % takes the dividend's
        # sign, and the oracle buckets with user_id % 16 — the two
        # diverge for negative ids (ADVICE r12 low). Same convention
        # on both sides keeps the gate exact for ANY id domain.
        (F.col("user_id") % F.lit(16)).cast("long").alias("bucket"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.length(F.coalesce("props", F.lit(""))) + F.lit(16))
        .cast("long")
        .alias("bytes_proxy"),
        F.min("event_id").cast("long").alias("min_event_id"),
        F.max("event_id").cast("long").alias("max_event_id"),
    )


def _manifest_merge(store: DataFrame) -> DataFrame:
    """Fold a union of manifest partials back into one row per
    (day, bucket): sums add, min/max re-extremize — the commutative
    merge the monoid vector supports."""
    return store.groupBy("day", "bucket").agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("bytes_proxy").cast("long").alias("bytes_proxy"),
        F.min("min_event_id").cast("long").alias("min_event_id"),
        F.max("max_event_id").cast("long").alias("max_event_id"),
    )


def streaming_manifest_agree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A lakehouse FILE MANIFEST maintained by a REAL Structured
    Streaming run: each micro-batch computes its own per-(day, bucket)
    stats partial and foreachBatch folds it into the persisted store
    (store ← merge(store ∪ partial)) — the continuous bookkeeping
    every incremental lakehouse write keeps so compaction and
    file-skipping never re-scan data. The final store is hash-checked
    against the plain batch GROUP BY under the same oracle.

    Algebra contrast with the bottom-k lane (documented, not hidden):
    (sum, sum, min, max) is a COMMUTATIVE monoid — micro-batch layout
    cannot change the result — but NOT idempotent (a replayed batch
    would double the sums), so replay protection comes from the
    checkpoint offsets log (exactly-once within an availableNow run),
    not from the algebra itself. Per-batch merge work is
    manifest-sized (days × 16 rows), never data-sized.

    STREAM-EFFECTFUL: building this DataFrame runs the stream to
    completion (that is the point of the gate)."""
    import atexit
    import os
    import shutil
    import tempfile

    from .queries_streaming import _events_replay_dir, _stream_run_conf
    from ..streaming.events import stream_events

    replay = _events_replay_dir(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="manifest_rollup_gate_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    state = {"path": None, "v": 0}

    def _apply(batch: DataFrame, batch_id: int) -> None:
        partial = _manifest_partial(batch)
        if state["path"] is not None:
            prev = spark.read.parquet(state["path"])
            partial = _manifest_merge(prev.unionByName(partial))
        state["v"] += 1
        out = os.path.join(root, f"store_v{state['v']}")
        partial.write.mode("overwrite").parquet(out)
        state["path"] = out

    with _stream_run_conf(spark):
        q = (
            stream_events(spark, replay)
            .writeStream.foreachBatch(_apply)
            .option("checkpointLocation", os.path.join(root, "_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(state["path"]).select(
        "day", "bucket", "n_rows", "bytes_proxy",
        "min_event_id", "max_event_id",
    )


# name -> (query fn, oracle SQL): r13 registration day moves each
# entry into the @register loop verbatim.
R13_QUEUE = {
    "retrieval_rerank_eval": (retrieval_rerank_eval, RERANK_ORACLE),
    "ann_index_maintenance": (ann_index_maintenance, ANN_MAINT_ORACLE),
    "multimodal_riff_walk": (multimodal_riff_walk, RIFF_ORACLE),
    "curation_contamination_attribution": (
        curation_contamination_attribution,
        CONTAM_ATTR_ORACLE,
    ),
    "events_cusum_changepoint": (
        events_cusum_changepoint,
        CUSUM_ORACLE,
    ),
    "graph_jaccard_neighbors": (graph_jaccard_neighbors, JACC_ORACLE),
    "text_keyword_rake": (text_keyword_rake, RAKE_ORACLE),
    "training_tokenizer_fertility": (
        training_tokenizer_fertility,
        FERTILITY_ORACLE,
    ),
    "embedding_matryoshka_eval": (
        embedding_matryoshka_eval,
        MATRYOSHKA_ORACLE,
    ),
    "streaming_manifest_agree": (
        streaming_manifest_agree,
        MANIFEST_ORACLE,
    ),
}


# ---------------------------------------------------------------------------
# r13 registration: publish every queue entry into the driver-facing
# registry (the r10/r11/r12 pattern — looping over R13_QUEUE keeps the
# queue dict, which tests/test_r13_queue.py verifies against the
# DuckDB oracles, and the registry surface mechanically identical).
# ---------------------------------------------------------------------------
from ..registry import register  # noqa: E402

for _name, (_fn, _oracle) in R13_QUEUE.items():
    register(_name, _oracle)(_fn)
