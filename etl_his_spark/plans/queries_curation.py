"""Corpus-curation gate queries: benchmark decontamination,
Gopher-style repetition stats, PII detection/redaction.

All exact-oracle. Float discipline per the repo rule: every floating
value is a single correctly-rounded IEEE operation on exact integers
(or 1.0 minus one), so Spark and DuckDB agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.curation import (
    DIGIT_RUN_RE,
    EMAIL_RE,
    contamination_hits,
    pii_scan,
    repetition_stats,
)
from ..registry import register
from ..sources.readers import read_table

# Shared oracle fragment: filtered token arrays per doc.
_TOKS_CTE = """
    toks AS (
        SELECT doc_id, length(trim(text)) AS n_chars_trim,
               list_filter(string_split(trim(text), ' '), x -> x <> '') AS ts
        FROM documents WHERE text IS NOT NULL
    )
"""


@register(
    "curation_contamination",
    f"""
    WITH {_TOKS_CTE},
    grams AS (
        SELECT doc_id,
               ('0x' || substr(md5(array_to_string(ts[i:i+2], ' ')), 1, 15))::BIGINT
                   AS gram_h
        FROM (SELECT doc_id, ts,
                     unnest(range(1, greatest(len(ts) - 1, 1))) AS i
              FROM toks) t
    ),
    bench AS (SELECT DISTINCT gram_h FROM grams WHERE doc_id % 97 = 0)
    SELECT g.doc_id, count(DISTINCT g.gram_h) AS n_hits
    FROM grams g JOIN bench b USING (gram_h)
    WHERE g.doc_id % 97 <> 0
    GROUP BY g.doc_id
    """,
)
def curation_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination probe: corpus docs sharing any word
    3-gram with the benchmark split (doc_id % 97 == 0 stands in for
    the eval set; production would use 13-grams — n is a parameter).

    Reference parity: this extends the reference's dedup/curation
    surface with the standard pre-training decontamination pass; no
    reference twin (training-data extension per the build brief).
    """
    return contamination_hits(
        read_table(spark, sf_dir, "documents"), n=3, bench_modulus=97
    )


@register(
    "curation_repetition",
    f"""
    WITH {_TOKS_CTE},
    base AS (
        SELECT doc_id, len(ts) AS total_words, len(list_distinct(ts))
                   AS distinct_words, n_chars_trim
        FROM toks WHERE len(ts) > 0
    ),
    g2 AS (
        SELECT doc_id, array_to_string(ts[i:i+1], ' ') AS gram
        FROM (SELECT doc_id, ts,
                     unnest(range(1, greatest(len(ts), 1))) AS i
              FROM toks) t
    ),
    cnts AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2),
    top AS (
        SELECT doc_id, gram, cnt,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, gram DESC) AS rn
        FROM cnts
    )
    SELECT b.doc_id,
           CAST(b.total_words AS BIGINT) AS total_words,
           CAST(b.distinct_words AS BIGINT) AS distinct_words,
           1.0 - CAST(b.distinct_words AS DOUBLE) / b.total_words
               AS dup_word_frac,
           coalesce(t.gram, '') AS top2_gram,
           CAST(coalesce(t.cnt, 0) AS BIGINT) AS top2_cnt,
           CAST(coalesce(t.cnt, 0) * coalesce(length(t.gram), 0) AS DOUBLE)
               / b.n_chars_trim AS top2_frac,
           (1.0 - CAST(b.distinct_words AS DOUBLE) / b.total_words) > 0.4
               OR (CAST(coalesce(t.cnt, 0) * coalesce(length(t.gram), 0)
                        AS DOUBLE) / b.n_chars_trim) > 0.2 AS flagged
    FROM base b LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (doc_id)
    """,
)
def curation_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition stats per document (dup-word fraction,
    top-2-gram character fraction, flag). Training-data extension."""
    return repetition_stats(read_table(spark, sf_dir, "documents"))


@register(
    "curation_pii_redact",
    f"""
    WITH contact AS (
        SELECT c_custkey,
               c_name || ' <c' || CAST(c_custkey AS VARCHAR)
                      || '@example.com>' AS blob
        FROM customer
    )
    SELECT c_custkey,
           CAST(len(regexp_extract_all(blob, '{EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(blob, '{DIGIT_RUN_RE}')) AS BIGINT)
               AS n_digit_runs,
           regexp_replace(
               regexp_replace(blob, '{EMAIL_RE}', '[EMAIL]', 'g'),
               '{DIGIT_RUN_RE}', '[NUM]', 'g') AS redacted
    FROM contact
    """,
)
def curation_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scan over a contact blob composed from customer columns
    (name carries a long digit run; a deterministic synthetic email
    exercises the email lane). Scan → project, no shuffle."""
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(
            F.col("c_name"),
            F.lit(" <c"),
            F.col("c_custkey").cast("string"),
            F.lit("@example.com>"),
        ).alias("blob"),
    )
    return pii_scan(c, "c_custkey", "blob")


# Shared oracle fragment: full repetition computation as CTEs ending in
# rep(doc_id, flagged) — reused by the per-source report below.
_REP_CTES = f"""
    {_TOKS_CTE},
    base AS (
        SELECT doc_id, len(ts) AS total_words, len(list_distinct(ts))
                   AS distinct_words, n_chars_trim
        FROM toks WHERE len(ts) > 0
    ),
    g2 AS (
        SELECT doc_id, array_to_string(ts[i:i+1], ' ') AS gram
        FROM (SELECT doc_id, ts,
                     unnest(range(1, greatest(len(ts), 1))) AS i
              FROM toks) t
    ),
    cnts AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2),
    top AS (
        SELECT doc_id, gram, cnt,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, gram DESC) AS rn
        FROM cnts
    ),
    rep AS (
        SELECT b.doc_id,
               b.total_words,
               (1.0 - CAST(b.distinct_words AS DOUBLE) / b.total_words) > 0.4
                   OR (CAST(coalesce(t.cnt, 0) * coalesce(length(t.gram), 0)
                            AS DOUBLE) / b.n_chars_trim) > 0.2 AS flagged
        FROM base b
        LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (doc_id)
    )
"""


@register(
    "curation_source_report",
    f"""
    WITH {_REP_CTES}
    SELECT d.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN r.flagged THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged,
           CAST(sum(CASE WHEN r.flagged THEN 1 ELSE 0 END) AS DOUBLE)
               / count(*) AS flag_rate,
           CAST(sum(r.total_words) AS BIGINT) AS total_tokens
    FROM rep r JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
)
def curation_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation dashboard: doc counts, repetition-flag rate
    (exact integer ratio), token totals — the roll-up a pipeline
    operator watches to spot a broken source. One doc-keyed join of
    the repetition stats back to the source dim, one grouped agg."""
    docs = read_table(spark, sf_dir, "documents")
    rep = repetition_stats(docs)
    return (
        rep.select("doc_id", "total_words", "flagged")
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("flagged").cast("long")).alias("n_flagged"),
            (
                F.sum(F.col("flagged").cast("long")).cast("double")
                / F.count(F.lit(1))
            ).alias("flag_rate"),
            F.sum("total_words").cast("long").alias("total_tokens"),
        )
    )


@register(
    "dedup_repeated_spans",
    f"""
    WITH {_TOKS_CTE},
    grams AS (
        SELECT doc_id, array_to_string(ts[i:i+4], ' ') AS gram
        FROM (SELECT doc_id, ts,
                     unnest(range(1, greatest(len(ts) - 3, 1))) AS i
              FROM toks) t
    )
    SELECT gram, count(*) AS n_occ,
           count(DISTINCT doc_id) AS n_docs
    FROM grams
    GROUP BY gram
    HAVING count(*) >= 2 AND count(DISTINCT doc_id) >= 2
    """,
)
def dedup_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated 5-token spans (exact substring-dedup
    detection pass). Training-data extension."""
    from ..operators.curation import repeated_spans

    return repeated_spans(
        read_table(spark, sf_dir, "documents"), n=5, min_occ=2, min_docs=2
    )
