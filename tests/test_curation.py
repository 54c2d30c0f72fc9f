"""Curation operators: contamination, repetition stats, PII redaction.

Semantics pinned on tiny literal frames (fast, no parquet); the
oracle-parity gate at corpus scale runs via tools/check_correctness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_his_spark.operators.curation import (
    contamination_hits,
    pii_scan,
    repetition_stats,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngrams_short_and_multispace(spark):
    df = spark.range(1).select(
        word_ngrams(F.lit("a  b c"), 2).alias("g2"),
        word_ngrams(F.lit("one"), 2).alias("short"),
        word_ngrams(F.lit("   "), 2).alias("blank"),
    )
    row = df.first()
    assert row.g2 == ["a b", "b c"]  # empty tokens dropped before gramming
    assert row.short == []
    assert row.blank == []


def test_contamination_hits_counts_distinct_shared_grams(spark):
    docs = _docs(
        spark,
        [
            (0, "x y z w"),          # benchmark doc (id % 97 == 0)
            (1, "x y z q"),          # shares "x y z"
            (2, "a b c d"),          # shares nothing
            (3, "x y z w q x y z w"),  # shares "x y z", "y z w", "x y z w"→3grams
        ],
    )
    out = {
        r.doc_id: r.n_hits
        for r in contamination_hits(docs, n=3, bench_modulus=97).collect()
    }
    assert out[1] == 1          # "x y z"
    assert out[3] == 2          # "x y z" and "y z w" (distinct grams)
    assert 2 not in out         # clean doc absent from the report


def test_repetition_stats_flags_repetitive_doc(spark):
    docs = _docs(
        spark,
        [
            (1, "spam spam spam spam"),
            # long enough that one 2-gram occurrence stays under the
            # 20% top2_frac threshold (short docs always trip it)
            (2, "the quick brown fox jumps over a lazy dog near riverbank today"),
        ],
    )
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    spammy, clean = rows[1], rows[2]
    assert spammy.total_words == 4 and spammy.distinct_words == 1
    assert spammy.dup_word_frac == 0.75
    assert spammy.top2_gram == "spam spam" and spammy.top2_cnt == 3
    assert spammy.flagged
    assert clean.dup_word_frac == 0.0 and not clean.flagged


def test_repetition_top2_tie_breaks_to_last_gram(spark):
    # "a b" and "b a" both occur twice → tie goes to lexically last.
    docs = _docs(spark, [(1, "a b a b a")])
    r = repetition_stats(docs).first()
    assert r.top2_cnt == 2
    assert r.top2_gram == "b a"


def test_pii_scan_redacts_both_lanes(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@mail.example.org or 123456789"),
            (2, "short 12345 digits stay"),
        ],
        "id long, blob string",
    )
    rows = {r.id: r for r in pii_scan(df, "id", "blob").collect()}
    assert rows[1].n_emails == 1 and rows[1].n_digit_runs == 1
    assert rows[1].redacted == "mail me at [EMAIL] or [NUM]"
    # 5-digit run is below the >=6 threshold
    assert rows[2].n_emails == 0 and rows[2].n_digit_runs == 0
    assert rows[2].redacted == "short 12345 digits stay"
