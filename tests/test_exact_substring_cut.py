"""ExactSubstr cut operator (operators/exact_substring.py) — r10-gate
machinery, behavior pinned ahead of registration.

The detection half already has a registered tri-scale gate
(dedup_exact_substring_spans); these tests pin the CUT contract: the
aggressive all-occurrences removal policy, pass-through of short
docs, empty-text survival of fully-duplicated docs, and consistency
between the cut and the detection islands.
"""

from __future__ import annotations


from etl_his_spark.operators.exact_substring import (
    duplicated_islands,
    exact_substring_cut,
    shingle_fingerprints,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cut_removes_every_occurrence(spark):
    """Aggressive policy: the shared 12-token phrase is cut from BOTH
    docs; the unique flanks survive verbatim."""
    shared = " ".join(f"s{i}" for i in range(12))
    a_flank = " ".join(f"a{i}" for i in range(20))
    b_flank = " ".join(f"b{i}" for i in range(20))
    out = {
        r["doc_id"]: r
        for r in exact_substring_cut(
            _docs(
                spark,
                [(1, a_flank + " " + shared), (2, shared + " " + b_flank)],
            ),
            k=8,
        ).collect()
    }
    assert out[1]["clean_text"] == a_flank
    assert out[2]["clean_text"] == b_flank
    assert out[1]["n_removed"] == out[2]["n_removed"] == 12


def test_within_doc_repeat_cut_both_copies(spark):
    rep = " ".join(f"r{i}" for i in range(8))
    mid = " ".join(f"m{i}" for i in range(10))
    out = exact_substring_cut(
        _docs(spark, [(1, rep + " " + mid + " " + rep)]), k=8
    ).collect()[0]
    assert out["clean_text"] == mid
    assert out["n_removed"] == 16 and out["n_tokens"] == 26


def test_fully_duplicated_doc_survives_empty(spark):
    base = " ".join(f"x{i}" for i in range(30))
    out = {
        r["doc_id"]: r
        for r in exact_substring_cut(
            _docs(spark, [(1, base), (2, base)]), k=8
        ).collect()
    }
    assert out[1]["clean_text"] == "" and out[1]["n_removed"] == 30
    assert out[2]["clean_text"] == "" and out[2]["n_removed"] == 30


def test_short_docs_pass_through(spark):
    out = {
        r["doc_id"]: r
        for r in exact_substring_cut(
            _docs(spark, [(1, "only five tokens right here"), (2, "x")]),
            k=8,
        ).collect()
    }
    assert out[1]["clean_text"] == "only five tokens right here"
    assert out[1]["n_removed"] == 0 and out[1]["n_tokens"] == 5
    assert out[2]["clean_text"] == "x"


def test_cut_agrees_with_detection_islands(spark, sf_dir):
    """On real fixture docs: removed-token count per doc equals the
    detection gate's island coverage (the two halves share the island
    machinery but run through different final plans)."""
    from pyspark.sql import functions as F

    from etl_his_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents").limit(200)
    cut = {
        r["doc_id"]: r["n_removed"]
        for r in exact_substring_cut(docs, k=8).collect()
        if r["n_tokens"] >= 8
    }
    sh = shingle_fingerprints(docs, 8).localCheckpoint(eager=False)
    cov = {
        r["doc_id"]: r["covered"]
        for r in duplicated_islands(sh, 8)
        .groupBy("doc_id")
        .agg(F.sum(F.expr("m_end - m_start + 1")).alias("covered"))
        .collect()
    }
    for doc_id, n_removed in cut.items():
        assert n_removed == cov.get(doc_id, 0)


def test_clean_text_reshingles_clean(spark):
    """Idempotence-flavored invariant: after one cut pass over a
    two-doc corpus whose only duplication is the planted phrase, the
    cleaned texts contain no shared 8-gram (a second detection pass
    finds nothing cross-doc)."""
    shared = " ".join(f"s{i}" for i in range(15))
    d1 = " ".join(f"a{i}" for i in range(12)) + " " + shared
    d2 = shared + " " + " ".join(f"b{i}" for i in range(12))
    cleaned = exact_substring_cut(_docs(spark, [(1, d1), (2, d2)]), k=8)
    again = cleaned.selectExpr("doc_id", "clean_text as text")
    sh2 = shingle_fingerprints(again, 8)
    dup2 = (
        sh2.groupBy("fp").count().filter("count >= 2").count()
    )
    assert dup2 == 0
