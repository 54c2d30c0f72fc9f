"""Property pins for document chunking and the count-min sketch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_his_spark.operators.chunking import chunk_documents
from etl_his_spark.operators.sketches import (
    count_min_build,
    count_min_probe,
    merge_cms,
)
from etl_his_spark.sources.readers import read_table


def test_chunk_invariants(spark):
    """Coverage, overlap, and tail behavior on crafted lengths:
    n <= size -> one chunk; otherwise consecutive chunks share exactly
    `overlap` tokens and the union reproduces the document."""
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),   # < size: 1 chunk
            (2, " ".join(f"t{i}" for i in range(64))),   # == size: 1 chunk
            (3, " ".join(f"t{i}" for i in range(65))),   # size+1: 2 chunks
            (4, " ".join(f"t{i}" for i in range(200))),  # several
            (5, ""),                                     # empty: none
            (6, None),                                   # NULL: none
        ],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, size=64, overlap=16).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2, 3, 4}
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_chunk_tokens"] == 10
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_chunk_tokens"] == 64
    assert len(by_doc[3]) == 2
    for doc_id, n in ((3, 65), (4, 200)):
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        toks = [c["chunk_text"].split(" ") for c in chunks]
        # exact overlap between neighbors
        for a, b in zip(toks, toks[1:]):
            assert a[-16:] == b[:16]
        # stitched back together = the original token stream
        stitched = toks[0] + [t for chunk in toks[1:] for t in chunk[16:]]
        assert stitched == [f"t{i}" for i in range(n)]
        # chunk sizes: all full except possibly the last
        assert all(c["n_chunk_tokens"] == 64 for c in chunks[:-1])
        assert chunks[-1]["n_chunk_tokens"] == len(toks[-1])


def test_cms_overestimates_and_is_exact_without_collisions(spark, sf_dir):
    """est >= true for every key (one-sided error), and with width far
    above the distinct-key count the estimate is exactly the count."""
    events = read_table(spark, sf_dir, "events")
    keys = events.select(F.col("event_type").alias("k"))
    counters = count_min_build(keys, "k", width=8192)
    truth = keys.groupBy("k").agg(F.count(F.lit(1)).alias("true_n"))
    probed = count_min_probe(truth, counters, "k", width=8192).collect()
    assert probed
    for r in probed:
        assert r["est_n"] >= r["true_n"]
    # ~5 distinct event types over 8192 buckets x 4 rows: collisions
    # are impossible, the sketch degenerates to exact counting
    assert all(r["est_n"] == r["true_n"] for r in probed)


def test_cms_merge_equals_whole_stream_sketch(spark, sf_dir):
    """Monoid property: sketching two halves and merging == sketching
    the union (cell-for-cell)."""
    events = read_table(spark, sf_dir, "events")
    keys = events.select(F.col("event_type").alias("k"), "event_id")
    a = count_min_build(keys.filter(F.col("event_id") % 2 == 0), "k")
    b = count_min_build(keys.filter(F.col("event_id") % 2 == 1), "k")
    merged = {
        (r["seed"], r["bucket"]): r["cnt"] for r in merge_cms(a, b).collect()
    }
    whole = {
        (r["seed"], r["bucket"]): r["cnt"]
        for r in count_min_build(keys, "k").collect()
    }
    assert merged == whole


def test_cms_build_is_bounded(spark, sf_dir):
    """The counter table never exceeds depth x width cells regardless
    of stream size — the fixed-memory contract."""
    docs = read_table(spark, sf_dir, "documents")
    toks = docs.filter(F.col("text").isNotNull()).select(
        F.explode(F.split(F.trim("text"), " ")).alias("token")
    )
    counters = count_min_build(toks, "token", depth=2, width=64)
    assert counters.count() <= 2 * 64


def test_cms_probe_answers_for_unseen_keys(spark):
    """A key absent from the stream estimates >= 0 and NEVER vanishes
    from the probe output — the left-join contract (an inner join
    would silently drop keys whose cells were all untouched)."""
    stream = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    counters = count_min_build(stream, "k", depth=2, width=1024)
    probe = spark.createDataFrame(
        [("a",), ("never-seen-key",)], "k string"
    )
    got = {r["k"]: r["est_n"] for r in
           count_min_probe(probe, counters, "k", depth=2, width=1024).collect()}
    assert set(got) == {"a", "never-seen-key"}
    assert got["a"] >= 2
    assert got["never-seen-key"] == 0  # 1024 buckets, 2 keys: no collision


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Every key IN the set passes (no false negatives — the hard
    contract); keys outside pass at roughly the theoretical
    false-positive rate, bounded loosely here."""
    from etl_his_spark.operators.sketches import bloom_build, bloom_prefilter

    members = spark.range(0, 500).select(F.col("id").alias("k"))
    others = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    bits = bloom_build(members, "k")  # m=2^17, k=5, n=500 -> fp ~1e-8
    passed_members = bloom_prefilter(members, bits, "k").count()
    assert passed_members == 500
    fp = bloom_prefilter(others, bits, "k").count()
    assert fp <= 20  # theory says ~0; loose bound guards the wiring


def test_bloom_prefilter_keeps_duplicate_rows(spark):
    """The prefilter is a FILTER: duplicate input rows that pass
    survive independently (an implementation that grouped rows to
    count probe hits would silently dedupe)."""
    from etl_his_spark.operators.sketches import bloom_build, bloom_prefilter

    members = spark.createDataFrame([(7,)], "k long")
    big = spark.createDataFrame([(7, "x"), (7, "x"), (8, "y")], "k long, v string")
    bits = bloom_build(members, "k")
    rows = bloom_prefilter(big, bits, "k").collect()
    assert sorted((r["k"], r["v"]) for r in rows) == [(7, "x"), (7, "x")]


def test_bloom_merge_is_union(spark):
    """Bit-level monoid: bloom(A) ∪ bloom(B) == bloom(A ∪ B)."""
    from etl_his_spark.operators.sketches import bloom_build

    a = spark.range(0, 100).select(F.col("id").alias("k"))
    b = spark.range(50, 150).select(F.col("id").alias("k"))
    merged = set(
        r["bit"]
        for r in bloom_build(a, "k").union(bloom_build(b, "k")).distinct().collect()
    )
    whole = set(r["bit"] for r in bloom_build(a.union(b), "k").collect())
    assert merged == whole


def test_gram_matrix_partition_invariant(spark, sf_dir):
    """The Gram partials merge exactly: 1-partition and 16-partition
    computations produce IDENTICAL cells (integer arithmetic — no
    float accumulation order anywhere), and the matrix is symmetric
    with positive diagonal."""
    from etl_his_spark.operators.vector_numpy import gram_matrix_exact

    emb = read_table(spark, sf_dir, "embeddings")
    one = {
        (r["i"], r["j"]): r["gram_milli2"]
        for r in gram_matrix_exact(emb.coalesce(1)).collect()
    }
    many = {
        (r["i"], r["j"]): r["gram_milli2"]
        for r in gram_matrix_exact(emb.repartition(16)).collect()
    }
    assert one == many
    assert len(one) == 64 * 64
    assert all(one[(i, j)] == one[(j, i)] for i in range(64) for j in range(64))
    assert all(one[(i, i)] > 0 for i in range(64))


def test_pca_project_variance_ordering_and_shape(spark, sf_dir):
    """pc1 captures at least as much energy as pc2; projections are
    deterministic across repartitionings (the eigensolve consumes the
    EXACT gram, the projection is a literal-weight fold)."""
    from etl_his_spark.operators.vector_numpy import pca_project

    emb = read_table(spark, sf_dir, "embeddings")
    rows = pca_project(emb, k=2).collect()
    assert len(rows) == emb.count()
    import statistics

    e1 = statistics.mean(r["pc1"] ** 2 for r in rows)
    e2 = statistics.mean(r["pc2"] ** 2 for r in rows)
    assert e1 >= e2 > 0
    again = pca_project(emb.repartition(16), k=2).collect()
    assert {r["vec_id"]: (r["pc1"], r["pc2"]) for r in rows} == {
        r["vec_id"]: (r["pc1"], r["pc2"]) for r in again
    }


def test_count_min_weighted_build_cell_identical(spark):
    """count_min_build_weighted over a (key, count) table produces
    EXACTLY the cells of count_min_build over the expanded stream —
    the weighted build is the same sketch, minus the per-occurrence
    hashing."""
    from etl_his_spark.operators.sketches import count_min_build_weighted

    rows = [("a", 3), ("b", 1), ("c", 5), ("dd", 2)]
    stream = spark.createDataFrame(
        [(k,) for k, n in rows for _ in range(n)], "k string"
    )
    tf = spark.createDataFrame(rows, "k string, n long")
    plain = {
        (r["seed"], r["bucket"]): r["cnt"]
        for r in count_min_build(stream, "k", depth=3, width=64).collect()
    }
    weighted = {
        (r["seed"], r["bucket"]): r["cnt"]
        for r in count_min_build_weighted(
            tf, "k", "n", depth=3, width=64
        ).collect()
    }
    assert plain == weighted
    # probe through the weighted cells: estimate >= true count always
    est = {
        r["k"]: r["est_n"]
        for r in count_min_probe(
            tf, count_min_build_weighted(tf, "k", "n", depth=3, width=64),
            "k", depth=3, width=64,
        ).collect()
    }
    assert all(est[k] >= n for k, n in rows)


def test_content_defined_chunking_locality(spark, monkeypatch, tmp_path):
    """The CDC property the gate query's boundary rule exists for: an
    edit changes only its neighborhood's chunks. Duplicate-chunk
    accounting: two docs sharing their entire text mark every chunk
    duplicated; a unique doc marks none (given no cross-doc chunk
    collisions in this tiny fixture)."""
    from etl_his_spark.registry import ordered_queries

    corpus_chunk_dedup = ordered_queries()["corpus_chunk_dedup"]

    base = " ".join(f"w{i}" for i in range(400))
    docs = spark.createDataFrame(
        [
            (1, base, "en"),
            (2, base, "en"),          # full duplicate of 1
            (3, " ".join(f"u{i}" for i in range(100)), "en"),  # unique
        ],
        "doc_id long, text string, lang string",
    )
    out = tmp_path / "cdc"
    docs.write.parquet(str(out / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in corpus_chunk_dedup(spark, str(out)).collect()
    }
    assert got[1]["n_chunks"] == got[2]["n_chunks"] > 1
    assert got[1]["n_dup_chunks"] == got[1]["n_chunks"]
    assert got[2]["dup_micro"] == 1000000
    assert got[3]["n_dup_chunks"] == 0 and got[3]["dup_micro"] == 0


def test_exact_substring_spans_planted_overlap(spark, tmp_path):
    """ExactSubstr semantics: a 12-token phrase shared verbatim by two
    docs marks exactly those 12 tokens in each (5 overlapping 8-gram
    spans merge into one island); a phrase repeated WITHIN one doc is
    caught the same way; a fully unique doc reports zeros."""
    from etl_his_spark.registry import ordered_queries

    q = ordered_queries()["dedup_exact_substring_spans"]

    shared = " ".join(f"s{i}" for i in range(12))
    rep = " ".join(f"r{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"a{i}" for i in range(20)) + " " + shared, "en"),
            (2, shared + " " + " ".join(f"b{i}" for i in range(20)), "en"),
            (3, " ".join(f"u{i}" for i in range(30)), "en"),
            (
                4,
                rep
                + " "
                + " ".join(f"m{i}" for i in range(10))
                + " "
                + rep,
                "en",
            ),
        ],
        "doc_id long, text string, lang string",
    )
    out = tmp_path / "exsub"
    docs.write.parquet(str(out / "documents.parquet"))
    got = {r["doc_id"]: r for r in q(spark, str(out)).collect()}

    assert got[1]["n_dup_spans"] == 1 and got[1]["n_dup_tokens"] == 12
    assert got[2]["n_dup_spans"] == 1 and got[2]["n_dup_tokens"] == 12
    assert got[3]["n_dup_spans"] == 0 and got[3]["dup_cov_micro"] == 0
    # within-doc repeat: two disjoint 8-token islands
    assert got[4]["n_dup_spans"] == 2 and got[4]["n_dup_tokens"] == 16
    # coverage ratio is exact integer micro-units
    assert got[1]["dup_cov_micro"] == 12 * 1000000 // got[1]["n_tokens"]


def test_hll_registers_match_python_reference(spark):
    """Register table equals a brute-force Python HLL over the same
    md5 algebra — bucket split, leading-zero rank, per-bucket max."""
    import hashlib

    from etl_his_spark.operators.sketches import hll_registers

    keys = [f"key{i}" for i in range(500)]
    ref: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(k.encode()).hexdigest()[:15], 16)
        bucket, w = divmod(h, 1 << 51)
        rho = 52 if w == 0 else 52 - w.bit_length()
        ref[bucket] = max(ref.get(bucket, 0), rho)
    got = {
        r["bucket"]: r["register"]
        for r in hll_registers(
            spark.createDataFrame([(k,) for k in keys], "k string"), "k"
        ).collect()
    }
    assert got == ref


def test_hll_merge_equals_union_sketch(spark):
    from etl_his_spark.operators.sketches import hll_merge, hll_registers

    a = spark.createDataFrame([(f"a{i}",) for i in range(300)], "k string")
    b = spark.createDataFrame(
        [(f"a{i}",) for i in range(200, 400)] + [(f"b{i}",) for i in range(100)],
        "k string",
    )
    merged = {
        (r["bucket"], r["register"])
        for r in hll_merge(
            hll_registers(a, "k"), hll_registers(b, "k")
        ).collect()
    }
    union = {
        (r["bucket"], r["register"])
        for r in hll_registers(a.unionByName(b), "k").collect()
    }
    assert merged == union


def test_hll_estimate_accuracy(spark):
    """1.04/sqrt(512) ~ 4.6% standard error; assert within 3 sigma
    (14%) at three cardinalities spanning the linear-counting and
    harmonic regimes, and exact-ish duplicates-invariance."""
    from etl_his_spark.operators.sketches import hll_estimate, hll_registers

    for n in (100, 1000, 20000):
        df = spark.createDataFrame(
            [(f"u{i}",) for i in range(n)], "k string"
        )
        est = hll_estimate(hll_registers(df, "k"))
        assert abs(est - n) / n < 0.14, (n, est)
    # duplicates do not move the sketch
    dup = spark.createDataFrame(
        [(f"u{i % 50}",) for i in range(5000)], "k string"
    )
    uniq = spark.createDataFrame([(f"u{i}",) for i in range(50)], "k string")
    from etl_his_spark.operators.sketches import hll_registers as hr

    assert (
        {(r["bucket"], r["register"]) for r in hr(dup, "k").collect()}
        == {(r["bucket"], r["register"]) for r in hr(uniq, "k").collect()}
    )


# ---------------------------------------------------------------------------
# Property-based invariants (hypothesis) for the r9 text operators
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_PSETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=999),
        min_size=40, max_size=120, unique=True,
    ),
    ins_frac=st.floats(min_value=0.0, max_value=1.0),
)
@_PSETTINGS
def test_cdc_insertion_locality_property(spark, tmp_path_factory, ids, ins_frac):
    """The CDC property, driven through the REAL gate query: inserting
    ONE word re-chunks only its neighborhood, so a doc and its edited
    twin share all but <= 3 chunks (the chunk containing the edit may
    split; its neighbors are boundary-local and survive). Distinct
    words keep within-doc chunk repeats out of the accounting."""
    from etl_his_spark.registry import ordered_queries

    corpus_chunk_dedup = ordered_queries()["corpus_chunk_dedup"]

    words = [f"w{i}" for i in ids]
    p = int(ins_frac * len(words))
    edited = words[:p] + ["zINSERTED"] + words[p:]
    out = tmp_path_factory.mktemp("cdcprop")
    spark.createDataFrame(
        [(1, " ".join(words), "en"), (2, " ".join(edited), "en")],
        "doc_id long, text string, lang string",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in corpus_chunk_dedup(spark, str(out)).collect()
    }
    # all but <=3 of the original doc's chunks also appear in the twin
    assert got[1]["n_chunks"] - got[1]["n_dup_chunks"] <= 3
    assert got[2]["n_chunks"] - got[2]["n_dup_chunks"] <= 3


@given(
    docs=st.lists(
        st.lists(st.integers(min_value=0, max_value=30),
                 min_size=8, max_size=60),
        min_size=2, max_size=5,
    ),
)
@_PSETTINGS
def test_exactsubstr_cut_conservation_property(spark, docs):
    """Token conservation under ANY duplication pattern (the tiny
    shared vocabulary forces heavy 8-gram collisions): for every doc,
    n_tokens - n_removed == len(clean_text tokens), clean_text tokens
    are a subsequence of the original, and a doc never gains text."""
    from etl_his_spark.operators.exact_substring import exact_substring_cut

    rows = [(i, " ".join(f"v{t}" for t in toks)) for i, toks in enumerate(docs)]
    out = {
        r["doc_id"]: r
        for r in exact_substring_cut(
            spark.createDataFrame(rows, "doc_id long, text string"), k=8
        ).collect()
    }
    assert set(out) == set(range(len(docs)))
    for i, toks in enumerate(docs):
        orig = [f"v{t}" for t in toks]
        r = out[i]
        kept = r["clean_text"].split(" ") if r["clean_text"] else []
        assert r["n_tokens"] == len(orig)
        assert r["n_tokens"] - r["n_removed"] == len(kept)
        # kept tokens are a subsequence of the original
        it = iter(orig)
        assert all(any(k == o for o in it) for k in kept)


def test_hll_merge_grouped_keeps_groups(spark):
    """r9 ADVICE (low): merging sketches built with group_cols used to
    silently collapse every group into one global sketch. With
    group_cols the merge must group on (*group_cols, bucket); without
    it, an unexpected extra column must be a hard error."""
    import pytest as _pytest

    from etl_his_spark.operators.sketches import hll_merge, hll_registers

    df = spark.createDataFrame(
        [(f"k{i}", "g" + str(i % 2)) for i in range(400)],
        "k string, grp string",
    )
    grouped = hll_registers(df, "k", group_cols=["grp"])

    merged = {
        (r["grp"], r["bucket"], r["register"])
        for r in hll_merge(grouped, group_cols=["grp"]).collect()
    }
    direct = {
        (r["grp"], r["bucket"], r["register"])
        for r in grouped.collect()
    }
    assert merged == direct  # idempotent per group, groups preserved
    assert len({g for g, _, _ in merged}) == 2

    with _pytest.raises(ValueError, match="group_cols"):
        hll_merge(grouped)  # grp column present but undeclared


def test_simhash_lane_packed_overflow_guard(spark):
    """r9 ADVICE (low): the 16-bit SWAR lanes silently carried into
    the adjacent lane past 65,535 occurrences. The packed path must
    now raise on such documents; the overflow-free path must still
    work and the two paths must agree below the bound."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from etl_his_spark.operators.dedup_approx import simhash_signatures

    # "t1031" hashes with all top-lane bits (48-59) zero, so the SWAR
    # SUM itself stays within long range and the n > 65535 raise_error
    # guard is what fires (a doc of random tokens instead hits Spark's
    # ANSI ARITHMETIC_OVERFLOW inside the aggregate first — also loud,
    # also not silent corruption).
    big = spark.createDataFrame(
        [(1, "t1031 " * 70000)], "doc_id long, text string"
    )
    with _pytest.raises(Exception, match="lane_packed overflow") as ei:
        simhash_signatures(big).collect()
    assert isinstance(ei.value, Py4JJavaError) or "overflow" in str(ei.value)

    unpacked = simhash_signatures(big, lane_packed=False).collect()
    assert len(unpacked) == 1  # overflow-free path unaffected

    small = spark.createDataFrame(
        [(1, "a b c a b a"), (2, "x y z z y")], "doc_id long, text string"
    )
    packed = {r["doc_id"]: r["simhash"]
              for r in simhash_signatures(small).collect()}
    wide = {r["doc_id"]: r["simhash"]
            for r in simhash_signatures(small, lane_packed=False).collect()}
    assert packed == wide
