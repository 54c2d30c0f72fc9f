"""Property-based invariants (SURVEY.md §5.2 item 4) via hypothesis.

Spark round trips are expensive per example, so properties are checked
in batches: hypothesis generates a list of strings, one Spark job
checks the whole batch.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from etl_his_spark.functions.text import limpiar_nombres, nonempty, primer_nombre

TEXT = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)
        ),
        max_size=60,
    ),
)

BATCH = st.lists(TEXT, min_size=1, max_size=40)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "v string")


@given(BATCH)
@_SETTINGS
def test_limpiar_idempotent_property(spark, batch):
    df = _df(spark, batch)
    once = [r[0] for r in df.select(limpiar_nombres("v")).collect()]
    twice = [
        r[0]
        for r in _df(spark, once).select(limpiar_nombres("v")).collect()
    ]
    assert once == twice


@given(BATCH)
@_SETTINGS
def test_limpiar_no_double_spaces_property(spark, batch):
    df = _df(spark, batch)
    out = [r[0] for r in df.select(limpiar_nombres("v")).collect()]
    for v in out:
        if v is not None:
            assert "  " not in v
            # ASCII whitespace only: Java/RE2 \s (and the reference's
            # PHP '/\s+/' without /u) do not treat \xa0 etc. as space —
            # Python's unicode-aware strip() would be a stricter
            # contract than the one being reproduced.
            assert v == v.strip(" \t\n\r\x0b\x0c")


@given(BATCH)
@_SETTINGS
def test_primer_nombre_is_prefix_property(spark, batch):
    cleaned = [
        r[0]
        for r in _df(spark, batch).select(limpiar_nombres("v")).collect()
    ]
    firsts = [
        r[0]
        for r in _df(spark, cleaned).select(primer_nombre("v")).collect()
    ]
    for c, f in zip(cleaned, firsts):
        if c is None:
            assert f is None
        else:
            assert c.startswith(f)
            assert " " not in f


@given(BATCH)
@_SETTINGS
def test_nonempty_matches_python_semantics_property(spark, batch):
    df = _df(spark, batch)
    kept = [r[0] for r in df.filter(nonempty("v")).collect()]
    # Model Spark's trim exactly: it strips ONLY ASCII space (0x20) —
    # not \t/\n/\x1f/NBSP the way Python str.strip() does (pinned by
    # this test's hypothesis search, which found the divergence).
    expect = [v for v in batch if v is not None and v.strip(" ") != ""]
    assert sorted(kept, key=repr) == sorted(expect, key=repr)


WORD = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
DOC_WORDS = st.lists(WORD, min_size=0, max_size=20)


@given(DOC_WORDS, DOC_WORDS, st.text(alphabet="xyz", min_size=11, max_size=24))
@_SETTINGS
def test_winnow_shared_run_property(spark, words_a, words_b, shared):
    """Winnowing guarantee under random surroundings: planting the same
    ≥ k+w−1 = 11-char run into two otherwise random documents always
    yields at least one common fingerprint."""
    from etl_his_spark.functions.text import winnow_hashes, winnow_select

    doc_a = " ".join(words_a) + " " + shared
    doc_b = shared + " " + " ".join(words_b)
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    rows = (
        df.select("doc_id", winnow_hashes("text").alias("hs"))
        .select("doc_id", F.explode(winnow_select("hs")).alias("fp"))
        .collect()
    )
    fps = {1: set(), 2: set()}
    for r in rows:
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2]


# chunking invariants over arbitrary token counts and (size, overlap)
# configs — batched: one Spark job per generated batch
_CHUNK_CFG = st.tuples(
    st.integers(min_value=2, max_value=40),   # size
    st.integers(min_value=0, max_value=39),   # overlap (< size enforced below)
    st.lists(st.integers(min_value=0, max_value=120), min_size=1, max_size=12),
)


@given(_CHUNK_CFG)
@_SETTINGS
def test_chunk_documents_properties(spark, cfg):
    """For every (size, overlap, doc-length) combination: chunks cover
    the document exactly (stitching reproduces the token stream),
    consecutive chunks share exactly `overlap` tokens, every chunk is
    non-empty and ≤ size, and empty docs produce no chunks."""
    from etl_his_spark.operators.chunking import chunk_documents

    size, overlap, lengths = cfg
    if overlap >= size:
        overlap = size - 1
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(lengths)],
        "doc_id long, text string",
    )
    rows = chunk_documents(docs, size=size, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    stride = size - overlap
    for i, n in enumerate(lengths):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_id"])
        if n == 0:
            assert chunks == []
            continue
        toks = [c["chunk_text"].split(" ") for c in chunks]
        assert all(0 < len(t) <= size for t in toks)
        assert [len(t) for t in toks] == [c["n_chunk_tokens"] for c in chunks]
        for a, b in zip(toks, toks[1:]):
            assert a[-overlap:] == b[:overlap] if overlap else True
        stitched = toks[0] + [t for ch in toks[1:] for t in ch[overlap:]]
        assert stitched == [f"w{j}" for j in range(n)]
        # chunk starts advance by exactly stride
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        assert len(chunks) == max(1, -(-(n - overlap) // stride))


_CMS_STREAMS = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=3),
    min_size=1,
    max_size=60,
)


@given(_CMS_STREAMS)
@_SETTINGS
def test_cms_one_sided_error_property(spark, stream):
    """For ANY stream: est(k) >= true(k) for every key in it (the CMS
    contract cannot under-count, whatever the collisions)."""
    from collections import Counter

    from etl_his_spark.operators.sketches import (
        count_min_build,
        count_min_probe,
    )

    truth = Counter(stream)
    df = spark.createDataFrame([(s,) for s in stream], "k string")
    counters = count_min_build(df, "k", depth=2, width=16)  # tiny → collisions
    keys = spark.createDataFrame([(k,) for k in truth], "k string")
    probed = {r["k"]: r["est_n"] for r in
              count_min_probe(keys, counters, "k", depth=2, width=16).collect()}
    assert set(probed) == set(truth)
    for k, n in truth.items():
        assert probed[k] >= n


# ---------------------------------------------------------------------------
# BPE double-replace ≡ greedy left-to-right merge (operators/bpe.py)
# ---------------------------------------------------------------------------

SYMS = st.lists(
    st.sampled_from(["a", "b", "c", "ab", "bc"]), min_size=1, max_size=12
)
PAIR = st.sampled_from(["a b", "b a", "a a", "b c", "ab c"])


def _greedy_merge(symbols, pair):
    left, right = pair.split(" ")
    out, i = [], 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


@given(st.lists(st.tuples(SYMS, PAIR), min_size=1, max_size=25))
@_SETTINGS
def test_bpe_double_replace_equals_greedy(spark, cases):
    """The boundary-safe double replacement must equal greedy
    left-to-right non-overlapping merging on EVERY symbol string —
    including adjacent-occurrence chains (the single-replace bug)."""
    from etl_his_spark.operators.bpe import apply_merge

    # apply_merge takes one pair for the whole frame; group cases by pair
    by_pair = {}
    for i, (syms, pair) in enumerate(cases):
        by_pair.setdefault(pair, []).append((str(i), syms))
    for pair, items in by_pair.items():
        sub = spark.createDataFrame(
            [(w, 1, " " + " ".join(s) + " </w> ") for w, s in items],
            "word string, n long, sym string",
        )
        got = {r["word"]: r["sym"] for r in apply_merge(sub, pair).collect()}
        for w, syms in items:
            want = " " + " ".join(_greedy_merge(syms + ["</w>"], pair)) + " "
            assert got[w] == want, (syms, pair)
