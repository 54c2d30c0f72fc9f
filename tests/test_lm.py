"""LM-statistics query tests — recompute each score in pure Python
over the raw parquet and compare exactly (independent of the DuckDB
oracle, which the correctness gate already cross-checks)."""

from __future__ import annotations

import hashlib
from collections import Counter

import pyarrow.parquet as pq

from etl_his_spark.registry import QUERIES


def _docs(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    return [(r["doc_id"], r["text"]) for r in t if r["text"] is not None]


def _toks(text):
    return [w for w in text.strip().split(" ") if w != ""]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_script_detect_census_and_dominant(spark, sf_dir):
    out = {
        r["doc_id"]: r
        for r in QUERIES["text_script_detect"](spark, sf_dir).collect()
    }
    docs = dict(_docs(sf_dir))
    assert set(out) == {d for d, t in docs.items() if len(t) > 0}
    for doc_id, r in out.items():
        text = docs[doc_id]
        n_letter = sum(c.isascii() and c.isalpha() for c in text)
        n_digit = sum(c.isdigit() and c.isascii() for c in text)
        n_space = text.count(" ")
        n_punct = sum(c in ".,;:!?" for c in text)
        assert r["n_chars"] == len(text)
        assert r["n_letter"] == n_letter
        assert r["n_digit"] == n_digit
        assert r["n_space"] == n_space
        assert r["n_punct"] == n_punct
        assert r["n_other"] == len(text) - n_letter - n_digit - n_space - n_punct
        assert r["letter_ratio"] == n_letter / len(text)
        counts = {
            "letter": n_letter, "digit": n_digit, "space": n_space,
            "punct": n_punct, "other": r["n_other"],
        }
        # dominant = max count under the fixed precedence order
        order = ["letter", "digit", "space", "punct", "other"]
        best = max(order, key=lambda k: (counts[k], -order.index(k)))
        assert r["dominant_class"] == best


def test_unigram_likelihood_exact(spark, sf_dir):
    out = {
        r["doc_id"]: r
        for r in QUERIES["quality_unigram_likelihood"](spark, sf_dir).collect()
    }
    docs = _docs(sf_dir)
    cnt: Counter = Counter()
    for _, text in docs:
        cnt.update(_toks(text))
    big_n = sum(cnt.values())
    vocab_v = len(cnt)
    for doc_id, text in docs:
        toks = _toks(text)
        if not toks:
            assert doc_id not in out
            continue
        r = out[doc_id]
        sumc = sum(cnt[w] for w in toks)
        assert r["n_tokens"] == len(toks)
        assert r["sum_tok_freq"] == sumc
        assert r["mean_token_prob"] == (sumc + len(toks)) / (
            len(toks) * (big_n + vocab_v)
        )


def test_novel_ngrams_exact(spark, sf_dir):
    out = {
        r["doc_id"]: r
        for r in QUERIES["quality_novel_ngrams"](spark, sf_dir).collect()
    }
    docs = _docs(sf_dir)
    all_bg: Counter = Counter()
    per_doc = {}
    for doc_id, text in docs:
        toks = _toks(text)
        bgs = [_h60(f"{a} {b}") for a, b in zip(toks, toks[1:])]
        per_doc[doc_id] = bgs
        all_bg.update(bgs)
    for doc_id, bgs in per_doc.items():
        if not bgs:
            assert doc_id not in out
            continue
        r = out[doc_id]
        novel = sum(all_bg[b] == 1 for b in bgs)
        assert r["n_bigrams"] == len(bgs)
        assert r["n_novel"] == novel
        assert r["novel_frac"] == novel / len(bgs)
