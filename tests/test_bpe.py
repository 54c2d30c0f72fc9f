"""BPE merge-induction tests: pure-Python reference implementation
compared exactly, plus the boundary-safe double-replace edge cases."""

from __future__ import annotations

from collections import Counter

import pyarrow.parquet as pq

from etl_his_spark.operators.bpe import apply_merge, bpe_merge_steps
from etl_his_spark.registry import QUERIES


def _ref_bpe(texts, k):
    """Reference BPE on the word-frequency table, greedy left-to-right
    merge application (the Sennrich convention)."""
    words = Counter()
    for t in texts:
        for w in t.strip().split(" "):
            if w:
                words[w] += 1
    syms = {w: list(w) + ["</w>"] for w in words}
    merges = []
    for step in range(1, k + 1):
        pairs = Counter()
        for w, ss in syms.items():
            for a, b in zip(ss, ss[1:]):
                pairs[f"{a} {b}"] += words[w]
        if not pairs:
            break
        # argmax by (count desc, pair string asc)
        pair, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, pair, pair.replace(" ", ""), cnt))
        left, right = pair.split(" ")
        for w, ss in syms.items():
            out, i = [], 0
            while i < len(ss):
                if i + 1 < len(ss) and ss[i] == left and ss[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(ss[i])
                    i += 1
            syms[w] = out
    return merges


def test_bpe_merges_match_reference(spark, sf_dir):
    texts = [
        r["text"]
        for r in pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
        if r["text"] is not None
    ]
    got = [
        (r["step"], r["pair"], r["new_symbol"], r["pair_count"])
        for r in QUERIES["training_bpe_merges"](spark, sf_dir)
        .orderBy("step")
        .collect()
    ]
    assert got == _ref_bpe(texts, 3)


def test_double_replace_handles_chains(spark):
    # 'ababab' → chars a b a b a b: merging (a,b) must produce ab ab ab,
    # exactly what greedy left-to-right BPE does — the single-replace
    # miss (ab a b ab) is the bug the double replacement exists for.
    df = spark.createDataFrame(
        [("ababab", 1, " a b a b a b </w> ")], "word string, n long, sym string"
    )
    out = apply_merge(df, "a b").first()["sym"]
    assert out == " ab ab ab </w> "
    # odd-length chain: b a b a b → b ab ab
    df2 = spark.createDataFrame(
        [("babab", 1, " b a b a b </w> ")], "word string, n long, sym string"
    )
    assert apply_merge(df2, "a b").first()["sym"] == " b ab ab </w> "


def test_bpe_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert bpe_merge_steps(df, k=2).count() == 0
