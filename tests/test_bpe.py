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


def test_greedy_merge_handles_chains_and_self_pairs(spark):
    cases = [
        # alternating chains
        (" a b a b a b </w> ", "a b", " ab ab ab </w> "),
        (" b a b a b </w> ", "a b", " b ab ab </w> "),
        # SELF-pair runs — the case a left-to-right string replace
        # mis-groups (' a a a a a ' → 'aa a aa'); greedy pairs from
        # the left: 'aa aa a' (round-6 review finding)
        (" a a a a a </w> ", "a a", " aa aa a </w> "),
        (" a a a a a a </w> ", "a a", " aa aa aa </w> "),
        (" a a a </w> ", "a a", " aa a </w> "),
        # merged symbol must not re-merge within the same step
        (" a a a b </w> ", "a a", " aa a b </w> "),
    ]
    df = spark.createDataFrame(
        [(str(i), 1, sym) for i, (sym, _, _) in enumerate(cases)],
        "word string, n long, sym string",
    )
    for i, (sym, pair, want) in enumerate(cases):
        sub = spark.createDataFrame(
            [(str(i), 1, sym)], "word string, n long, sym string"
        )
        assert apply_merge(sub, pair).first()["sym"] == want, (sym, pair)


def test_bpe_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert bpe_merge_steps(df, k=2).count() == 0


def test_bpe_oracle_agrees_on_self_pair_corpus(spark, tmp_path):
    """The DuckDB oracle's list_reduce fold and the Spark fold must
    agree on a corpus where a SELF-pair ('a a') wins the first merge
    and words contain odd runs — the regime where the old string
    replacement diverged."""
    import duckdb

    from etl_his_spark.registry import ORACLES, QUERIES

    docs = [
        (1, "aaaaa aaa bb"),
        (2, "aaaaa aaaa bb"),
        (3, "aaa cc aaaaa"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = str(tmp_path / "bpe")
    df.write.parquet(f"{out}/documents.parquet")
    got = sorted(
        (r["step"], r["pair"], r["new_symbol"], r["pair_count"])
        for r in QUERIES["training_bpe_merges"](spark, out).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{out}/documents.parquet/*.parquet')"
    )
    want = sorted(tuple(r) for r in con.execute(ORACLES["training_bpe_merges"]).fetchall())
    assert got == want
    # and both match the greedy Python reference
    ref = sorted(_ref_bpe([t for _, t in docs], 3))
    assert got == ref


def test_bpe_encode_matches_reference(spark, sf_dir):
    """Encode side: per-doc (n_words, n_subwords) after k=3 merges
    equals the pure-Python greedy reference applied document-wise."""
    rows = [
        r
        for r in pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
        if r["text"] is not None
    ]
    texts = [r["text"] for r in rows]
    # rebuild the reference final symbol table (same loop as _ref_bpe)
    words = Counter()
    for t in texts:
        for w in t.strip().split(" "):
            if w:
                words[w] += 1
    syms = {w: list(w) + ["</w>"] for w in words}
    for step in range(3):
        pairs = Counter()
        for w, ss in syms.items():
            for a, b in zip(ss, ss[1:]):
                pairs[f"{a} {b}"] += words[w]
        if not pairs:
            break
        pair, _ = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
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
    want = {}
    for r in rows:
        toks = [w for w in r["text"].strip().split(" ") if w]
        if toks:
            want[r["doc_id"]] = (len(toks), sum(len(syms[w]) for w in toks))
    got = {
        r["doc_id"]: (r["n_words"], r["n_subwords"])
        for r in QUERIES["training_bpe_encode"](spark, sf_dir).collect()
    }
    assert got == want
