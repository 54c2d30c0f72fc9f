"""Vocab-broadcast gate observability (r6 verdict item 5).

The gate decision must be (a) recorded where tools can read it and
(b) in agreement with the join strategy Catalyst actually plans — a
probe failure that silently falls back to sort-merge was the suspected
cause of the r6 driver-bench regression on the tokenize/OOV queries.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_gate_fires_and_plan_broadcasts(spark, sf_dir):
    from etl_his_spark.plans import queries_vocab
    from etl_his_spark.registry import ordered_queries

    qs = ordered_queries()
    for name in ("training_tokenize_docs", "training_oov_rate"):
        queries_vocab.LAST_GATE_DECISION.clear()
        df = qs[name](spark, sf_dir)
        d = queries_vocab.LAST_GATE_DECISION
        assert d.get("decision") == "broadcast", (name, d)
        assert 0 < d["corpus_bytes"] < d["threshold_bytes"]
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_gate_shuffles_above_threshold(spark, sf_dir, monkeypatch):
    from etl_his_spark.plans import queries_vocab
    from etl_his_spark.sources.readers import read_table

    monkeypatch.setattr(queries_vocab, "_VOCAB_BCAST_CORPUS_BYTES", 1)
    docs = read_table(spark, sf_dir, "documents")
    vocab = docs.select(F.lit("a").alias("token"))
    out = queries_vocab._maybe_broadcast_vocab(vocab, docs)
    assert queries_vocab.LAST_GATE_DECISION["decision"] == "shuffle"
    # no broadcast hint applied: the returned frame is the input frame
    assert out is vocab
