"""Sequence packing + mixture sampling invariants."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_his_spark.operators.packing import (
    mixture_sample,
    pack_sequences,
    running_total,
)


def test_running_total_matches_global_window(spark):
    df = spark.range(1, 501).select(
        F.col("id"), (F.col("id") % 7 + 1).alias("v")
    )
    # small buckets force multi-partition prefix-sum stitching
    got = running_total(df, [F.col("id")], F.col("v"), "cum", buckets=8)
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("cum", F.sum("v").over(w).cast("long"))
    assert got.select("id", "cum").subtract(want.select("id", "cum")).count() == 0
    assert want.select("id", "cum").subtract(got.select("id", "cum")).count() == 0


def test_pack_sequences_partitions_the_token_stream(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13 + 1).alias("toks"),
    )
    out = pack_sequences(
        docs, F.col("toks"), budget=16, buckets=4
    ).orderBy("start_offset").collect()
    # spans tile the stream exactly: each start = previous end
    pos = 0
    for r in out:
        assert r.start_offset == pos
        pos += r.n_tokens
        assert r.seq_id == r.start_offset // 16
        assert r.seq_pos == r.start_offset % 16
        assert r.n_seqs == (r.start_offset + r.n_tokens - 1) // 16 - r.seq_id + 1
    assert pos == sum(r.n_tokens for r in out)
    # with budget 16 and docs up to 13 tokens, some docs must straddle
    assert any(r.n_seqs == 2 for r in out)


def test_pack_sequences_drops_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, 5), (2, 0), (3, 3)], "doc_id long, toks long"
    )
    out = pack_sequences(docs, F.col("toks"), budget=4, buckets=2)
    ids = {r.doc_id for r in out.collect()}
    assert ids == {1, 3}


def test_mixture_sample_integer_ceiling_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "srcA" if i < 25 else "srcB") for i in range(40)],
        "doc_id long, source string",
    )
    pct = F.when(F.col("source") == "srcA", F.lit(40)).otherwise(F.lit(100))
    out = mixture_sample(docs, pct)
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # ceil(40% of 25) = 10 by integer math (float ceil would give 11)
    assert by_src == {"srcA": 10, "srcB": 15}
    # deterministic: same rows both runs
    again = mixture_sample(docs, pct)
    assert out.select("doc_id").subtract(again.select("doc_id")).count() == 0


# ---------------------------------------------------------------------------
# Property-based invariants (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_PSETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(
    toks=st.lists(st.integers(min_value=0, max_value=40),
                  min_size=1, max_size=60),
    budget=st.integers(min_value=1, max_value=64),
)
@_PSETTINGS
def test_pack_sequences_tiling_property(spark, toks, budget):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, toks long"
    )
    out = (
        pack_sequences(docs, F.col("toks"), budget=budget, buckets=3)
        .orderBy("start_offset")
        .collect()
    )
    # zero-token docs are dropped; the rest tile [0, total) exactly
    assert len(out) == sum(1 for t in toks if t > 0)
    pos = 0
    for r in out:
        assert r.start_offset == pos
        pos += r.n_tokens
        assert 0 <= r.seq_pos < budget
        assert r.seq_id * budget + r.seq_pos == r.start_offset
        # a doc spans exactly the sequences its token span covers
        assert r.n_seqs == (r.start_offset + r.n_tokens - 1) // budget - r.seq_id + 1
    assert pos == sum(toks)


@given(
    pcts=st.lists(st.integers(min_value=0, max_value=100),
                  min_size=1, max_size=4),
    per_src=st.integers(min_value=1, max_value=12),
)
@_PSETTINGS
def test_mixture_sample_keep_counts_property(spark, pcts, per_src):
    rows = [
        (src * 1000 + i, f"s{src}")
        for src in range(len(pcts))
        for i in range(per_src)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    pct = F.coalesce(
        *[
            F.when(F.col("source") == f"s{i}", F.lit(p))
            for i, p in enumerate(pcts)
        ]
    ) if len(pcts) > 1 else F.lit(pcts[0])
    got = {
        r["source"]: r["n"]
        for r in mixture_sample(docs, pct)
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for i, p in enumerate(pcts):
        want = (p * per_src + 99) // 100  # integer ceiling
        assert got.get(f"s{i}", 0) == want
