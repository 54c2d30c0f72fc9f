"""Runtime scale-guards: the quadratic ground-truth baselines and the
single-partition dense_ids_small must FAIL FAST on scale-sized input,
naming their scale-safe twin (r10 verdict items 5-6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_his_spark.operators import surrogate
from etl_his_spark.operators.dedup_approx import jaccard_pairs
from etl_his_spark.operators.guards import (
    BaselineScaleError,
    assert_baseline_scale,
)
from etl_his_spark.operators.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
)


def _vecs(spark, n):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double"),
            F.lit(1.0),
        ).alias("embedding"),
    )


def test_assert_baseline_scale_passes_and_returns_count(spark):
    n = assert_baseline_scale(spark.range(5), 10, "x", "y")
    assert n == 5


def test_assert_baseline_scale_raises_over_cap(spark):
    with pytest.raises(BaselineScaleError, match="scale-safe-twin"):
        assert_baseline_scale(
            spark.range(11), 10, "toy baseline", "scale-safe-twin"
        )


def test_embedding_neardup_pairs_guard(spark):
    with pytest.raises(BaselineScaleError, match="banded_neardup_pairs"):
        embedding_neardup_pairs(_vecs(spark, 100_001), 0.9)
    # Under the cap: plan builds (no quadratic work executed here).
    embedding_neardup_pairs(_vecs(spark, 10), 0.9)


def test_brute_force_topk_query_panel_guard(spark):
    with pytest.raises(BaselineScaleError, match="ivf_topk"):
        brute_force_topk(_vecs(spark, 10), _vecs(spark, 10_001), k=5)
    brute_force_topk(_vecs(spark, 10), _vecs(spark, 3), k=5)


def test_brute_force_topk_corpus_cap_clamped(spark):
    """ADVICE r11: with a tiny query panel the corpus cap is clamped
    to a fixed 4M constant, so the guard's own limit-scan stays cheap
    (the 2e9-sims formula alone would scan ~2e9 rows to validate)."""
    from etl_his_spark.operators import similarity as sim_mod
    import etl_his_spark.operators.guards as guards_mod

    caps = []
    orig = guards_mod.assert_baseline_scale

    def spy(df, cap, what, twin):
        caps.append((what, cap))
        return orig(df, min(cap, 100), what, twin)  # keep the scan tiny

    # patch at the guards module: brute_force_topk imports it lazily
    import unittest.mock as mock

    with mock.patch.object(
        guards_mod, "assert_baseline_scale", side_effect=spy
    ):
        sim_mod.brute_force_topk(_vecs(spark, 3), _vecs(spark, 2), k=1)
    corpus_caps = [c for what, c in caps if "corpus" in what]
    assert corpus_caps == [4_000_000]


def test_gram_matrix_exact_dim_guard(spark):
    from etl_his_spark.operators.vector_numpy import (
        GRAM_MAX_DIM,
        gram_matrix_exact,
    )

    with pytest.raises(ValueError, match="bounded at dim"):
        gram_matrix_exact(_vecs(spark, 3), dim=GRAM_MAX_DIM + 1)
    # at/below the cap: plan builds lazily, no error
    gram_matrix_exact(_vecs(spark, 3), dim=2)


def test_jaccard_pairs_guard(spark):
    docs = spark.range(200_001).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma delta "), F.col("id")).alias(
            "text"
        ),
    )
    with pytest.raises(BaselineScaleError, match="minhash_lsh_candidates"):
        jaccard_pairs(docs, 0.7)


def test_dense_ids_small_guard(spark, monkeypatch):
    monkeypatch.setattr(surrogate, "DENSE_IDS_SMALL_MAX", 5)
    df = spark.range(6).select(F.col("id").alias("k"))
    out = surrogate.dense_ids_small(df, [F.col("k")], "sid")
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    with pytest.raises(
        (SparkRuntimeException, Py4JJavaError), match="dense_ids_small"
    ):
        out.collect()
    # At the cap: ids still dense 1..5.
    ok = surrogate.dense_ids_small(
        spark.range(5).select(F.col("id").alias("k")), [F.col("k")], "sid"
    )
    assert sorted(r["sid"] for r in ok.collect()) == [1, 2, 3, 4, 5]


def test_dense_ids_small_precheck_raises_before_shuffle(spark, monkeypatch):
    """ADVICE r11: precheck=True raises at plan-build time (bounded
    pre-shuffle scan), not mid-sort on the single window partition."""
    monkeypatch.setattr(surrogate, "DENSE_IDS_SMALL_MAX", 5)
    df = spark.range(6).select(F.col("id").alias("k"))
    with pytest.raises(BaselineScaleError, match="dense_ids"):
        surrogate.dense_ids_small(df, [F.col("k")], "sid", precheck=True)
    # under the cap with precheck: same dense ids
    ok = surrogate.dense_ids_small(
        spark.range(5).select(F.col("id").alias("k")),
        [F.col("k")],
        "sid",
        precheck=True,
    )
    assert sorted(r["sid"] for r in ok.collect()) == [1, 2, 3, 4, 5]
