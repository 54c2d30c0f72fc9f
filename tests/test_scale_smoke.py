"""Scale smoke: fact-path operators on a generated 5M-row input.

The bundled scale factors top out at ~600k lineitem rows; these checks
run the scale-critical operators (parallel dense ids, window dedup,
salted aggregation) on 5M generated rows to catch accidental
driver-side materialization or single-partition stages that small data
hides. Invariant checks only — runtime is bounded by CI patience, not
asserted.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_his_spark.operators.dedup import dedup_first_per_key
from etl_his_spark.operators.skew import salted_agg
from etl_his_spark.operators.surrogate import dense_ids

N = 5_000_000
KEYS = 100_000


@pytest.fixture(scope="module")
def big(spark):
    # deterministic synthetic: 5M rows, 100k entities, skewed 10% to key
    # 0. The non-hot modulus (KEYS-1 = 99999) is coprime with 10 so
    # every entity 1..99999 receives rows from non-multiple-of-10 ids.
    return (
        spark.range(N)
        .select(
            F.col("id"),
            F.when(F.col("id") % 10 == 0, 0)
            .otherwise(1 + (F.col("id") % (KEYS - 1)))
            .alias("entity"),
            (F.col("id") % 1000).alias("v"),
            F.timestamp_micros(F.col("id") * 1000).alias("ts"),
        )
        .repartition(32)
    )


def test_parallel_dense_ids_at_5m(big):
    out = dense_ids(big, [F.col("id")], "rid", buckets=64)
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rid").alias("lo"),
        F.max("rid").alias("hi"),
        F.countDistinct("rid").alias("d"),
    ).first()
    assert (stats["n"], stats["lo"], stats["hi"], stats["d"]) == (N, 1, N, N)


def test_window_dedup_at_5m(big):
    out = dedup_first_per_key(
        big, ["entity"], [F.col("ts").desc(), F.col("id").desc()]
    )
    assert out.count() == KEYS  # hot key 0 + entities 1..KEYS-1
    # survivor for the hot entity must be the max id (latest ts)
    hot = out.filter(F.col("entity") == 0).first()
    assert hot["id"] == N - 10  # largest id divisible by 10


def test_salted_agg_at_5m_equals_direct(big):
    direct = {
        r["entity"]: r["s"]
        for r in big.groupBy("entity").agg(F.sum("v").alias("s")).collect()
    }
    salted = {
        r["entity"]: r["s"]
        for r in salted_agg(
            big, ["entity"], F.col("id"), {"s": ("sum", "v")}, n_salts=32
        ).collect()
    }
    assert salted == direct


def test_running_total_at_5m(big):
    from etl_his_spark.operators.packing import running_total

    out = running_total(big, [F.col("id")], F.col("v"), "cum", buckets=64)
    stats = out.agg(
        F.count(F.lit(1)).alias("n"), F.max("cum").alias("total")
    ).first()
    # Σ v where v = id % 1000 over 5M ids = 5000 full cycles of 0..999
    assert stats["n"] == N
    assert stats["total"] == (999 * 1000 // 2) * (N // 1000)
    # prefix property at a probe point: cum(id=999) = Σ 0..999
    probe = out.filter(F.col("id") == 999).first()
    assert probe["cum"] == 999 * 1000 // 2
