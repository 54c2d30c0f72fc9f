"""Flagship pipeline invariants (FIXTURES.md expected-output shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_his_spark.plans.flagship import dim_cliente, enriched_orders, flagship_fact


def test_flagship_runs_and_has_rows(spark, sf_dir):
    fact = flagship_fact(spark, sf_dir)
    assert fact.count() > 0


def test_dim_unique_and_dense(spark, sf_dir):
    enriched = enriched_orders(spark, sf_dir)
    dim = dim_cliente(enriched)
    n = dim.count()
    assert dim.select("cliente_key").distinct().count() == n
    ids = sorted(r["cliente_id"] for r in dim.select("cliente_id").collect())
    assert ids == list(range(1, n + 1))


def test_fact_fk_resolves(spark, sf_dir):
    fact = flagship_fact(spark, sf_dir)
    assert fact.filter(F.col("cliente_id").isNull()).count() == 0
