"""Observation-based pipeline metrics (S7 analog)."""

from __future__ import annotations

import pytest
from his_fixtures import his_tables
from pyspark.sql import functions as F

from etl_his_spark.observability import ObservedPipeline, observed
from etl_his_spark.plans.his_pipeline import run_pipeline


@pytest.fixture(scope="module")
def tables(spark):
    return his_tables(spark)


def test_observed_metrics_match_direct_counts(spark, sf_dir):
    from etl_his_spark.sources.readers import read_table

    docs = read_table(spark, sf_dir, "documents")
    out, obs = observed(
        docs, "docs",
        null_text=F.sum(F.col("text").isNull().cast("long")),
        max_chars=F.max("n_chars"),
    )
    n = out.count()  # the action that materializes the observation
    got = obs.get
    assert got["rows"] == n
    assert got["null_text"] == docs.filter(F.col("text").isNull()).count()
    assert got["max_chars"] == docs.agg(F.max("n_chars")).first()[0]


def test_pipeline_report_counts_all_outputs(spark, tables):
    op = ObservedPipeline()
    outputs = run_pipeline(tables)
    expected = {}
    for name, df in outputs.items():
        instrumented, done = op.stage(df, name)
        expected[name] = instrumented.count()
        done()
    report = op.report()
    assert "-- pipeline run --" in report
    for name, n in expected.items():
        assert name in report
        # observed row counter equals the action's own count
        stage = next(s for s in op.stages if s.name == name)
        assert stage.rows == n
    assert f"across {len(outputs)} outputs" in report


def test_observation_rides_write_action(spark, tables, tmp_path):
    # Metrics come from the WRITE action itself — no second scan needed.
    outputs = run_pipeline(tables)
    op = ObservedPipeline()
    df, done = op.stage(outputs["paciente"], "paciente_write")
    df.write.mode("overwrite").parquet(str(tmp_path / "paciente"))
    sm = done()
    assert sm.rows == outputs["paciente"].count()
