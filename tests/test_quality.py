"""Data-quality operator tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_his_spark.operators.quality import validate_split, with_violations


def test_validate_split_partition(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, -5.0, "O"), (3, 10.0, "X"), (4, None, "F")],
        "id long, price double, status string",
    )
    rules = {
        "price_pos": F.col("price").isNotNull() & (F.col("price") > 0),
        "status_known": F.col("status").isin("O", "F", "P"),
    }
    valid, quarantine = validate_split(df, rules)
    assert [r["id"] for r in valid.orderBy("id").collect()] == [1]
    q = {r["id"]: sorted(r["violations"]) for r in quarantine.collect()}
    assert q == {2: ["price_pos"], 3: ["status_known"], 4: ["price_pos"]}
    # split is a partition: no row lost or duplicated
    assert valid.count() + quarantine.count() == df.count()


def test_null_counts_as_violation(spark):
    df = spark.createDataFrame([(1, None)], "id long, price double")
    out = with_violations(df, {"p": F.col("price") > 0}).first()
    assert out["violations"] == ["p"]
