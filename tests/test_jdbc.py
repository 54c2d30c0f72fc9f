"""read_jdbc smoke test against embedded Derby (the JDBC driver Spark
ships for its Hive metastore — no external service needed).

The reference's only source is a SQL Server JDBC extraction
(src/Command/EtlHisTurnosCommand.php:235-331); read_jdbc is its
distributed form. SQL Server itself needs a driver jar this sandbox
doesn't have, so the smoke test proves the partitioned-read plumbing
(partitionColumn/bounds → N parallel range scans) on Derby, which
exercises the identical Spark JDBC code path.
"""

from __future__ import annotations

import pytest

from etl_his_spark.sources.readers import read_jdbc


def _derby_available(spark) -> bool:
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return True
    except Exception:
        return False


def test_read_jdbc_partitioned_roundtrip(spark, tmp_path_factory):
    if not _derby_available(spark):
        pytest.skip("Derby JDBC driver not on Spark's classpath")
    db = str(tmp_path_factory.mktemp("derby") / "smokedb")
    url = f"jdbc:derby:{db};create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    # seed a table through Spark's own JDBC writer
    seed = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    (seed.write.format("jdbc").option("url", url).option("dbtable", "t")
         .option("driver", props["driver"]).mode("overwrite").save())

    df = read_jdbc(
        spark, url, "t",
        partition_column="k", num_partitions=4,
        lower_bound=0, upper_bound=100, properties=props,
    )
    assert df.rdd.getNumPartitions() == 4  # the distributed-scan contract
    rows = sorted((r["K"] if "K" in df.columns else r["k"], ) for r in df.collect())
    assert len(rows) == 100
    total = df.agg({"v" if "v" in df.columns else "V": "sum"}).collect()[0][0]
    assert total == sum(i * 2 for i in range(100))


def test_read_jdbc_requires_bounds(spark):
    with pytest.raises(ValueError):
        read_jdbc(spark, "jdbc:derby:memory:x", "t", partition_column="k")
