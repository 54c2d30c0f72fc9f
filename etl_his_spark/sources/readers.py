"""Source readers.

The reference has exactly one source: a SQL Server JDBC-style scan fully
materialized in driver memory (src/Command/EtlHisTurnosCommand.php:
235-331, `fetchAll()` at :324). Here every source is a distributed scan:

- ``read_table`` — parquet scan of one table from a scale-factor dir.
  Column pruning + predicate pushdown reach the parquet reader via
  Catalyst (verify with ``df.explain``: ``ReadSchema``/``PushedFilters``).
- ``read_jdbc`` — the JDBC equivalent of the reference's extraction,
  gated behind driver availability; partitioned reads so no single
  executor materializes the whole table.

At 100 TB the parquet path is the real one: one directory per table,
files split by ``spark.sql.files.maxPartitionBytes`` into ~128 MB tasks,
so a 1000-executor cluster scans in parallel with no driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table (``{sf_dir}/{name}.parquet``) as a DataFrame.

    ``events.ts`` is TIMESTAMP(NANOS) in parquet, which Spark cannot
    represent; with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives
    as nanos-since-epoch and is converted here to a microsecond
    TimestampType by integer division (same ns→µs truncation DuckDB
    applies when reading the file).

    The conf is set here on the *passed-in* session (runtime-settable),
    not only in the session factory: callers — including external
    harnesses — hand us arbitrary SparkSessions that never went through
    ``session.get_spark``, and without the conf the scan dies with
    PARQUET_TYPE_ILLEGAL before any plan is built.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def read_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Scan several tables at once; defaults to the full testdata set."""
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    return {n: read_table(spark, sf_dir, n) for n in names}


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned JDBC scan (the Spark-native form of the reference's S1).

    Unlike the reference — which runs one query and pulls the entire
    result set into one process — this splits the scan into
    ``num_partitions`` range predicates on ``partition_column`` so the
    read is distributed and bounded per task. Requires the JDBC driver
    jar on the classpath; callers should treat failures as environment
    gaps, not logic errors.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound/upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()
