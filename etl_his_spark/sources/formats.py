"""Additional source formats — CSV / JSON(L) with declared schemas.

The reference reads exactly one source (SQL Server). A general engine
ingests files too; these readers enforce the engine's no-inference
stance (explicit StructType, malformed-row policy chosen by caller)
so scans stay single-pass — schema inference would read the data
twice, unacceptable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
    mode: str = "FAILFAST",
) -> DataFrame:
    """CSV scan with declared schema.

    ``mode``: FAILFAST (corrupt data is an error — default, matches the
    reference's abort-on-error posture), PERMISSIVE (nulls), or
    DROPMALFORMED.
    """
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("delimiter", delimiter)
        .option("mode", mode)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    mode: str = "FAILFAST",
) -> DataFrame:
    """JSON-lines scan with declared schema (no inference pass)."""
    return spark.read.schema(schema).option("mode", mode).json(path)


def write_csv(df: DataFrame, path: str, *, header: bool = True) -> None:
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — self-describing columnar format (schema embedded in
    the file, so no declared StructType needed); same predicate/column
    pushdown machinery as parquet."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)
