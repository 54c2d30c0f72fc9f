"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ETL at sf0.001; ``queries()`` maps
every implemented operator from SURVEY.md §2 (plus the training-data
pipeline extensions) to a (spark, sf_dir) -> DataFrame callable;
``oracle_sql()`` provides the DuckDB twin for each SQL-expressible one.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_his_spark.registry import ORACLES, ordered_queries
from etl_his_spark.plans.flagship import flagship_fact


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship_fact(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(ORACLES)
