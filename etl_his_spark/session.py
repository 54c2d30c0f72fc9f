"""SparkSession factory with scale-aware defaults.

The reference delegates planning to SQL Server and has no engine of its
own (SURVEY.md §4.1); here Catalyst is the optimizer and these configs
are the knobs that matter both on ``local[N]`` and on a large cluster:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast conversion) — replaces hand-tuned partition counts.
- ``spark.sql.shuffle.partitions`` set low for local mode; AQE coalesces
  further. On a real cluster this would be ~2-3x total cores and AQE
  still right-sizes each exchange.
- Session timezone pinned to UTC: the reference's target schema uses
  timezone-naive TIMESTAMP/DATE (PostgresSchemaBuilder DDL,
  src/Service/PostgresSchemaBuilder.php:77-82), so all event-time
  semantics here are naive-UTC.
- Arrow enabled for any Pandas-UDF path (vector/multimodal operators).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "etl_his_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    In local mode one JVM hosts driver+executors, so driver memory is the
    only memory knob. All settings are equally valid on a cluster master.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    # Python workers deserialize our functions (Pandas UDFs, stateful
    # updates) and must be able to import this package regardless of the
    # driver's cwd. Locally: inherit via PYTHONPATH before the JVM
    # starts; on a cluster: ship a zip via spark.submit.pyFiles instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{existing}" if existing else pkg_root
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # events.parquet stores TIMESTAMP(NANOS); sources.readers reads
        # it with an explicit long schema and converts to micros — no
        # session-wide nanosAsLong flag needed (it would silently turn
        # every other nanos column into bigint).
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
