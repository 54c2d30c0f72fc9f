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
    represent natively. Instead of flipping the session-wide
    ``spark.sql.legacy.parquet.nanosAsLong`` flag (which would leak to
    every later parquet read on a caller's shared session, silently
    turning any other nanos column into bigint), the events scan
    requests an EXPLICIT schema with ``ts`` as LongType — parquet
    happily serves INT64(NANOS) as a plain long when asked — and
    converts to a microsecond TimestampType by integer division (the
    same ns→µs truncation DuckDB applies when reading the file). The
    caller's session conf is never touched. Works on bare, unconfigured
    SparkSessions (external harnesses hand us those).
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        return _read_events(spark, path)
    return spark.read.parquet(path)


# Per-path memo of "does ts need the explicit-long schema" — the footer
# probe (or the failed native read it falls back to) runs once per file.
_EVENTS_TS_IS_NANOS: dict[str, bool] = {}


def _ts_is_nanos(path: str) -> bool | None:
    """Driver-side footer probe: True/False if determinable, None if
    not (multi-file dataset dir, pyarrow missing)."""
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pq.read_schema(path).field("ts").type
        return pa.types.is_timestamp(t) and t.unit == "ns"
    except Exception:
        return None


def _events_nanos(spark: SparkSession, path: str) -> bool:
    """Memoized: does this events file carry ts as TIMESTAMP(NANOS)?"""
    nanos = _EVENTS_TS_IS_NANOS.get(path)
    if nanos is None:
        nanos = _ts_is_nanos(path)
        if nanos is None:
            # Unprobeable: try the native scan; TIMESTAMP(NANOS) dies
            # at schema inference (PARQUET_TYPE_ILLEGAL) before any
            # plan is built, so the failure is safe to catch.
            try:
                spark.read.parquet(path)
                nanos = False
            except Exception:
                nanos = True
        _EVENTS_TS_IS_NANOS[path] = nanos
    return nanos


def read_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with ``ts`` as raw nanos-since-epoch LongType — no
    timestamp conversion.

    This is the ONLY sanctioned way to read the nanos events file
    without a timestamp column: a bare ``spark.read.parquet`` on it
    throws ``PARQUET_TYPE_ILLEGAL: INT64 (TIMESTAMP(NANOS,false))``
    on any session that doesn't carry the legacy ``nanosAsLong`` conf
    (which this repo deliberately never sets session-wide — see
    ``read_table``). Streaming replay fixtures use this to materialize
    source dirs whose ``ts`` stays long, matching
    ``streaming.events.EVENTS_RAW_SCHEMA``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ..schemas import EVENTS

    path = f"{sf_dir}/events.parquet"
    if _events_nanos(spark, path):
        raw = T.StructType(
            [
                T.StructField(
                    f.name,
                    T.LongType() if f.name == "ts" else f.dataType,
                    f.nullable,
                )
                for f in EVENTS.fields
            ]
        )
        return spark.read.schema(raw).parquet(path)
    # Native-timestamp file: normalize to the same nanos-long contract.
    df = spark.read.parquet(path)
    dt = dict(df.dtypes).get("ts")
    if dt == "timestamp_ntz":
        # Timezone-INDEPENDENT epoch micros: timestampdiff on two NTZ
        # values never consults the session timezone, so a naive file
        # value is read as the UTC instant with the same wall clock —
        # exactly DuckDB's naive-as-UTC semantics — even on a bare
        # session pinned to some local zone (an NTZ→LTZ cast there
        # would shift ts by the session offset).
        df = df.withColumn("ts", _ntz_epoch_micros("ts") * F.lit(1000))
    elif dt != "bigint":
        df = df.withColumn("ts", F.unix_micros(F.col("ts")) * F.lit(1000))
    return df


def _ntz_epoch_micros(col: str):
    """Microseconds since epoch of a TIMESTAMP_NTZ column, treating the
    naive value as UTC — computed wholly inside NTZ arithmetic (no
    session-timezone dependence)."""
    from pyspark.sql import functions as F

    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
    ).cast("long")


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    from pyspark.sql import functions as F

    if _events_nanos(spark, path):
        sf_dir = path[: -len("/events.parquet")]
        df = read_events_raw(spark, sf_dir)
    else:
        df = spark.read.parquet(path)
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        # nanos-as-long (either path): truncate ns→µs exactly as DuckDB
        # does when reading the same file.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        # Native TIMESTAMP(MICROS) parquet arrives as NTZ; normalize to
        # TimestampType so downstream expressions (unix_micros, window
        # arithmetic) see one type regardless of the file's flavor.
        # Naive-as-UTC (DuckDB's reading) via tz-free NTZ arithmetic —
        # a bare .cast("timestamp") would be exact only under a UTC
        # session timezone, and read_table's contract includes bare,
        # unconfigured sessions in any zone.
        df = df.withColumn(
            "ts", F.timestamp_micros(_ntz_epoch_micros("ts"))
        )
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


def input_size_bytes(df) -> int:
    """Total on-storage bytes behind a frame's file scan, 0 when the
    frame has no file lineage (shuffle/checkpoint/local-memory).

    Goes through the Hadoop FileSystem API, so it answers for ANY
    scheme the cluster can read (s3a://, hdfs://, abfs://, file://) —
    a local ``os.path.getsize`` probe would silently return 0 on
    object storage and disable every size-gated optimization built on
    it (broadcast gates, block sizing). Metadata-only: one
    getFileStatus per file, no data read.
    """
    try:
        files = df.inputFiles()
    except Exception:
        return 0
    if not files:
        return 0
    sc = df.sparkSession.sparkContext
    jvm = sc._jvm
    hconf = sc._jsc.hadoopConfiguration()
    total = 0
    for f in files:
        try:
            p = jvm.org.apache.hadoop.fs.Path(f)
            total += p.getFileSystem(hconf).getFileStatus(p).getLen()
        except Exception:
            return 0
    return total
