"""Semi-structured (JSON) + lateral/explode operator queries.

``events.props`` carries JSON strings — the engine parses them
JVM-side (``get_json_object`` / ``from_json``), never in Python.
Explode/posexplode cover the lateral-view surface (one row → N rows
from array columns), the generator twin of the U1 unpivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import register
from ..sources.readers import read_table


@register(
    "json_extract_stats",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY 1
    """,
)
def json_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction in the scan projection (JVM-side), then
    integer aggregation — exact across engines."""
    e = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "json_schema_parse",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 90
    """,
)
def json_schema_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing via from_json with a declared schema (the
    no-inference stance for semi-structured data) + predicate on the
    parsed field."""
    e = read_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = e.select(
        "event_id", F.from_json("props", schema).alias("p")
    ).select("event_id", F.col("p.k").alias("k"))
    return parsed.filter(F.col("k") > 90)


@register(
    "explode_wordcount_topk",
    """
    WITH words AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
        FROM documents
    )
    SELECT word, count(*) AS n
    FROM words
    WHERE word <> ''
    GROUP BY word
    ORDER BY count(*) DESC, word
    LIMIT 20
    """,
)
def explode_wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical explode pipeline: split → explode → count → top-k
    (deterministic tie-break). Generator + partial agg, one shuffle."""
    d = read_table(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(20)
    )


@register(
    "posexplode_positions",
    """
    WITH w AS (
        SELECT doc_id, string_split(trim(text), ' ') AS words FROM documents
    )
    SELECT doc_id, 0 AS pos, words[1] AS word FROM w WHERE len(words) >= 1
    UNION ALL
    SELECT doc_id, 1, words[2] FROM w WHERE len(words) >= 2
    UNION ALL
    SELECT doc_id, 2, words[3] FROM w WHERE len(words) >= 3
    UNION ALL
    SELECT doc_id, 3, words[4] FROM w WHERE len(words) >= 4
    UNION ALL
    SELECT doc_id, 4, words[5] FROM w WHERE len(words) >= 5
    """,
)
def posexplode_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (lateral view with ordinality): first five word
    positions per document — 1:N generation preserving position."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.trim(F.col("text")), " ")).alias("pos", "word"),
        )
        .filter(F.col("pos") < 5)
        .select("doc_id", F.col("pos").cast("long").alias("pos"), "word")
    )


@register(
    "jsonl_ingest_corrupt",
    """
    WITH srcrows AS (
        SELECT doc_id, source, n_chars,
               -- every 37th doc's JSON line is corrupted on disk
               CASE WHEN doc_id % 37 = 0 THEN 1 ELSE 0 END AS corrupt
        FROM documents
    )
    SELECT source,
           CAST(SUM(1 - corrupt) AS BIGINT) AS n_valid,
           CAST(SUM(corrupt) AS BIGINT) AS n_corrupt,
           CAST(COALESCE(SUM(CASE WHEN corrupt = 0 THEN n_chars END), 0)
                AS BIGINT) AS chars_valid
    FROM srcrows
    GROUP BY source
    """,
)
def jsonl_ingest_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust JSONL ingestion: the corpus is serialized to JSON-lines
    files with every 37th record's line deterministically TRUNCATED
    (mid-value — invalid JSON), then read back with an explicit schema
    in PERMISSIVE mode + ``columnNameOfCorruptRecord``: broken lines
    surface as rows with NULL fields and the raw line captured in the
    corrupt column instead of failing the job — the only viable
    contract at web-corpus scale, where some fraction of every crawl
    shard is malformed. The gate hash-checks the per-source
    valid/corrupt split and that the valid rows' payload survived the
    round trip byte-exactly (chars_valid).

    WRITE-EFFECTFUL: writes the JSONL shards under the managed
    per-process temp root, overwriting per invocation.
    """
    import os

    from pyspark.sql import types as T

    from .queries_misc import _publish_gate_root

    root = os.path.join(_publish_gate_root(), "jsonl")
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", "text"
    )
    # serialize each row to a JSON line; corrupt every 37th by
    # truncating the line's second half (deterministic, mid-value)
    line = F.to_json(F.struct("doc_id", "source", "n_chars", "text"))
    corrupted = F.when(
        F.col("doc_id") % 37 == 0,
        F.substring(line, 1, (F.length(line) / 2).cast("int")),
    ).otherwise(line)
    # The planted-total scalar rides the WRITE action as an Observation
    # (r8 verdict item 6): the writer's own scan counts its corrupt
    # plants for free — no separate planned.agg().collect() action.
    from ..observability import observed

    to_write, w_obs = observed(
        docs.select(corrupted.alias("value"), "doc_id"),
        "jsonl_write",
        planted=F.sum((F.col("doc_id") % 37 == 0).cast("long")),
    )
    to_write.select("value").write.mode("overwrite").text(root)
    planned_total = int(w_obs.get["planted"] or 0)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("_bad", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(root)
    )
    # per-source VALID stats come from the read-back; per-source
    # CORRUPT counts come from the writer's own plant list (a broken
    # line's source is not reliably recoverable), with a total-count
    # integrity probe tying the two views together below.
    valid = back.filter(F.col("_bad").isNull()).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_valid"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("chars_valid"),
    )
    # PERMISSIVE keeps PARTIAL parses (fields before the break point
    # survive, _bad carries the raw line), so corrupt rows cannot be
    # found by NULL fields. And Spark REFUSES corrupt-only queries on
    # a raw JSON scan (count() included — it would skip parsing and
    # could not see corruption); the documented contract is to cache
    # the parsed frame first, which this probe does for the scalar
    # integrity counts, releasing the blocks before returning (the
    # returned plan's own columns re-parse legally).
    planned = docs.filter(F.col("doc_id") % 37 == 0).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_corrupt")
    )
    # integrity cross-check: the reader must see exactly as many
    # corrupt lines as the writer planted (the Observation scalar
    # gathered during the write above — zero extra actions)
    back = back.cache()
    try:
        n_total = back.count()
        n_corrupt_total = n_total - back.filter(F.col("_bad").isNull()).count()
        if n_corrupt_total != planned_total:
            raise AssertionError(
                f"corrupt-line mismatch: read {n_corrupt_total}, "
                f"planted {planned_total}"
            )
        # eqNullSafe: a NULL source must combine into ONE row like the
        # oracle's GROUP BY, not split across the outer join's sides
        p = planned.select(
            F.col("source").alias("__psource"), "n_corrupt"
        )
        return (
            valid.join(
                p, valid["source"].eqNullSafe(p["__psource"]), "full_outer"
            )
            .select(
                F.coalesce(valid["source"], p["__psource"]).alias("source"),
                F.coalesce("n_valid", F.lit(0)).cast("long").alias("n_valid"),
                F.coalesce("n_corrupt", F.lit(0)).cast("long")
                .alias("n_corrupt"),
                F.coalesce("chars_valid", F.lit(0)).cast("long")
                .alias("chars_valid"),
            )
        )
    finally:
        back.unpersist()
