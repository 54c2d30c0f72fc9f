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
