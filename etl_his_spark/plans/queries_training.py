"""Training-layout gate queries: sequence packing + mixture sampling.

The last mile of a pre-training pipeline: curated docs → fixed-budget
training sequences (concat-and-chunk in a deterministic shuffle order)
and per-source mixture rebalancing. Both all-integer → exact oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import token_count
from ..operators.packing import mixture_sample, pack_sequences
from ..registry import register
from ..sources.readers import read_table

SEQ_BUDGET = 1024


@register(
    "training_pack_sequences",
    rf"""
    WITH t AS (
        SELECT doc_id,
               CASE WHEN text IS NULL OR trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\s+')) END
                   AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS end_offset
        FROM t WHERE n_tokens > 0
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(end_offset - n_tokens AS BIGINT) AS start_offset,
           CAST((end_offset - n_tokens) // {SEQ_BUDGET} AS BIGINT) AS seq_id,
           CAST((end_offset - n_tokens) % {SEQ_BUDGET} AS BIGINT) AS seq_pos,
           CAST((end_offset - 1) // {SEQ_BUDGET}
                - (end_offset - n_tokens) // {SEQ_BUDGET} + 1 AS BIGINT)
               AS n_seqs
    FROM c
    """,
)
def training_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing: each doc's span in 1024-token
    training sequences, offsets assigned by a distributed prefix sum
    over the md5 shuffle order (the oracle's single-partition window
    cumsum is output-identical — see operators/packing.running_total).
    Training-data extension; no reference twin."""
    docs = read_table(spark, sf_dir, "documents")
    return pack_sequences(
        docs, token_count("text"), budget=SEQ_BUDGET
    )


@register(
    "training_mixture_sample",
    """
    WITH ranked AS (
        SELECT doc_id, source,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS sample_rank,
               count(*) OVER (PARTITION BY source) AS n,
               CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                    THEN 100 ELSE 40 END AS pct
        FROM documents
    )
    SELECT doc_id, source, sample_rank,
           CAST((pct * n + 99) // 100 AS BIGINT) AS n_kept
    FROM ranked
    WHERE sample_rank <= (pct * n + 99) // 100
    """,
)
def training_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing: even-numbered sources kept whole, odd ones
    downsampled to 40%, deterministically by md5 rank. Integer-ceiling
    keep counts (no float). Training-data extension."""
    docs = read_table(spark, sf_dir, "documents")
    pct = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(100)
    ).otherwise(F.lit(40))
    return mixture_sample(docs, pct)
