"""Vocabulary construction + document tokenization — the tokenizer-prep
stage of a training pipeline (word-level stand-in for BPE: the vocab
ranking/id-assignment and doc→id-sequence plumbing are the same shape
regardless of the subword algorithm).

Exact-oracle. Vocab ids are frequency-ranked dense ids minted with the
PARALLEL scheme (`surrogate.dense_ids` — range repartition + broadcast
offsets), never a global row_number window; the oracle's plain window
is output-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.surrogate import dense_ids
from ..registry import register
from ..sources.readers import read_table

MIN_FREQ = 5

# Broadcast the vocab only while the CORPUS is below this size. A
# MIN_FREQ vocabulary grows sublinearly with corpus bytes (Heaps' law,
# |V| ~ k·N^β, β ≈ 0.5): under 64 GiB of text the vocab is a few 10^6
# entries — tens of MB serialized, safely broadcast; at 100 TB it can
# reach 10^7-10^8 entries (hundreds of MB to GBs — too big to ship to
# every executor), where the 8-byte-key shuffle join is the scalable
# plan. The gate exists because neither static Catalyst stats nor AQE
# see through the vocab's dense_ids RDD-scan lineage: without a hint
# they plan a sort-merge join even at test scale (measured r6: +40-66%
# on the tokenize/OOV queries at sf0.1).
_VOCAB_BCAST_CORPUS_BYTES = 64 << 30

# Last gate decision, observable from outside (r6 verdict item 5: the
# driver-env bench regressed on the tokenize/OOV queries and nothing
# recorded whether the gate actually fired there). Read it after
# building a plan — tools/vocab_gate_probe.py prints it next to the
# physical join strategy actually planned.
LAST_GATE_DECISION: dict = {}

_GATE_LOG = __import__("logging").getLogger("etl_his_spark.vocab_gate")


def _maybe_broadcast_vocab(vocab: DataFrame, docs: DataFrame) -> DataFrame:
    from ..sources.readers import input_size_bytes

    # Hadoop-FS probe: answers on any storage scheme (s3a/hdfs/abfs),
    # not just local files — a local-only probe would silently disable
    # this gate exactly where it matters.
    size = input_size_bytes(docs)
    broadcast = 0 < size < _VOCAB_BCAST_CORPUS_BYTES
    LAST_GATE_DECISION.update(
        corpus_bytes=size,
        threshold_bytes=_VOCAB_BCAST_CORPUS_BYTES,
        decision="broadcast" if broadcast else "shuffle",
    )
    _GATE_LOG.info("vocab join gate: %s", LAST_GATE_DECISION)
    if broadcast:
        return F.broadcast(vocab)
    return vocab


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, token) — 1-based positions over the single-space
    split with empties dropped (the corpus-wide tokenization rule)."""
    arr = F.filter(
        F.split(F.trim("text"), " "), lambda x: x != F.lit("")
    )
    return docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.posexplode(arr).alias("pos0", "token")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "token")


_TOKS_CTE = """
    toks AS (
        SELECT doc_id, i AS pos, ts[i] AS token
        FROM (
            SELECT doc_id,
                   list_filter(string_split(trim(text), ' '),
                               x -> x <> '') AS ts
            FROM documents WHERE text IS NOT NULL
        ) t, unnest(range(1, len(ts) + 1)) AS u(i)
    )
"""


@register(
    "training_vocab_build",
    f"""
    WITH {_TOKS_CTE},
    cnt AS (
        SELECT token, count(*) AS n FROM toks
        GROUP BY 1 HAVING count(*) >= {MIN_FREQ}
    )
    SELECT token, n,
           CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT)
               AS vocab_id
    FROM cnt
    """,
)
def training_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked vocabulary with min-count threshold: token,
    count, dense vocab id (most frequent = 1, ties lexical)."""
    docs = read_table(spark, sf_dir, "documents")
    cnt = (
        _tokens(docs)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MIN_FREQ)
    )
    return dense_ids(
        cnt, [F.col("n").desc(), F.col("token")], "vocab_id", buckets=32
    ).select("token", "n", "vocab_id")


@register(
    "training_tokenize_docs",
    f"""
    WITH {_TOKS_CTE},
    cnt AS (
        SELECT token, count(*) AS n FROM toks
        GROUP BY 1 HAVING count(*) >= {MIN_FREQ}
    ),
    vocab AS (
        SELECT token, CAST(row_number() OVER (ORDER BY n DESC, token)
                           AS BIGINT) AS vocab_id
        FROM cnt
    )
    SELECT t.doc_id,
           count(*) AS n_tokens,
           string_agg(CAST(coalesce(v.vocab_id, 0) AS VARCHAR), ','
                      ORDER BY t.pos) AS token_ids
    FROM toks t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY t.doc_id
    """,
)
def training_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs as vocab-id sequences (0 = OOV/unk), position order kept.

    The id array is emitted as a comma-joined string: a stable scalar
    encoding for the harness's hash compare (same device as
    multimodal_features). Plan: posexplode → vocab join → one
    groupBy(doc) re-assembling with a doc-keyed sort — parallelism
    holds at corpus scale because everything is keyed on doc_id.

    The vocab join's broadcast hint is SIZE-GATED, not forced (see
    ``_maybe_broadcast_vocab``): broadcast below the Heaps'-law corpus
    threshold, shuffle join above it. SCALE.md "vocab joins"."""
    docs = read_table(spark, sf_dir, "documents")
    toks = _tokens(docs)
    vocab = training_vocab_build(spark, sf_dir).select("token", "vocab_id")
    return (
        toks.join(_maybe_broadcast_vocab(vocab, docs), "token", "left")
        .select(
            "doc_id", "pos",
            F.coalesce(F.col("vocab_id"), F.lit(0)).alias("vid"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # sort once inside the agg (struct order = pos first; pos is
            # unique per doc) instead of a per-row running-list window
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "vid"))),
                    lambda s: s.vid.cast("string"),
                ),
                ",",
            ).alias("token_ids"),
        )
    )


@register(
    "embedding_quantize_int8",
    """
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xs
        FROM embeddings
    ),
    m AS (
        SELECT vec_id, xs,
               list_max(list_transform(xs, x -> abs(x))) AS max_abs
        FROM e
    )
    SELECT vec_id, max_abs,
           array_to_string(
               list_transform(xs, x -> CAST(
                   CASE WHEN max_abs = 0 THEN 0
                        ELSE floor(x * 127 / max_abs + 0.5) END AS BIGINT)),
               ',') AS q8
    FROM m
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per vector (x → round(127·x/max|x|)).

    Rounding is ``floor(x + 0.5)`` — round-half-up in BOTH engines
    (Spark's round() is HALF_UP but DuckDB's is HALF_EVEN on doubles,
    so the naive round() would hash-mismatch on exact .5 ties). All
    arithmetic is elementwise IEEE on casted doubles — bit-identical.
    Output int8 lanes ride as a comma-joined string (the stable scalar
    encoding for the harness). Scan → project, no shuffle; the
    linear-per-element lambdas are the acceptable HOF shape (the O(n²)
    nested-lambda trap documented in operators/curation history does
    not apply).
    """
    e = read_table(spark, sf_dir, "embeddings")
    xs = F.transform("embedding", lambda x: x.cast("double"))
    mab = F.array_max(F.transform(xs, F.abs))
    d = e.select("vec_id", xs.alias("xs"), mab.alias("max_abs"))
    q = F.transform(
        "xs",
        lambda x: F.when(F.col("max_abs") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(x * 127 / F.col("max_abs") + F.lit(0.5)).cast("long")
        ),
    )
    return d.select(
        "vec_id",
        "max_abs",
        F.array_join(F.transform(q, lambda v: v.cast("string")), ",").alias("q8"),
    )


@register(
    "training_oov_rate",
    f"""
    WITH {_TOKS_CTE},
    cnt AS (
        SELECT token, count(*) AS n FROM toks
        GROUP BY 1 HAVING count(*) >= {MIN_FREQ}
    ),
    joined AS (
        SELECT d.source,
               CASE WHEN c.token IS NULL THEN 1 ELSE 0 END AS oov
        FROM toks t
        JOIN documents d ON t.doc_id = d.doc_id
        LEFT JOIN cnt c ON t.token = c.token
    )
    SELECT source, count(*) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           round(CAST(SUM(oov) AS DOUBLE) / count(*), 6) AS oov_rate
    FROM joined GROUP BY source
    """,
)
def training_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage QC: per corpus source, the fraction of token
    occurrences falling outside the MIN_FREQ vocabulary (what becomes
    unk id 0 in training_tokenize_docs) — the out-of-vocabulary rate a
    pipeline checks before committing to a tokenizer. Vocab membership
    is a left probe join, broadcast only below the size gate (see
    ``_maybe_broadcast_vocab``); one groupBy on source."""
    docs = read_table(spark, sf_dir, "documents")
    toks = _tokens(docs)
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MIN_FREQ)
        .select("token", F.lit(1).alias("__in_vocab"))
    )
    oov = F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
    return (
        toks.join(docs.select("doc_id", "source"), "doc_id")
        .join(_maybe_broadcast_vocab(vocab, docs), "token", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(oov).alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge induction (operators/bpe.py)
# ---------------------------------------------------------------------------

BPE_STEPS = 3


def _bpe_oracle(k: int) -> str:
    """Unrolled k-step BPE oracle: each step is a pair-count CTE, a
    1-row argmax CTE, and a merged word table feeding the next step —
    the SQL mirror of the operator's driver loop."""
    selects = "\n    UNION ALL ".join(
        f"SELECT CAST({s} AS BIGINT) AS step, pair,"
        f" replace(pair, ' ', '') AS new_symbol, cnt AS pair_count FROM b{s}"
        for s in range(1, k + 1)
    )
    # merges-only: the k-th merged word table is never consumed
    return "WITH " + ",".join(_bpe_ctes(k, apply_last=False)) + "\n    " + selects


def _bpe_ctes(k: int, apply_last: bool) -> list[str]:
    parts = [
        """
    wordcnt AS (
        SELECT tok AS word, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(string_split(trim(text), ' ')) AS tok
              FROM documents WHERE text IS NOT NULL) t
        WHERE tok <> '' GROUP BY 1
    ),
    w0 AS (
        SELECT word, n,
               ' ' || array_to_string(regexp_extract_all(word, '(?s).'), ' ')
                   || ' </w> ' AS sym
        FROM wordcnt
    )"""
    ]
    for s in range(1, k + 1):
        parts.append(f"""
    p{s} AS (
        SELECT ts[i] || ' ' || ts[i+1] AS pair,
               CAST(sum(n) AS BIGINT) AS cnt
        FROM (SELECT n, list_filter(string_split(sym, ' '),
                                    x -> x <> '') AS ts FROM w{s-1}) t,
             unnest(range(1, len(ts))) AS u(i)
        GROUP BY 1
    ),
    b{s} AS (SELECT pair, cnt FROM p{s} ORDER BY cnt DESC, pair LIMIT 1)""")
        if s < k or apply_last:
            # greedy left-to-right merge as a list_reduce state
            # machine — (out, pend) packed into one string on a \x01
            # separator (operators/bpe.py module docstring; a plain
            # string replace mis-groups self-pair runs)
            parts.append(f"""
    w{s} AS (
        SELECT word, n,
               (SELECT split_part(r, chr(1), 1)
                       || CASE WHEN split_part(r, chr(1), 2) <> ''
                               THEN ' ' || split_part(r, chr(1), 2)
                               ELSE '' END
                       || ' '
                FROM (SELECT list_reduce(
                    list_prepend(chr(1),
                        list_filter(string_split(sym, ' '),
                                    x -> x <> '')),
                    (acc, x) -> CASE
                        WHEN split_part(acc, chr(1), 2)
                                 = split_part(b{s}.pair, ' ', 1)
                             AND x = split_part(b{s}.pair, ' ', 2)
                        THEN split_part(acc, chr(1), 1) || ' '
                             || replace(b{s}.pair, ' ', '') || chr(1)
                        ELSE split_part(acc, chr(1), 1)
                             || CASE WHEN split_part(acc, chr(1), 2) <> ''
                                     THEN ' ' || split_part(acc, chr(1), 2)
                                     ELSE '' END
                             || chr(1) || x
                    END) AS r)
               ) AS sym
        FROM w{s-1} CROSS JOIN b{s}
    )""")
    return parts


@register("training_bpe_merges", _bpe_oracle(BPE_STEPS))
def training_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First k=3 BPE merges trained on the corpus (operators/bpe.py).

    The real subword-tokenizer induction step, in the scalable
    distinct-word form: per iteration one pair-count shuffle over the
    Heaps-law word table and ONE collected argmax row. The merge list
    IS the trained artifact — k rows out regardless of corpus size."""
    from ..operators.bpe import bpe_merge_steps

    return bpe_merge_steps(read_table(spark, sf_dir, "documents"), k=BPE_STEPS)


def _bpe_encode_oracle(k: int) -> str:
    """Encode oracle: the merge CTE chain with ALL k merges applied
    (``w{k}``), then per-doc subword totals through a word join."""
    return (
        "WITH "
        + ",".join(_bpe_ctes(k, apply_last=True))
        + f""",
    toks AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
            FROM documents WHERE text IS NOT NULL) t
        WHERE tok <> ''
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(list_filter(string_split(w.sym, ' '),
                                    x -> x <> ''))) AS BIGINT) AS n_subwords
    FROM toks t JOIN w{k} w ON w.word = t.tok
    GROUP BY 1
    """
    )


@register("training_bpe_encode", _bpe_encode_oracle(BPE_STEPS))
def training_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENCODE side of the BPE tokenizer (r7; completes the
    train-then-apply story of ``training_bpe_merges``): per document,
    token count and total subword count after the first k=3 trained
    merges.

    Scale shape: the word -> subword-sequence mapping is the
    Heaps-law-sized word table with the k merges applied (never
    corpus-sized), so encoding the corpus is ONE equi-join on ``word``
    plus a doc-keyed aggregation — the same join shape the vocab gate
    governs for ``training_tokenize_docs``. ``n_subwords`` counts the
    atomic ``</w>`` end-of-word marker as a symbol (it can merge into
    real subwords, so excluding it would be ill-defined); both engines
    count identically.

    Contract note (same as the unrolled merges oracle): a degenerate
    corpus exhausting its merge-able pairs before step k is outside
    the oracle's shape (the unrolled w{s} CTEs assume every step finds
    a pair); any corpus with one 3+-character word has >= k=3 steps,
    so all fixtures and any real corpus qualify."""
    from ..operators.bpe import bpe_encode_words

    docs = read_table(spark, sf_dir, "documents")
    nsub = F.size(F.filter(F.split("sym", " "), lambda x: x != F.lit("")))
    mapping = bpe_encode_words(docs, k=BPE_STEPS).select(
        "word", nsub.alias("n_sub")
    )
    toks = _tokens(docs).select("doc_id", F.col("token").alias("word"))
    return (
        toks.join(mapping, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_subwords"),
        )
    )
