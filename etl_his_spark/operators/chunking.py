"""Document chunking — the RAG/context-window prep operator.

Splits each document's token stream into fixed-size chunks with a
configurable overlap (the standard retrieval/embedding unit: big
enough to carry context, overlapping so no boundary sentence is lost
to both neighbors). Pure column expressions — ``sequence`` + ``slice``
over the token array, one explode, no shuffle at all: chunking is
map-only however big the corpus, and the chunk rows inherit the
input's partitioning for whatever embeds or indexes them next.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    size: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_id, chunk_text, n_chunk_tokens) with chunk
    ``i`` covering tokens ``[i·stride, i·stride + size)``,
    ``stride = size − overlap``.

    Tokenization is the corpus-wide single-space split (matches
    DuckDB's ``string_split`` exactly). Documents with no tokens
    yield no chunks; the last chunk is short rather than padded. The
    chunk count is ``ceil((n − overlap) / stride)`` — every token is
    covered, consecutive chunks share exactly ``overlap`` tokens, and
    no chunk starts beyond the last token.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    from ..functions.text import word_tokens

    stride = size - overlap
    toks: Column = word_tokens(text_col)
    n_chunks = F.greatest(
        F.lit(1), F.expr(f"(size(__toks) - {overlap} + {stride - 1}) div {stride}")
    )
    start = F.col("chunk_id") * stride
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(id_col, toks.alias("__toks"))
        .filter(F.size("__toks") > 0)
        .select(
            id_col,
            "__toks",
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.array_join(
                F.slice(F.col("__toks"), start + 1, size), " "
            ).alias("chunk_text"),
            F.least(
                F.lit(size), F.size("__toks") - start
            ).cast("long").alias("n_chunk_tokens"),
        )
    )
