"""Multimodal queries — rows-only checks (binary + Pandas-UDF stages
are not SQL-expressible, per the driver contract's escape hatch)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import attach_fake_media, decode_media, frame_sample
from ..registry import register
from ..sources.readers import read_table


@register("multimodal_features")  # no oracle: mapInPandas over binary
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column → Arrow-batched feature extraction
    (deterministic stub decoder; real plumbing).

    The ``features array<double>`` column is projected to a stable
    scalar encoding (comma-joined %.6f renderings) because the driver's
    rows-only canonicalizer sorts/hashes cell values and cannot hash
    Python lists. The operator itself still returns the real array; only
    this contract query flattens it.
    """
    media = attach_fake_media(read_table(spark, sf_dir, "documents"))
    # decoder="fake" pinned explicitly: the gate's output must be
    # environment-independent (decoder="auto" would switch to the real
    # Pillow path wherever Pillow happens to be installed, and the fake
    # text-payload media isn't decodable imagery).
    decoded = decode_media(media, allow_fake=True, decoder="fake")
    return decoded.select(
        "media_id",
        "kind",
        "n_bytes",
        F.concat_ws(
            ",", F.transform("features", lambda x: F.format_string("%.6f", x))
        ).alias("features_enc"),
    )


@register(
    "multimodal_netpbm_decode",
    """
    SELECT doc_id AS media_id,
           CAST(75 AS BIGINT) AS n_bytes,
           array_to_string(
               list_transform(range(0, 16), i -> CASE
                   WHEN i = (doc_id % 256) // 16 THEN '1.000000'
                   ELSE '0.000000' END),
               ',') AS features_enc
    FROM documents
    """,
)
def multimodal_netpbm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode under a hard oracle — no codec library.

    Spark-side: each doc becomes a valid binary PGM (P5) built with
    pure column expressions — header + an 8x8 raster of the constant
    byte ``doc_id % 256`` via ``unhex`` — then decoded by the
    dependency-free netpbm lane (mapInPandas → numpy parse → BT.601
    luminance → 16-bin histogram). Because the image content is known
    analytically, DuckDB can state the expected histogram exactly
    (single 1.0 in bin ``(doc_id % 256) // 16``) WITHOUT doing any
    image work — a hash-verified end-to-end check of the real decode
    path: encoder, header parser, raster reshape, histogram, and the
    scalar encoding all have to be right for the hash to match.
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    v = F.pmod(F.col("doc_id"), F.lit(256)).cast("int")
    hexbyte = F.lpad(F.lower(F.hex(v)), 2, "0")
    raster = F.unhex(F.concat_ws("", F.array_repeat(hexbyte, 64)))
    media_bytes = F.concat(F.lit(b"P5\n8 8\n255\n"), raster)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        media_bytes.alias("media_bytes"),
        F.length(media_bytes).cast("long").alias("n_bytes"),
        F.lit(8).alias("declared_width"),
        F.lit(8).alias("declared_height"),
    )
    decoded = decode_media(media, decoder="netpbm")
    return decoded.select(
        "media_id",
        "n_bytes",
        F.concat_ws(
            ",", F.transform("features", lambda x: F.format_string("%.6f", x))
        ).alias("features_enc"),
    )


@register("multimodal_frame_sample")  # no oracle: 1:N binary fan-out
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: one media row → N frame rows via
    mapInPandas (stub splitter; real batch contract)."""
    media = attach_fake_media(read_table(spark, sf_dir, "documents"), kind="video")
    frames = frame_sample(media, every_n=2, allow_fake=True)
    return frames.select(
        "media_id", "frame_index", F.length("frame_bytes").alias("frame_len")
    )
