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


@register("multimodal_frame_sample")  # no oracle: 1:N binary fan-out
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: one media row → N frame rows via
    mapInPandas (stub splitter; real batch contract)."""
    media = attach_fake_media(read_table(spark, sf_dir, "documents"), kind="video")
    frames = frame_sample(media, every_n=2, allow_fake=True)
    return frames.select(
        "media_id", "frame_index", F.length("frame_bytes").alias("frame_len")
    )
