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
    (deterministic stub decoder; real plumbing)."""
    media = attach_fake_media(read_table(spark, sf_dir, "documents"))
    return decode_media(media, allow_fake=True)


@register("multimodal_frame_sample")  # no oracle: 1:N binary fan-out
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: one media row → N frame rows via
    mapInPandas (stub splitter; real batch contract)."""
    media = attach_fake_media(read_table(spark, sf_dir, "documents"), kind="video")
    frames = frame_sample(media, every_n=2, allow_fake=True)
    return frames.select(
        "media_id", "frame_index", F.length("frame_bytes").alias("frame_len")
    )
