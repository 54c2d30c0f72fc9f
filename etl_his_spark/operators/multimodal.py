"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for a 100 TB multimodal corpus:

- Media travels as a ``binary`` column next to typed metadata (kind,
  byte size, declared dims) — one row per asset, parquet-encoded, so
  partition pruning and column projection behave like any other column
  and the bytes are only read by stages that need them.
- Decode / feature-extract / frame-sample are Arrow-batched
  ``mapInPandas`` stages: Python touches each batch once, the schema
  contract is explicit, and the stage parallelizes per partition like
  any narrow transform.
- The actual codec work (PIL/ffmpeg/librosa) is NOT available in this
  environment, so decode is STUBBED: ``decode_media`` raises
  NotImplementedError unless ``allow_fake=True``, in which case a
  clearly-marked deterministic fake (byte-histogram features, fixed
  frame splitter) exercises the identical Spark plumbing — schema,
  batching, 1:N row fan-out — that a real decoder would use.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_FEATURES = 16
FRAME_BYTES = 64

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("media_bytes", T.BinaryType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("declared_width", T.IntegerType(), True),
        T.StructField("declared_height", T.IntegerType(), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def attach_fake_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Test/dev helper: deterministic fake media from document text.

    The bytes are the UTF-8 text — a stand-in payload with the same
    column shape a real ingest (S3 blob fetch, tar unpacking) produces.
    """
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("media_bytes"),
        F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        F.lit(None).cast("int").alias("declared_width"),
        F.lit(None).cast("int").alias("declared_height"),
    )


def decode_media(media: DataFrame, allow_fake: bool = False) -> DataFrame:
    """Decode media to features. STUB: no codec libs in this container.

    With ``allow_fake=True`` a deterministic byte-histogram stands in
    for real features; the Spark contract (mapInPandas, Arrow batches,
    FEATURES_SCHEMA) is exactly what a real decoder would use — swap
    the inner function, keep the plumbing.
    """
    if not allow_fake:
        raise NotImplementedError(
            "real media decoding needs PIL/ffmpeg/librosa (not installed); "
            "pass allow_fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf["media_bytes"]:
                if b is None:
                    feats.append(None)
                    continue
                hist = [0.0] * N_FEATURES
                for byte in b:
                    hist[byte % N_FEATURES] += 1.0
                total = len(b) or 1
                feats.append([h / total for h in hist])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def frame_sample(
    media: DataFrame, every_n: int = 2, allow_fake: bool = False
) -> DataFrame:
    """Sample every n-th fixed-size 'frame' from video bytes (1:N rows).

    STUB decoder: frames are FRAME_BYTES-sized byte slices. The row
    fan-out shape (one input row → many frame rows, batch-preserving)
    is the real contract a video pipeline needs from Spark.
    """
    if not allow_fake:
        raise NotImplementedError(
            "real frame extraction needs ffmpeg (not installed); "
            "pass allow_fake=True for the deterministic stub"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["media_bytes"]):
                if b is None:
                    continue
                n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(bytes(b[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_bytes": frames}
            )

    return media.mapInPandas(batches, FRAMES_SCHEMA)


def resize_image(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize — hard stub: meaningless without a real codec."""
    raise NotImplementedError(
        "image resize requires PIL (not installed in this container); "
        "the pipeline slot exists so schemas/partitioning are designed in"
    )
