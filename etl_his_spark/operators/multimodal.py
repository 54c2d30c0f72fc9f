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
- Image decode/resize have a REAL code path behind a runtime
  ``import PIL`` (``decoder="pil"`` / ``resize_image``): Pillow decode
  → grayscale → 16-bin luminance histogram, executed inside the same
  Arrow-batched ``mapInPandas`` stage. When Pillow is not installed
  (this container), those paths raise a NotImplementedError naming the
  dependency, and the deterministic fake (byte-histogram features,
  fixed frame splitter) remains available via ``allow_fake=True`` /
  ``decoder="fake"`` — it exercises the identical Spark plumbing
  (schema, batching, 1:N row fan-out). Video frame extraction stays a
  stub: it needs ffmpeg, which has no optional pure-Python fallback.
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


def pil_available() -> bool:
    """True when Pillow can be imported (runtime check, never required)."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _pil_image_features(b: bytes) -> list[float] | None:
    """Real image features: Pillow decode → grayscale → normalized
    16-bin luminance histogram. None for undecodable bytes (a real
    corpus has corrupt assets; dropping the row is the caller's call,
    a NULL feature vector keeps the error visible)."""
    from io import BytesIO

    from PIL import Image

    try:
        img = Image.open(BytesIO(b)).convert("L")
    except Exception:
        return None
    hist = img.histogram()  # 256 luminance bins
    width = 256 // N_FEATURES
    bins = [float(sum(hist[i * width : (i + 1) * width])) for i in range(N_FEATURES)]
    total = sum(bins) or 1.0
    return [v / total for v in bins]


def _fake_byte_features(b: bytes) -> list[float]:
    """Deterministic stand-in: normalized byte-value histogram mod 16."""
    hist = [0.0] * N_FEATURES
    for byte in b:
        hist[byte % N_FEATURES] += 1.0
    total = len(b) or 1
    return [h / total for h in hist]


def decode_media(
    media: DataFrame, allow_fake: bool = False, decoder: str = "auto"
) -> DataFrame:
    """Decode media bytes to a feature vector per asset.

    ``decoder`` picks the per-row decode function; the Spark contract
    (mapInPandas, Arrow batches, FEATURES_SCHEMA) is identical for all:

    - ``"pil"`` — REAL image decoding via Pillow (runtime import on
      the executor): grayscale 16-bin luminance histogram; NULL
      features for undecodable bytes. Raises NotImplementedError
      naming the dependency when Pillow is not installed.
    - ``"fake"`` — deterministic byte-histogram stub (requires
      ``allow_fake=True``): stable output for gates/tests, no codec.
    - ``"auto"`` — ``pil`` when Pillow is importable on the driver,
      else ``fake`` when ``allow_fake=True``, else raise.

    ``allow_fake=True`` with the default ``decoder="auto"`` keeps the
    historical stub behavior deterministic ONLY where Pillow is absent;
    gates that must be environment-independent pass ``decoder="fake"``.
    """
    if decoder == "auto":
        decoder = "pil" if pil_available() else "fake"
    if decoder == "pil" and not pil_available():
        raise NotImplementedError(
            "decoder='pil' requires Pillow (PIL), which is not installed "
            "in this environment; install Pillow or use decoder='fake' "
            "with allow_fake=True"
        )
    if decoder == "fake" and not allow_fake:
        raise NotImplementedError(
            "real media decoding needs PIL (not installed); "
            "pass allow_fake=True for the deterministic stub"
        )
    if decoder not in ("pil", "fake"):
        raise ValueError(f"unknown decoder: {decoder!r}")
    use_pil = decoder == "pil"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _pil_image_features if use_pil else _fake_byte_features
        for pdf in it:
            feats = [
                None if b is None else decode(b) for b in pdf["media_bytes"]
            ]
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
    """Image resize via Pillow (runtime import): decode → LANCZOS
    resize → re-encode PNG, per row inside an Arrow-batched
    ``mapInPandas`` stage; undecodable bytes yield NULL. Raises
    NotImplementedError naming the dependency when Pillow is missing —
    a resize has no meaningful fake."""
    if not pil_available():
        raise NotImplementedError(
            "image resize requires Pillow (PIL), not installed in this "
            "container; the pipeline slot exists so schemas/partitioning "
            "are designed in"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from io import BytesIO

        from PIL import Image

        def resize_one(b: bytes | None) -> bytes | None:
            if b is None:
                return None
            try:
                img = Image.open(BytesIO(b))
                out = BytesIO()
                img.resize((width, height), Image.LANCZOS).save(out, "PNG")
                return out.getvalue()
            except Exception:
                return None

        for pdf in it:
            resized = [resize_one(b) for b in pdf["media_bytes"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "media_bytes": resized,
                    "n_bytes": [
                        None if r is None else len(r) for r in resized
                    ],
                    "declared_width": [width] * len(pdf),
                    "declared_height": [height] * len(pdf),
                }
            )

    return media.mapInPandas(batches, MEDIA_SCHEMA)
