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
- Image decode/resize have REAL code paths: ``decoder="pil"`` (Pillow
  behind a runtime import — any format Pillow reads) and
  ``decoder="netpbm"`` (a dependency-free pure-numpy decoder for
  binary PGM/PPM — P5/P6 netpbm rasters), both producing the same
  grayscale 16-bin luminance histogram inside the same Arrow-batched
  ``mapInPandas`` stage. The netpbm lane exists so the real-decode
  contract is verifiable even where Pillow is not installed (this
  container): netpbm is a real interchange format and the decode math
  (BT.601 luminance, histogram binning) is the same. When Pillow is
  missing, ``decoder="pil"`` raises NotImplementedError naming the
  dependency; the deterministic fake (byte-histogram features, fixed
  frame splitter) remains available via ``allow_fake=True`` /
  ``decoder="fake"`` — it exercises the identical Spark plumbing
  (schema, batching, 1:N row fan-out). Video frame extraction has a
  REAL lane too: ``frame_sample(decoder="y4m")`` parses uncompressed
  YUV4MPEG2 and re-encodes each sampled frame's luminance plane as
  binary PGM, so frames feed straight into the netpbm image lane —
  only compressed containers (mp4/webm/...) still require ffmpeg,
  which has no pure-Python fallback. Audio likewise:
  ``decoder="wav"`` really decodes RIFF/WAVE PCM-16 (chunk walker,
  amplitude histogram) — every modality has a dependency-free real
  lane, with optional libraries only extending format coverage.
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


def ffmpeg_available() -> bool:
    """True when the ffmpeg binary is on PATH (runtime check, never
    required — the y4m/netpbm/wav lanes are dependency-free)."""
    import shutil

    return shutil.which("ffmpeg") is not None


def _ffmpeg_to_y4m(b: bytes) -> bytes | None:
    """Transcode any ffmpeg-readable video container to an
    uncompressed YUV4MPEG2 byte stream via pipes (no temp files), for
    ``parse_y4m``. None on decode failure/timeout — corrupt assets
    drop their rows, the corpus-decode contract.
    """
    import subprocess

    try:
        out = subprocess.run(
            [
                "ffmpeg", "-v", "error", "-i", "pipe:0",
                "-f", "yuv4mpegpipe", "-pix_fmt", "yuv420p", "pipe:1",
            ],
            input=b,
            capture_output=True,
            timeout=300,
        )
    except FileNotFoundError:
        # The binary missing on an EXECUTOR (the driver-side
        # availability gate can't see remote nodes) must fail the task
        # loudly — swallowing it would silently drop every compressed
        # asset and masquerade as "corrupt inputs".
        raise NotImplementedError(
            "ffmpeg is not installed on this executor; install it "
            "cluster-wide or use decoder='y4m'"
        )
    except Exception:
        return None
    if out.returncode != 0 or not out.stdout:
        return None
    return out.stdout


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


def parse_netpbm(b: bytes):
    """Decode a binary netpbm raster (P5 grayscale / P6 RGB, maxval ≤
    255) to a numpy array — HxW uint8 for P5, HxWx3 for P6. Returns
    None for anything else (corrupt bytes, ASCII variants, 16-bit).

    Pure numpy — no codec dependency; this is what makes the real
    decode lane testable in codec-less environments.
    """
    import numpy as np

    if not b or not b.startswith((b"P5", b"P6")):
        return None
    magic = b[:2].decode()
    pos = 2
    fields: list[int] = []
    try:
        while len(fields) < 3:
            # skip whitespace and '#' comments between header tokens
            while pos < len(b) and b[pos : pos + 1].isspace():
                pos += 1
            if b[pos : pos + 1] == b"#":
                while pos < len(b) and b[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(b) and not b[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(b[start:pos]))
        pos += 1  # single whitespace byte after maxval, then the raster
    except (ValueError, IndexError):
        return None
    w, h, maxval = fields
    if not (0 < w and 0 < h and 0 < maxval <= 255):
        return None
    channels = 1 if magic == "P5" else 3
    need = w * h * channels
    raster = b[pos : pos + need]
    if len(raster) != need:
        return None
    arr = np.frombuffer(raster, dtype=np.uint8)
    return arr.reshape(h, w) if channels == 1 else arr.reshape(h, w, 3)


def _netpbm_luminance(arr) -> "object":
    """uint8 luminance plane: identity for P5; for P6, Pillow's EXACT
    fixed-point ITU-R 601-2 formula ``L = (R*19595 + G*38470 + B*7471
    + 0x8000) >> 16`` (libImaging's L24/convert.c scheme) — not the
    textbook ``(299R+587G+114B)//1000``, whose truncation differs from
    Pillow's rounding on many triples (e.g. (1,3,210) → 25 vs 26) and
    could shift a pixel across a 16-bin histogram boundary. Using the
    identical arithmetic keeps the pil and netpbm lanes bit-for-bit
    equal on P6 inputs (cross-checked by the Pillow-gated lane-equality
    test in tests/test_multimodal.py)."""
    if arr.ndim == 2:
        return arr
    r = arr[..., 0].astype("uint32")
    g = arr[..., 1].astype("uint32")
    bch = arr[..., 2].astype("uint32")
    return ((r * 19595 + g * 38470 + bch * 7471 + 0x8000) >> 16).astype(
        "uint8"
    )


def _netpbm_image_features(b: bytes) -> list[float] | None:
    """Real image features without Pillow: netpbm decode → luminance →
    normalized 16-bin histogram (same output contract as the PIL lane).
    None for non-netpbm / corrupt bytes."""
    import numpy as np

    arr = parse_netpbm(b)
    if arr is None:
        return None
    lum = _netpbm_luminance(arr)
    hist = np.bincount(lum.ravel(), minlength=256).astype("float64")
    bins = hist.reshape(N_FEATURES, 256 // N_FEATURES).sum(axis=1)
    total = bins.sum() or 1.0
    return list(bins / total)


def _fake_byte_features(b: bytes) -> list[float]:
    """Deterministic stand-in: normalized byte-value histogram mod 16."""
    hist = [0.0] * N_FEATURES
    for byte in b:
        hist[byte % N_FEATURES] += 1.0
    total = len(b) or 1
    return [h / total for h in hist]


def decode_media(
    media: DataFrame,
    allow_fake: bool = False,
    decoder: str = "auto",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """Decode media bytes to a feature vector per asset.

    ``passthrough`` names extra input columns to carry into the output
    unchanged (e.g. ``frame_index`` when decoding frames produced by
    ``frame_sample`` — real pipelines need their metadata to survive
    the decode stage).

    ``decoder`` picks the per-row decode function; the Spark contract
    (mapInPandas, Arrow batches, FEATURES_SCHEMA) is identical for all:

    - ``"pil"`` — REAL image decoding via Pillow (runtime import on
      the executor): grayscale 16-bin luminance histogram; NULL
      features for undecodable bytes. Raises NotImplementedError
      naming the dependency when Pillow is not installed.
    - ``"netpbm"`` — REAL image decoding without any dependency:
      binary PGM/PPM parsed in numpy, BT.601 luminance, the same
      16-bin histogram; NULL features for non-netpbm bytes. Agrees
      with the PIL lane bit-for-bit on netpbm inputs.
    - ``"wav"`` — REAL audio decoding without any dependency:
      RIFF/WAVE PCM-16 parsed in numpy (chunk walker), normalized
      16-bin amplitude histogram; NULL features for non-WAV bytes.
      Compressed audio (mp3/ogg/...) needs ffmpeg/soundfile.
    - ``"fake"`` — deterministic byte-histogram stub (requires
      ``allow_fake=True``): stable output for gates/tests, no codec.
    - ``"auto"`` — ``pil`` when Pillow is importable on the driver,
      else ``netpbm`` (always-available real lane). NOTE the
      degradation this implies: on a JPEG/PNG corpus without Pillow,
      auto's netpbm fallback decodes nothing and every row comes back
      with NULL features — real but silent-looking. A RuntimeWarning
      is emitted at fallback time so the job log records that no
      general-format decoding is happening; pass ``decoder="pil"``
      to fail loudly instead.

    Gates that must be environment-independent pass an explicit
    decoder (the registered query pins ``decoder="fake"``).
    """
    if decoder == "auto":
        if pil_available():
            decoder = "pil"
        else:
            import warnings

            warnings.warn(
                "decode_media(decoder='auto'): Pillow is not installed — "
                "falling back to the netpbm-only lane. Non-netpbm media "
                "(JPEG/PNG/...) will yield NULL features; pass "
                "decoder='pil' to require Pillow loudly.",
                RuntimeWarning,
                stacklevel=2,
            )
            decoder = "netpbm"
    if decoder == "pil" and not pil_available():
        raise NotImplementedError(
            "decoder='pil' requires Pillow (PIL), which is not installed "
            "in this environment; install Pillow, or use decoder='netpbm' "
            "(dependency-free real lane) or decoder='fake' with "
            "allow_fake=True"
        )
    if decoder == "fake" and not allow_fake:
        raise NotImplementedError(
            "decoder='fake' is the no-codec stub; pass allow_fake=True "
            "to acknowledge, or use the real 'pil'/'netpbm' decoders"
        )
    if decoder not in ("pil", "netpbm", "wav", "wav_stats", "fake"):
        raise ValueError(f"unknown decoder: {decoder!r}")
    decoders = {
        "pil": _pil_image_features,
        "netpbm": _netpbm_image_features,
        "wav": _wav_audio_features,
        "wav_stats": _wav_stats_features,
        "fake": _fake_byte_features,
    }
    chosen = decoder
    out_schema = T.StructType(
        list(FEATURES_SCHEMA.fields)
        + [media.schema[c] for c in passthrough]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = decoders[chosen]
        for pdf in it:
            feats = [
                None if b is None else decode(b) for b in pdf["media_bytes"]
            ]
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["n_bytes"],
                "features": feats,
            }
            for c in passthrough:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, out_schema)


def _ahash_one(b: bytes | None) -> int | None:
    """64-bit average hash of one image via the real netpbm lane:
    decode → luminance → nearest-neighbor 8x8 downsample (identity for
    8x8 inputs — the same center-of-cell grid as resize_image) → mean
    threshold → row-major bit pack (bit j set iff pixel j > mean).
    None for undecodable bytes."""
    import numpy as np

    if b is None:
        return None
    arr = parse_netpbm(b)
    if arr is None:
        return None
    lum = _netpbm_luminance(arr)
    h, w = lum.shape
    rows = np.minimum(((np.arange(8) + 0.5) * h / 8).astype(int), h - 1)
    cols = np.minimum(((np.arange(8) + 0.5) * w / 8).astype(int), w - 1)
    small = lum[rows][:, cols].astype("float64").ravel()
    mean = small.mean()
    hsh = 0
    for j in range(64):
        if small[j] > mean:
            hsh |= 1 << j
    if hsh >= 1 << 63:  # wrap to signed int64 (bit 63 as sign bit)
        hsh -= 1 << 64
    return hsh


def perceptual_ahash(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """(id, ahash) — the classic perceptual fingerprint for image
    near-dup detection (average hash): Hamming distance between hashes
    approximates visual difference, so Hamming-blocked pairing
    (``dedup_approx.hamming_pairs_blocked``) finds visual duplicates
    with the same pigeonhole machinery as SimHash text dedup. Real
    decode, Arrow-batched ``mapInPandas``, 8 bytes per image out."""
    # Spread a narrow scan before the Python hash stage (r13): the
    # fixture media frame derives from a single parquet split, so the
    # Arrow-batched per-image numpy work would otherwise run in ONE
    # Python worker. Kept HERE only — the ahash per-row work is heavy
    # enough to pay for the shuffle (multimodal_image_dedup fresh-JVM
    # min 2.81 -> 1.81 s); the light decode lanes (wav/riff/y4m/png
    # walkers) measured WORSE with the same spread and keep their
    # narrow input (A/B in OPTIMIZATION_r13.md). Conditional no-op at
    # cluster scale (spread_small_input). NB (ADVICE r13): this frame
    # carries the raw image BYTES, so the spread's shuffle cost scales
    # with blob size, not row count — the measured win holds because
    # the per-row numpy work outweighs moving the fixture's blobs
    # once; re-measure before reusing the pattern on larger media.
    from .dedup_approx import spread_small_input

    media = spread_small_input(media)

    out_schema = T.StructType(
        [media.schema[id_col], T.StructField("ahash", T.LongType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "ahash": pd.array(
                        [_ahash_one(b) for b in pdf["media_bytes"]],
                        dtype="Int64",
                    ),
                }
            )

    return media.mapInPandas(batches, out_schema)


def parse_y4m(b: bytes):
    """Decode an uncompressed YUV4MPEG2 (``.y4m``) stream to
    ``(width, height, [Y-plane bytes per frame])`` — pure byte/numpy
    work, no codec dependency (the video analog of ``parse_netpbm``).

    Supports ``Cmono`` (luma only) and the planar ``C420*``/``C422``/
    ``C444`` colorspaces; only the Y (luminance) plane is extracted,
    chroma planes are skipped by size. Returns None for anything else
    (corrupt header, truncated frame, non-y4m bytes). Compressed
    containers (mp4/webm/...) still require ffmpeg — see
    ``frame_sample``.
    """
    if not b or not b.startswith(b"YUV4MPEG2"):
        return None
    nl = b.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    cs = "420"
    for tok in b[:nl].decode("ascii", "replace").split(" ")[1:]:
        if not tok:
            continue
        try:
            if tok[0] == "W":
                w = int(tok[1:])
            elif tok[0] == "H":
                h = int(tok[1:])
            elif tok[0] == "C":
                cs = tok[1:]
        except ValueError:
            return None
    if not w or not h or w <= 0 or h <= 0:
        return None
    ysize = w * h
    if cs.startswith("mono"):
        fsize = ysize
    elif cs.startswith("420"):
        fsize = ysize + ysize // 2
    elif cs.startswith("422"):
        fsize = ysize * 2
    elif cs.startswith("444"):
        fsize = ysize * 3
    else:
        return None
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(b):
        fnl = b.find(b"\n", pos)
        if fnl < 0 or not b[pos:fnl].startswith(b"FRAME"):
            return None
        pos = fnl + 1
        # The FULL frame (Y plane + chroma) must be present; checking
        # only the Y plane would accept a final frame whose chroma is
        # truncated — inconsistent corrupt-input handling vs a
        # truncated Y plane, which already returns None.
        if pos + fsize > len(b):
            return None
        frames.append(bytes(b[pos : pos + ysize]))
        pos += fsize
    return (w, h, frames)


def frame_sample(
    media: DataFrame,
    every_n: int = 2,
    allow_fake: bool = False,
    decoder: str = "fake",
) -> DataFrame:
    """Sample every n-th frame from video bytes (1:N row fan-out).

    - ``decoder="y4m"`` — REAL video decoding without any dependency:
      uncompressed YUV4MPEG2 parsed by ``parse_y4m``; each sampled
      frame's luminance plane is re-encoded as a binary PGM (P5), so
      the frames compose directly with the real image lane
      (``decode_media(decoder="netpbm")``, ``resize_image``).
      Non-y4m / corrupt media yield no frame rows.
    - ``decoder="fake"`` — deterministic stub (requires
      ``allow_fake=True``): frames are FRAME_BYTES-sized byte slices.
      Kept for environment-independent gates; compressed formats
      (mp4/webm/...) genuinely need ffmpeg, which has no pure-Python
      fallback — the y4m lane exists so the real 1:N decode contract
      is still verified end to end without it.
    """
    if decoder in ("y4m", "ffmpeg"):
        if decoder == "ffmpeg" and not ffmpeg_available():
            raise NotImplementedError(
                "decoder='ffmpeg' requires the ffmpeg binary on PATH "
                "(not installed in this environment); compressed video "
                "(mp4/webm/...) has no pure-Python fallback — use "
                "decoder='y4m' for uncompressed YUV4MPEG2 input, or "
                "decoder='fake' with allow_fake=True"
            )
        transcode = decoder == "ffmpeg"

        def y4m_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                ids, idxs, frames = [], [], []
                for mid, b in zip(pdf["media_id"], pdf["media_bytes"]):
                    if b is None:
                        continue
                    raw = bytes(b)
                    # ffmpeg lane: transcode any container ffmpeg can
                    # read into the SAME uncompressed y4m stream the
                    # dependency-free lane parses — one executor-local
                    # subprocess per asset, no temp files. Bytes that
                    # are already y4m skip the subprocess.
                    if transcode and not raw.startswith(b"YUV4MPEG2"):
                        raw = _ffmpeg_to_y4m(raw)
                        if raw is None:
                            continue
                    parsed = parse_y4m(raw)
                    if parsed is None:
                        continue
                    w, h, planes = parsed
                    header = f"P5\n{w} {h}\n255\n".encode()
                    for fi in range(0, len(planes), every_n):
                        ids.append(mid)
                        idxs.append(fi)
                        frames.append(header + planes[fi])
                yield pd.DataFrame(
                    {"media_id": ids, "frame_index": idxs, "frame_bytes": frames}
                )

        return media.mapInPandas(y4m_batches, FRAMES_SCHEMA)
    if decoder != "fake":
        raise ValueError(f"unknown decoder: {decoder!r}")
    if not allow_fake:
        raise NotImplementedError(
            "real frame extraction for compressed video needs ffmpeg "
            "(not installed); use decoder='y4m' for uncompressed "
            "YUV4MPEG2, or pass allow_fake=True for the deterministic "
            "stub"
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


def _netpbm_resize_bytes(b: bytes | None, width: int, height: int) -> bytes | None:
    """Nearest-neighbor resize of a binary PGM/PPM, re-encoded in the
    same format. Real image processing with zero dependencies; NULL
    for non-netpbm bytes."""
    import numpy as np

    if b is None:
        return None
    arr = parse_netpbm(b)
    if arr is None:
        return None
    h, w = arr.shape[:2]
    # standard nearest-neighbor sample grid: center of each target cell
    rows = np.minimum(((np.arange(height) + 0.5) * h / height).astype(int), h - 1)
    cols = np.minimum(((np.arange(width) + 0.5) * w / width).astype(int), w - 1)
    out = arr[rows][:, cols]
    magic = b"P5" if out.ndim == 2 else b"P6"
    header = magic + f"\n{width} {height}\n255\n".encode()
    return header + out.tobytes()


def resize_image(
    media: DataFrame, width: int, height: int, codec: str = "auto"
) -> DataFrame:
    """Image resize inside an Arrow-batched ``mapInPandas`` stage;
    undecodable bytes yield NULL.

    - ``codec="pil"`` — Pillow (runtime import): any input format,
      LANCZOS filter, re-encoded PNG. NotImplementedError naming the
      dependency when Pillow is missing.
    - ``codec="netpbm"`` — dependency-free real lane: binary PGM/PPM,
      nearest-neighbor, re-encoded in the same netpbm format.
    - ``codec="auto"`` — ``pil`` when importable, else ``netpbm``.
    """
    if codec == "auto":
        codec = "pil" if pil_available() else "netpbm"
    if codec == "pil" and not pil_available():
        raise NotImplementedError(
            "codec='pil' requires Pillow (PIL), not installed in this "
            "container; use codec='netpbm' for the dependency-free lane"
        )
    if codec not in ("pil", "netpbm"):
        raise ValueError(f"unknown codec: {codec!r}")
    use_pil = codec == "pil"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_pil:
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

        else:

            def resize_one(b: bytes | None) -> bytes | None:
                return _netpbm_resize_bytes(b, width, height)

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


def parse_wav(b: bytes):
    """Decode a RIFF/WAVE PCM file to ``(sample_rate, n_channels,
    int16 numpy samples — interleaved)`` — pure byte/numpy work, no
    codec dependency (the audio analog of ``parse_netpbm`` /
    ``parse_y4m``). Supports PCM (format 1) at 16 bits; walks chunks
    so extra metadata chunks (LIST, fact, ...) are skipped. Returns
    None for anything else (compressed codecs need ffmpeg/soundfile).
    """
    import numpy as np

    if not b or len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        csize = int.from_bytes(b[pos + 4 : pos + 8], "little")
        body = b[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            audio_fmt = int.from_bytes(body[0:2], "little")
            n_ch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_fmt != 1 or bits != 16 or n_ch < 1:
                return None
            fmt = (rate, n_ch)
        elif cid == b"data":
            if fmt is None or len(body) != csize or csize % 2 != 0:
                return None
            samples = np.frombuffer(body, dtype="<i2")
            return (fmt[0], fmt[1], samples)
        # chunks are word-aligned: odd sizes carry a pad byte
        pos += 8 + csize + (csize % 2)
    return None


def _wav_stats_features(b: bytes) -> list[float] | None:
    """Exact sample statistics from a real WAV PCM decode:
    [n_samples, sum_samples, sum_squares] — each an integer computed
    in int64 and returned as float64 (exact below 2^53, the driver
    canonicalizer's own integer-exactness bound). The loudness/DC
    statistics an audio-curation pass aggregates; unlike the
    normalized histogram these are hash-verifiable as integers.
    None for non-WAV / corrupt bytes."""
    import numpy as np

    parsed = parse_wav(b)
    if parsed is None:
        return None
    _, _, samples = parsed
    if len(samples) == 0:
        return None
    s64 = samples.astype(np.int64)
    return [
        float(len(s64)),
        float(int(s64.sum())),
        float(int((s64 * s64).sum())),
    ]


def _wav_audio_features(b: bytes) -> list[float] | None:
    """Real audio features without any dependency: WAV PCM decode →
    normalized 16-bin amplitude histogram (signed int16 range split
    into 4096-wide bins — the audio analog of the luminance
    histogram). None for non-WAV / corrupt bytes."""
    import numpy as np

    parsed = parse_wav(b)
    if parsed is None:
        return None
    _, _, samples = parsed
    if len(samples) == 0:
        return None
    bins = ((samples.astype(np.int32) + 32768) // 4096).clip(0, N_FEATURES - 1)
    hist = np.bincount(bins, minlength=N_FEATURES).astype("float64")
    total = hist.sum() or 1.0
    return list(hist / total)


# ---------------------------------------------------------------------------
# Container metadata walk (RIFF) — the dependency-free chunk-index lane
# ---------------------------------------------------------------------------

CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("form", T.StringType(), True),  # RIFF form, e.g. WAVE
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("chunk_offset", T.LongType(), False),
        T.StructField("chunk_size", T.LongType(), False),
    ]
)


def parse_riff_chunks(b: bytes):
    """Walk a RIFF container's top-level chunk index WITHOUT decoding
    payloads: yields ``(form, chunk_id, header_offset, size)`` per
    chunk — the container-metadata pass an ingest pipeline runs to
    census assets (which chunks exist, how big, where) before deciding
    what to decode at all. Pure byte arithmetic (the ``parse_wav``
    walking loop, metadata-only): word-aligned stepping, truncated
    trailing chunks dropped. Returns [] for non-RIFF bytes.
    """
    if not b or len(b) < 12 or b[:4] != b"RIFF":
        return []
    form = b[8:12].decode("latin-1")
    out = []
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4].decode("latin-1")
        csize = int.from_bytes(b[pos + 4 : pos + 8], "little")
        if pos + 8 + csize > len(b):  # truncated chunk: stop the walk
            break
        out.append((form, cid, pos, csize))
        pos += 8 + csize + (csize % 2)  # word alignment pad
    return out


def riff_chunks(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Chunk index rows for every RIFF asset (1:N fan-out, like
    ``frame_sample``): (media_id, form, chunk_id, chunk_offset,
    chunk_size). Arrow-batched ``mapInPandas`` over the binary column
    — per-asset work is the byte walk only (no payload decode), so the
    lane is metadata-priced at any corpus size; non-RIFF assets yield
    no rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, forms, cids, offs, sizes = [], [], [], [], []
            # the select below aliases id_col -> media_id, so the batch
            # iterator must read the POST-select name (ADVICE r12 low)
            for mid, b in zip(pdf["media_id"], pdf["media_bytes"]):
                if b is None:
                    continue
                for form, cid, off, size in parse_riff_chunks(bytes(b)):
                    ids.append(mid)
                    forms.append(form)
                    cids.append(cid)
                    offs.append(off)
                    sizes.append(size)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "form": pd.Series(forms, dtype="object"),
                    "chunk_id": pd.Series(cids, dtype="object"),
                    "chunk_offset": pd.Series(offs, dtype="int64"),
                    "chunk_size": pd.Series(sizes, dtype="int64"),
                }
            )

    return media.select(F.col(id_col).alias("media_id"), "media_bytes").mapInPandas(
        batches, CHUNKS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Container metadata walk (PNG) — big-endian lengths + CRC validation
# ---------------------------------------------------------------------------

PNG_CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("chunk_type", T.StringType(), False),
        T.StructField("chunk_offset", T.LongType(), False),
        T.StructField("chunk_length", T.LongType(), False),
        T.StructField("crc_ok", T.BooleanType(), False),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def parse_png_chunks(b: bytes):
    """Walk a PNG's chunk index AND validate each chunk's CRC-32
    (computed over type+payload, the PNG spec rule) — the integrity
    census an ingest pipeline runs on image assets before decode:
    a bad CRC means truncated/corrupted bytes that a decoder would
    reject later and more expensively. Big-endian lengths (the RIFF
    walker's little-endian complement). Yields
    ``(chunk_type, header_offset, length, crc_ok)``; returns [] for
    non-PNG bytes; stops at a truncated chunk.
    """
    import zlib

    if not b or len(b) < 16 or b[:8] != _PNG_SIG:
        return []
    out = []
    pos = 8
    while pos + 8 <= len(b):
        length = int.from_bytes(b[pos : pos + 4], "big")
        ctype = b[pos + 4 : pos + 8].decode("latin-1")
        end = pos + 8 + length + 4
        if end > len(b):  # truncated chunk: stop the walk
            break
        payload = b[pos + 8 : pos + 8 + length]
        crc = int.from_bytes(b[pos + 8 + length : end], "big")
        crc_ok = zlib.crc32(b[pos + 4 : pos + 8] + payload) == crc
        out.append((ctype, pos, length, crc_ok))
        pos = end
        if ctype == "IEND":
            break
    return out


def png_chunks(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """PNG chunk-index rows with CRC validation for every asset
    (1:N fan-out, the ``riff_chunks`` shape): Arrow-batched
    ``mapInPandas`` over the binary column; per-asset work is the
    byte walk + one CRC pass over the bytes — no image decode."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, types, offs, lens, oks = [], [], [], [], []
            # post-select name, not id_col (ADVICE r12 low — see
            # riff_chunks)
            for mid, b in zip(pdf["media_id"], pdf["media_bytes"]):
                if b is None:
                    continue
                for ctype, off, length, ok in parse_png_chunks(bytes(b)):
                    ids.append(mid)
                    types.append(ctype)
                    offs.append(off)
                    lens.append(length)
                    oks.append(ok)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "chunk_type": pd.Series(types, dtype="object"),
                    "chunk_offset": pd.Series(offs, dtype="int64"),
                    "chunk_length": pd.Series(lens, dtype="int64"),
                    "crc_ok": pd.Series(oks, dtype="bool"),
                }
            )

    return media.select(
        F.col(id_col).alias("media_id"), "media_bytes"
    ).mapInPandas(batches, PNG_CHUNKS_SCHEMA)
