"""Multimodal plumbing tests — schema, Arrow batching, 1:N fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_his_spark.operators.multimodal import (
    FRAME_BYTES,
    N_FEATURES,
    attach_fake_media,
    decode_media,
    frame_sample,
    pil_available,
    resize_image,
)
from etl_his_spark.sources.readers import read_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return attach_fake_media(read_table(spark, sf_dir, "documents"))


def test_media_schema_and_bytes(media):
    row = media.filter(F.col("media_id") == 0).first()
    assert isinstance(row["media_bytes"], (bytes, bytearray))
    assert row["n_bytes"] == len(row["media_bytes"])
    assert row["kind"] == "image"


def test_decode_stub_gate_raises(media):
    """Environment-gate contract (no skips either way): the 'fake'
    decoder always raises without allow_fake=True; the Pillow lanes
    raise a loud NotImplementedError naming the dependency when PIL is
    absent (the sandbox has no package-index route — install attempts
    r9 and r13 both failed on DNS), and construct fine when present
    (their real behavior is then covered by the branching lane tests
    below)."""
    with pytest.raises(NotImplementedError):
        decode_media(media, decoder="fake")  # fake needs allow_fake=True
    if pil_available():
        decode_media(media, decoder="pil")  # constructs; no gate raise
        resize_image(media, 224, 224, codec="pil")
    else:
        with pytest.raises(NotImplementedError, match="[Pp]illow|PIL"):
            decode_media(media, decoder="pil")
        with pytest.raises(NotImplementedError, match="[Pp]illow|PIL"):
            resize_image(media, 224, 224, codec="pil")


def _pgm(pixels: list[list[int]]) -> bytes:
    """Binary PGM (P5) encoder for golden test images."""
    h, w = len(pixels), len(pixels[0])
    body = bytes(v for row in pixels for v in row)
    return b"P5\n# golden\n" + f"{w} {h}\n255\n".encode() + body


def _ppm(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    h, w = len(pixels), len(pixels[0])
    body = bytes(c for row in pixels for px in row for c in px)
    return f"P6\n{w} {h}\n255\n".encode() + body


def test_decode_netpbm_real_images(spark):
    """Dependency-free REAL decode lane: golden PGM/PPM rasters through
    decoder='netpbm' — exact luminance histograms, no codec library."""
    from etl_his_spark.operators.multimodal import MEDIA_SCHEMA

    black = _pgm([[0] * 4 for _ in range(4)])
    white = _pgm([[255] * 4 for _ in range(4)])
    # pure red 2x2: Pillow fixed-point L = (255*19595 + 0x8000) >> 16
    # = 76 → bin 76//16 = 4
    red = _ppm([[(255, 0, 0)] * 2 for _ in range(2)])
    junk = b"not an image"
    rows = [
        (0, "image", black, len(black), 4, 4),
        (1, "image", white, len(white), 4, 4),
        (2, "image", red, len(red), 2, 2),
        (3, "image", junk, len(junk), None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {
        r["media_id"]: r["features"]
        for r in decode_media(media, decoder="netpbm").collect()
    }
    assert feats[0][0] == 1.0  # all-black: lowest luminance bin
    assert feats[1][-1] == 1.0  # all-white: highest luminance bin
    assert feats[2][76 // 16] == 1.0  # red → luminance 76
    assert feats[3] is None  # corrupt asset stays visible as NULL


def test_netpbm_and_pil_lanes_agree_on_p6(spark):
    """The claim the netpbm luminance formula makes — bit-for-bit
    agreement with Pillow's convert('L') — checked where Pillow exists,
    over triples (including (1,3,210), where the textbook
    299/587/114//1000 formula disagrees with Pillow by 1). Where the
    environment lacks Pillow (this sandbox: no package-index route),
    the branch instead asserts the lane's LOUD gate — no silent
    skip."""
    from etl_his_spark.operators.multimodal import MEDIA_SCHEMA

    triples = [
        (1, 3, 210), (255, 0, 0), (0, 255, 0), (0, 0, 255),
        (17, 200, 33), (128, 128, 128), (254, 1, 7), (90, 200, 250),
    ]
    rows = []
    for i, t in enumerate(triples):
        img = _ppm([[t] * 4 for _ in range(4)])
        rows.append((i, "image", img, len(img), 4, 4))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    if not pil_available():
        with pytest.raises(NotImplementedError, match="[Pp]illow|PIL"):
            decode_media(media, decoder="pil")
        return
    by_lane = {}
    for lane in ("netpbm", "pil"):
        by_lane[lane] = {
            r["media_id"]: r["features"]
            for r in decode_media(media, decoder=lane).collect()
        }
    assert by_lane["netpbm"] == by_lane["pil"]


def test_resize_netpbm_nearest_neighbor(spark):
    from etl_his_spark.operators.multimodal import MEDIA_SCHEMA, parse_netpbm

    # 4x4 quadrant image: TL=10 TR=20 BL=30 BR=40; 2x2 nearest-neighbor
    # at cell centers samples one pixel per quadrant.
    px = [
        [10, 10, 20, 20],
        [10, 10, 20, 20],
        [30, 30, 40, 40],
        [30, 30, 40, 40],
    ]
    img = _pgm(px)
    media = spark.createDataFrame([(0, "image", img, len(img), 4, 4)], MEDIA_SCHEMA)
    out = resize_image(media, 2, 2, codec="netpbm").collect()[0]
    assert out["declared_width"] == 2 and out["declared_height"] == 2
    arr = parse_netpbm(bytes(out["media_bytes"]))
    assert arr.tolist() == [[10, 20], [30, 40]]


def test_decode_pil_real_images(spark):
    """Real Pillow path: synthetic PNGs through decoder='pil' —
    luminance histograms normalize to 1 and separate black from white.
    Without Pillow (this sandbox), asserts the lane's loud gate
    instead — no silent skip; the decode math itself stays proven
    end-to-end by the dependency-free netpbm lane."""
    if not pil_available():
        from etl_his_spark.operators.multimodal import MEDIA_SCHEMA

        media = spark.createDataFrame(
            [(0, "image", b"\x89PNG fake", 9, None, None)], MEDIA_SCHEMA
        )
        with pytest.raises(NotImplementedError, match="[Pp]illow|PIL"):
            decode_media(media, decoder="pil")
        return
    from io import BytesIO

    from PIL import Image

    def png(color):
        buf = BytesIO()
        Image.new("L", (8, 8), color).save(buf, "PNG")
        return buf.getvalue()

    rows = [(0, "image", png(0), None, None, None),
            (1, "image", png(255), None, None, None)]
    from etl_his_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(
        [(i, k, b, len(b), w, h) for i, k, b, _, w, h in rows], MEDIA_SCHEMA
    )
    feats = {r["media_id"]: r["features"]
             for r in decode_media(media, decoder="pil").collect()}
    assert abs(sum(feats[0]) - 1.0) < 1e-9
    assert feats[0][0] == 1.0   # all-black image: lowest luminance bin
    assert feats[1][-1] == 1.0  # all-white image: highest luminance bin
    resized = resize_image(media, 4, 4).collect()
    assert all(r["declared_width"] == 4 for r in resized)
    assert all(Image.open(BytesIO(bytes(r["media_bytes"]))).size == (4, 4)
               for r in resized)


def test_decode_features_deterministic(spark, media):
    out = decode_media(media, allow_fake=True, decoder="fake")
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == media.count()
    f0 = rows[0]["features"]
    assert len(f0) == N_FEATURES
    assert abs(sum(f0) - 1.0) < 1e-9  # histogram normalized
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in
             decode_media(media, allow_fake=True, decoder="fake").collect()}
    assert again[0] == f0


def test_frame_sample_fanout(spark, media):
    frames = frame_sample(media, every_n=2, allow_fake=True)
    counts = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    sizes = {r["media_id"]: r["n_bytes"] for r in media.collect()}
    for mid, n in counts.items():
        total_frames = (sizes[mid] + FRAME_BYTES - 1) // FRAME_BYTES
        assert n == (total_frames + 1) // 2  # every 2nd frame
    # frame bytes bounded
    bad = frames.filter(F.length("frame_bytes") > FRAME_BYTES).count()
    assert bad == 0


def _y4m(frames: list[bytes], w: int, h: int, cs: str = "mono",
         chroma: bytes = b"") -> bytes:
    header = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{cs}\n".encode()
    return header + b"".join(b"FRAME\n" + f + chroma for f in frames)


def test_parse_y4m_real_decode(spark):
    """parse_y4m: mono and 4:2:0 layouts, Y-plane extraction, corrupt
    inputs — the dependency-free REAL video lane."""
    from etl_his_spark.operators.multimodal import parse_y4m

    y0, y1 = bytes([10] * 16), bytes([200] * 16)
    w, h, frames = parse_y4m(_y4m([y0, y1], 4, 4))
    assert (w, h) == (4, 4) and frames == [y0, y1]
    # 4:2:0: U+V planes (ysize/2 bytes) are skipped, Y still exact
    chroma = bytes([128] * 8)
    w, h, frames = parse_y4m(_y4m([y0, y1], 4, 4, cs="420jpeg", chroma=chroma))
    assert frames == [y0, y1]
    assert parse_y4m(b"not a video") is None
    assert parse_y4m(_y4m([y0], 4, 4)[:-3]) is None  # truncated frame
    assert parse_y4m(b"YUV4MPEG2 W4 H4 Cmono\nJUNK\n" + y0) is None


def test_frame_sample_y4m_composes_with_netpbm_decode(spark):
    """The real video pipeline end to end: y4m → every-2nd-frame PGM →
    netpbm decode; frame luminance histograms land in the right bins."""
    from etl_his_spark.operators.multimodal import MEDIA_SCHEMA

    planes = [bytes([v] * 64) for v in (5, 100, 250)]
    vid = _y4m(planes, 8, 8)
    junk = b"definitely not yuv4mpeg2"
    media = spark.createDataFrame(
        [(0, "video", vid, len(vid), 8, 8),
         (1, "video", junk, len(junk), None, None)],
        MEDIA_SCHEMA,
    )
    frames = frame_sample(media, every_n=2, decoder="y4m")
    rows = frames.collect()
    assert {(r["media_id"], r["frame_index"]) for r in rows} == {(0, 0), (0, 2)}
    fmedia = frames.select(
        "media_id", F.lit("image").alias("kind"),
        F.col("frame_bytes").alias("media_bytes"),
        F.length("frame_bytes").cast("long").alias("n_bytes"),
        F.lit(None).cast("int").alias("declared_width"),
        F.lit(None).cast("int").alias("declared_height"),
        "frame_index",
    )
    decoded = decode_media(fmedia, decoder="netpbm",
                           passthrough=("frame_index",))
    feats = {r["frame_index"]: r["features"] for r in decoded.collect()}
    assert feats[0][5 // 16] == 1.0    # frame 0: constant 5 → bin 0
    assert feats[2][250 // 16] == 1.0  # frame 2: constant 250 → bin 15


def _wav(samples: list[int], n_ch: int = 1, rate: int = 8000,
         extra_chunk: bytes = b"") -> bytes:
    import struct
    data = b"".join(struct.pack("<h", s) for s in samples)
    return (
        b"RIFF" + (36 + len(extra_chunk) + len(data)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + n_ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * 2 * n_ch).to_bytes(4, "little")
        + (2 * n_ch).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + extra_chunk
        + b"data" + len(data).to_bytes(4, "little") + data
    )


def test_parse_wav_real_decode(spark):
    """parse_wav: PCM-16 mono/stereo, chunk skipping, corrupt inputs —
    the dependency-free REAL audio lane."""
    from etl_his_spark.operators.multimodal import parse_wav

    rate, ch, s = parse_wav(_wav([0, 100, -100, 32767, -32768]))
    assert (rate, ch) == (8000, 1)
    assert s.tolist() == [0, 100, -100, 32767, -32768]
    # stereo interleaved + an extra LIST chunk between fmt and data
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    rate, ch, s = parse_wav(_wav([1, 2, 3, 4], n_ch=2, extra_chunk=extra))
    assert ch == 2 and s.tolist() == [1, 2, 3, 4]
    assert parse_wav(b"not audio at all") is None
    assert parse_wav(_wav([1, 2, 3])[:-2]) is None  # truncated data


def test_decode_wav_features(spark):
    """WAV lane through decode_media: amplitude histogram bins."""
    from etl_his_spark.operators.multimodal import MEDIA_SCHEMA

    silent = _wav([0] * 64)          # 0 -> bin (0+32768)//4096 = 8
    loud = _wav([32767] * 64)        # -> bin 15
    quietneg = _wav([-32768] * 64)   # -> bin 0
    junk = b"definitely not riff"
    rows = [
        (0, "audio", silent, len(silent), None, None),
        (1, "audio", loud, len(loud), None, None),
        (2, "audio", quietneg, len(quietneg), None, None),
        (3, "audio", junk, len(junk), None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r["media_id"]: r["features"]
             for r in decode_media(media, decoder="wav").collect()}
    assert feats[0][8] == 1.0
    assert feats[1][15] == 1.0
    assert feats[2][0] == 1.0
    assert feats[3] is None


def test_frame_sample_ffmpeg_transcodes_to_y4m_lane(spark):
    """Branching env-gate (no skips either way, like the Pillow
    lanes): with ffmpeg present, already-y4m bytes bypass the
    subprocess and produce the same frames as decoder='y4m' (non-y4m
    bytes go through the pipe-only transcode); without it (this
    sandbox has no ffmpeg binary and no install route), the lane
    raises a loud construction-time NotImplementedError naming the
    dependency, before any Spark job."""
    from etl_his_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        ffmpeg_available,
    )

    planes = [bytes([v] * 64) for v in (5, 100, 250)]
    vid = _y4m(planes, 8, 8)
    media = spark.createDataFrame(
        [(0, "video", vid, len(vid), 8, 8)], MEDIA_SCHEMA
    )
    if not ffmpeg_available():
        with pytest.raises(NotImplementedError, match="ffmpeg"):
            frame_sample(media, decoder="ffmpeg")
        return
    via_ffmpeg = {
        (r["media_id"], r["frame_index"], bytes(r["frame_bytes"]))
        for r in frame_sample(media, every_n=2, decoder="ffmpeg").collect()
    }
    via_y4m = {
        (r["media_id"], r["frame_index"], bytes(r["frame_bytes"]))
        for r in frame_sample(media, every_n=2, decoder="y4m").collect()
    }
    assert via_ffmpeg == via_y4m


def test_wav_stats_features_reference_and_corrupt():
    import struct

    from etl_his_spark.operators.multimodal import _wav_stats_features
    from etl_his_spark.plans.queries_multimodal import _wav_header

    samples = [3, -5, 100, -32768, 32767, 0]
    data = b"".join(struct.pack("<h", s) for s in samples)
    wav = _wav_header(len(samples)) + data
    got = _wav_stats_features(wav)
    assert got == [
        float(len(samples)),
        float(sum(samples)),
        float(sum(s * s for s in samples)),
    ]
    assert _wav_stats_features(b"not a wav") is None
    assert _wav_stats_features(wav[:20]) is None


def test_ahash_reference_cases():
    """_ahash_one against hand-computable rasters: prefix PGM (the
    oracle's analytic case), a 16x16 downsample case, a P6 color
    raster, the all-dark image, sign-bit wrap, and corrupt bytes."""
    from etl_his_spark.operators.multimodal import _ahash_one

    # 8x8 prefix raster: k white pixels -> hash 2^k - 1
    for k in (0, 1, 7, 31, 47):
        b = b"P5\n8 8\n255\n" + b"\xff" * k + b"\x00" * (64 - k)
        assert _ahash_one(b) == (1 << k) - 1, k
    # 16x16 input: nearest-neighbor center grid samples odd rows/cols;
    # make top half white, bottom half black -> 8x8 top 4 rows white
    b16 = b"P5\n16 16\n255\n" + b"\xff" * 128 + b"\x00" * 128
    assert _ahash_one(b16) == (1 << 32) - 1
    # P6 color: pure-red top half vs black bottom; red luminance 76>mean
    b6 = b"P6\n8 8\n255\n" + b"\xff\x00\x00" * 32 + b"\x00\x00\x00" * 32
    assert _ahash_one(b6) == (1 << 32) - 1
    # bit 63 participates: single white pixel in the LAST position of
    # an otherwise-dark-but-nonuniform raster -> negative (signed wrap)
    b63 = b"P5\n8 8\n255\n" + b"\x00" * 63 + b"\xff"
    assert _ahash_one(b63) == -(1 << 63)
    # uniform image: nothing strictly above the mean -> hash 0
    assert _ahash_one(b"P5\n8 8\n255\n" + b"\x80" * 64) == 0
    assert _ahash_one(b"not an image") is None
    assert _ahash_one(None) is None


def test_image_dedup_degree_matches_arithmetic(spark, sf_dir):
    """multimodal_image_dedup: n_near equals the doc_id%48 arithmetic
    and the hash is the analytic prefix value — checked in Python
    (independent of the DuckDB oracle)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from etl_his_spark.registry import QUERIES

    ids = [
        r["doc_id"]
        for r in pq.read_table(f"{sf_dir}/documents.parquet").to_pylist()
    ]
    kc = Counter(i % 48 for i in ids)
    out = {
        r["media_id"]: (r["ahash"], r["n_near"])
        for r in QUERIES["multimodal_image_dedup"](spark, sf_dir).collect()
    }
    assert set(out) == set(ids)
    for i in ids:
        k = i % 48
        want_near = sum(kc.get(kk, 0) for kk in (k - 1, k, k + 1)) - 1
        assert out[i] == ((1 << k) - 1, want_near), i


def test_parse_riff_chunks_walk_and_edges():
    """Pure-byte RIFF chunk walk: offsets/sizes/alignment, truncation
    and non-RIFF handling (no Spark, no codec)."""
    from etl_his_spark.operators.multimodal import parse_riff_chunks

    def le32(v):
        return v.to_bytes(4, "little")

    fmt_payload = bytes(16)
    note_payload = b"\xab\xab\xab"  # odd size 3 -> pad byte follows
    data_payload = b"\x07" * 4
    body = (
        b"WAVE"
        + b"fmt " + le32(16) + fmt_payload
        + b"note" + le32(3) + note_payload + b"\x00"
        + b"data" + le32(4) + data_payload
    )
    buf = b"RIFF" + le32(len(body)) + body
    chunks = parse_riff_chunks(buf)
    assert chunks == [
        ("WAVE", "fmt ", 12, 16),
        ("WAVE", "note", 36, 3),
        ("WAVE", "data", 48, 4),  # 36 + 8 + 3 + 1 pad
    ]
    # truncated final chunk: declared size overruns the buffer -> the
    # walk stops WITHOUT emitting the truncated chunk
    trunc = buf[:-2]
    assert parse_riff_chunks(trunc) == [
        ("WAVE", "fmt ", 12, 16),
        ("WAVE", "note", 36, 3),
    ]
    # non-RIFF and too-short inputs yield no rows
    assert parse_riff_chunks(b"JUNKJUNKJUNKJUNK") == []
    assert parse_riff_chunks(b"RIFF") == []
    assert parse_riff_chunks(None) == []


def test_chunk_walkers_accept_custom_id_col(spark):
    """riff_chunks / png_chunks with a NON-default id_col (ADVICE r12
    low: the batch iterator indexed pdf[id_col] after the select had
    already renamed it to media_id, so any custom id_col raised
    KeyError at execution time)."""
    import zlib

    from etl_his_spark.operators.multimodal import png_chunks, riff_chunks

    def le32(v):
        return v.to_bytes(4, "little")

    riff = b"RIFF" + le32(4 + 8 + 4) + b"WAVE" + b"data" + le32(4) + b"\x01\x02\x03\x04"
    ihdr = bytes(13)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + len(ihdr).to_bytes(4, "big") + b"IHDR" + ihdr
        + zlib.crc32(b"IHDR" + ihdr).to_bytes(4, "big")
        + (0).to_bytes(4, "big") + b"IEND"
        + zlib.crc32(b"IEND").to_bytes(4, "big")
    )
    df = spark.createDataFrame(
        [(7, bytearray(riff)), (8, bytearray(png))],
        "asset_id long, media_bytes binary",
    )
    riff_rows = riff_chunks(df, id_col="asset_id").collect()
    assert [(r.media_id, r.chunk_id, r.chunk_size) for r in riff_rows] == [
        (7, "data", 4)
    ]
    png_rows = png_chunks(df, id_col="asset_id").collect()
    assert [(r.media_id, r.chunk_type, r.crc_ok) for r in png_rows] == [
        (8, "IHDR", True),
        (8, "IEND", True),
    ]
