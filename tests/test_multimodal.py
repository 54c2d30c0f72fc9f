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
    with pytest.raises(NotImplementedError):
        decode_media(media)  # allow_fake not set → explicit stub error
    with pytest.raises(NotImplementedError):
        resize_image(media, 224, 224)


def test_decode_features_deterministic(spark, media):
    out = decode_media(media, allow_fake=True)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == media.count()
    f0 = rows[0]["features"]
    assert len(f0) == N_FEATURES
    assert abs(sum(f0) - 1.0) < 1e-9  # histogram normalized
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in
             decode_media(media, allow_fake=True).collect()}
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
