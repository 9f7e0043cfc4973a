"""Multimodal plumbing tests: binary payload schema, Arrow-batched
feature extraction, resize/frame-sample operators, stubbed real
decoder."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from whale_sightings_spark.operators.multimodal import (
    attach_fake_media,
    extract_features,
    resize_images,
    sample_frames,
)
from whale_sightings_spark.schemas import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return attach_fake_media(load_table(spark, sf_dir, "documents"))


def test_payload_is_md5_bytes(spark, sf_dir, media):
    doc = load_table(spark, sf_dir, "documents").select("doc_id", "text").first()
    payload = media.filter(F.col("media_id") == doc["doc_id"]).first()["payload"]
    assert bytes(payload) == hashlib.md5(doc["text"].encode()).digest()


def test_feature_extraction_histogram(media):
    row = extract_features(media, decoder="fake").first()
    hist = [int(v) for v in row["feature"].split(",")]
    assert len(hist) == 16
    assert sum(hist) == 32  # 16 payload bytes -> 32 nibbles


def test_real_decoder_is_stubbed(media):
    with pytest.raises(NotImplementedError, match="codec"):
        extract_features(media, decoder="real")
    with pytest.raises(ValueError):
        extract_features(media, decoder="bogus")


def test_resize_updates_meta_only(media):
    out = resize_images(media, 224, 224)
    row = out.first()
    assert row["meta"]["width"] == 224 and row["meta"]["height"] == 224
    assert "resized=224x224" in row["meta"]["format"]
    assert row["payload"] is not None
    assert out.select("kind").distinct().collect() == [("image",)] or all(
        r["kind"] == "image" for r in out.select("kind").distinct().collect()
    )


def test_frame_sampling_grid(media):
    out = sample_frames(media, every_ms=1000)
    vid = media.filter(F.col("kind") == "video").first()
    frames = out.filter(F.col("media_id") == vid["media_id"]).collect()
    expected = (max(vid["meta"]["duration_ms"] - 1, 0)) // 1000 + 1
    assert len(frames) == expected
    assert [f["frame_index"] for f in sorted(frames, key=lambda r: r["offset_ms"])] == list(
        range(expected)
    )
