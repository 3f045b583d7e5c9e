"""Multimodal plumbing: schemas, determinism, batch shapes, partitioning."""

from __future__ import annotations

import pytest

from etl_from_s3_to_postgresql_template_spark.operators.multimodal import (
    FRAME_BYTES,
    decode_media,
    extract_features,
    resize_images,
    sample_frames,
    synthetic_media_table,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media_table(spark, n=60, partitions=4).persist()


def test_media_table_deterministic(spark, media):
    a = {r["media_id"]: bytes(r["blob"]) for r in media.collect()}
    b = {r["media_id"]: bytes(r["blob"]) for r in synthetic_media_table(spark, n=60, partitions=2).collect()}
    assert a == b  # partitioning must not change content
    assert len(a) == 60


def test_decode_media_metadata(spark, media):
    rows = {r["media_id"]: r for r in decode_media(media).collect()}
    img = rows[0]  # media_id % 3 == 0 -> image
    assert img["fmt"] == "image" and img["width"] == 16 and img["height"] == 16
    assert img["sample_rate"] is None
    aud = rows[1]
    assert aud["fmt"] == "audio" and aud["sample_rate"] == 8000 and aud["n_samples"] == 288
    vid = rows[2]
    assert vid["fmt"] == "video" and vid["n_frames"] == 4 and vid["width"] == 32
    assert vid["payload_bytes"] == 4 * FRAME_BYTES


def test_extract_features_shape_and_norm(spark, media):
    rows = extract_features(media).collect()
    assert len(rows) == 60
    for r in rows:
        assert len(r["feature"]) == 16
        assert abs(sum(x * x for x in r["feature"]) - 1.0) < 1e-9


def test_resize_roundtrip(spark, media):
    resized = decode_media(resize_images(media, 8, 8))
    imgs = [r for r in resized.collect() if r["fmt"] == "image"]
    assert imgs and all(r["width"] == 8 and r["height"] == 8 for r in imgs)
    auds = [r for r in resized.collect() if r["fmt"] == "audio"]
    assert auds and all(r["n_samples"] > 0 for r in auds)  # untouched


def test_sample_frames(spark, media):
    frames = sample_frames(media, every=2).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
        assert len(bytes(r["frame"])) == FRAME_BYTES
    # media_id=2 -> 4 frames, every=2 -> indices 0,2
    assert sorted(r["frame_idx"] for r in by_media[2]) == [0, 2]
    # only videos produce frames
    assert all(m % 3 == 2 for m in by_media)


def test_strict_decode_raises_on_unknown(spark):
    bad = spark.createDataFrame([(1, b"XXXX" + b"\0" * 8)], "media_id long, blob binary")
    import pyspark.errors

    with pytest.raises(Exception) as exc_info:
        decode_media(bad, strict=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or "no codec" in str(exc_info.value)