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
    """Unknown magic with no real codec importable: strict raises. If PIL
    ever appears in this environment the bytes below are still not an
    image, so the raise must survive the real-codec fallthrough too."""
    bad = spark.createDataFrame([(1, b"XXXX" + b"\0" * 8)], "media_id long, blob binary")

    with pytest.raises(Exception) as exc_info:
        decode_media(bad, strict=True).collect()
    assert "NotImplementedError" in str(exc_info.value) or "no codec" in str(exc_info.value)


def test_synthetic_decode_independent_of_real_codecs(spark, media):
    """CODEC POLICY contract: synthetic containers decode identically
    whether or not PIL/pyav exist (they short-circuit before the real-codec
    fallthrough), so the multimodal oracle pairs are environment-stable."""
    rows = decode_media(media).collect()
    assert all(r["fmt"] in ("image", "audio", "video") for r in rows)
    # the fallthrough only ever sees unknown magic; synthetic blobs never do
    from etl_from_s3_to_postgresql_template_spark.operators.multimodal import _real_image_meta

    assert _real_image_meta(b"IMG!" + b"\0" * 20) is None  # PIL absent or can't sniff


def test_real_codec_contract_pil(spark):
    """Runs wherever PIL exists (skips here): a real PNG blob must decode
    through the SAME decode_media/mapInPandas plumbing with the same
    metadata columns the stub path fills, and resize must report the new
    size on re-decode."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    PIL_Image.new("RGB", (20, 14)).save(buf, format="PNG")
    png = buf.getvalue()
    df = spark.createDataFrame([(1, png)], "media_id long, blob binary")
    row = decode_media(df).collect()[0]
    assert (row["fmt"], row["width"], row["height"]) == ("image", 20, 14)
    assert row["payload_bytes"] == len(png)
    assert row["sample_rate"] is None and row["n_frames"] is None

    resized = decode_media(resize_images(df, 8, 6)).collect()[0]
    assert (resized["width"], resized["height"]) == (8, 6)


def test_real_codec_contract_pyav(spark):
    """Runs wherever pyav exists (skips here): a real encoded video must
    yield stream metadata through decode_media and sampled frames through
    sample_frames' pyav fallthrough."""
    av = pytest.importorskip("av")
    import io

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("h264", rate=4)
        stream.width, stream.height = 32, 24
        stream.pix_fmt = "yuv420p"
        import numpy as np

        for i in range(6):
            frame = av.VideoFrame.from_ndarray(
                np.full((24, 32, 3), i * 20, dtype=np.uint8), format="rgb24"
            )
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    blob = buf.getvalue()
    df = spark.createDataFrame([(1, blob)], "media_id long, blob binary")
    row = decode_media(df).collect()[0]
    assert (row["fmt"], row["width"], row["height"]) == ("video", 32, 24)
    frames = sample_frames(df, every=2).collect()
    assert frames and all(r["frame_idx"] % 2 == 0 for r in frames)
    assert all(len(bytes(r["frame"])) == 32 * 24 * 3 for r in frames)

class TestAudioPcmStats:
    def _stats(self, spark, payload: bytes):
        import struct as _struct

        import pandas as pd

        from etl_from_s3_to_postgresql_template_spark.operators.multimodal import (
            audio_pcm_stats,
        )

        blob = b"AUD!" + _struct.pack(">II", 8000, len(payload)) + payload
        df = spark.createDataFrame(
            pd.DataFrame({"media_id": [0], "blob": [bytearray(blob)]})
        )
        return audio_pcm_stats(df).collect()[0]

    def test_silence_is_zero_rms(self, spark):
        r = self._stats(spark, bytes([128] * 64))
        assert r["rms"] == 0.0 and r["peak"] == 0 and r["zero_crossings"] == 0

    def test_square_wave_known_stats(self, spark):
        # alternating 0 / 255 (centered -128 / +127): crossing at every
        # adjacent pair; rms = sqrt((128^2 + 127^2)/2) rounded half-up
        import math

        payload = bytes([0, 255] * 32)
        r = self._stats(spark, payload)
        assert r["peak"] == 128
        assert r["zero_crossings"] == 63
        expect = math.floor(math.sqrt((128 * 128 + 127 * 127) / 2) * 10000 + 0.5) / 10000
        assert r["rms"] == expect

    def test_non_audio_blobs_filtered(self, spark):
        import pandas as pd

        from etl_from_s3_to_postgresql_template_spark.operators.multimodal import (
            audio_pcm_stats,
            synthetic_media_table,
        )

        media = synthetic_media_table(spark, n=30)
        out = audio_pcm_stats(media).collect()
        assert all(r["media_id"] % 3 == 1 for r in out)
        assert len(out) == 10


class TestImageAhash:
    def _hashes(self, spark, blobs):
        import pandas as pd

        from etl_from_s3_to_postgresql_template_spark.operators.multimodal import (
            image_ahash,
        )

        df = spark.createDataFrame(
            pd.DataFrame(
                {"media_id": list(range(len(blobs))), "blob": [bytearray(b) for b in blobs]}
            )
        )
        return {r["media_id"]: r["ahash"] for r in image_ahash(df).collect()}

    @staticmethod
    def _img(pixels, w, h):
        import struct as _struct

        return b"IMG!" + _struct.pack(">II", w, h) + bytes(pixels)

    @staticmethod
    def _hamming(a: str, b: str) -> int:
        return bin(int(a, 16) ^ int(b, 16)).count("1")

    def test_near_duplicate_images_have_close_hashes(self, spark):
        import random

        rng = random.Random(7)
        w = h = 16
        base = [rng.randrange(256) for _ in range(w * h)]
        brightened = [min(255, p + 10) for p in base]  # global brightness shift
        unrelated = [rng.randrange(256) for _ in range(w * h)]
        hs = self._hashes(
            spark,
            [self._img(base, w, h), self._img(brightened, w, h), self._img(unrelated, w, h)],
        )
        assert self._hamming(hs[0], hs[1]) <= 8  # aHash is brightness-robust
        assert self._hamming(hs[0], hs[2]) > 16  # random images differ

    def test_identical_images_identical_hash_regardless_of_id(self, spark):
        w, h = 20, 24
        pix = [(i * 37) % 256 for i in range(w * h)]
        hs = self._hashes(spark, [self._img(pix, w, h), self._img(pix, w, h)])
        assert hs[0] == hs[1]


class TestVideoShotBounds:
    def test_planted_shot_boundary(self, spark):
        import struct as _struct

        import pandas as pd

        from etl_from_s3_to_postgresql_template_spark.operators.multimodal import (
            video_frame_hashes,
        )

        # 3 frames: two identical gradients, then an inverted one (every
        # threshold bit flips -> hamming 64 -> boundary)
        grad = bytes(range(64))
        inv = bytes(255 - i for i in range(64))
        blob = b"VID!" + _struct.pack(">II", (8 << 16) | 8, 3) + grad + grad + inv
        df = spark.createDataFrame(
            pd.DataFrame({"media_id": [0], "blob": [bytearray(blob)]})
        )
        rows = sorted(video_frame_hashes(df).collect(), key=lambda r: r["frame_idx"])
        assert [r["is_shot_boundary"] for r in rows] == [False, False, True]
        assert rows[1]["hamming_prev"] == 0
        assert rows[2]["hamming_prev"] > 20
        assert rows[0]["ahash"] == rows[1]["ahash"] != rows[2]["ahash"]
