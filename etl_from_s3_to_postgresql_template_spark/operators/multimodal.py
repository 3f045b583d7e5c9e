"""Multimodal (image/audio/video) columns as opaque binary + typed metadata
(north-star E4).

Contract: media rides in a ``binary`` column next to a metadata struct;
decode / feature-extract / resize / frame-sample are ``mapInPandas`` /
pandas-UDF operators over Arrow batches, so payload bytes stream
executor-side in columnar batches and never transit the driver. That
plumbing — schemas, batch iteration, partition parallelism — is real and
tested.

CODEC POLICY: blobs in the synthetic container format below always decode
via the deterministic parser (keeps the DuckDB oracle pairs byte-stable).
Blobs with UNKNOWN magic fall through to REAL codecs when the library is
importable on the executor — PIL for images, pyav for video — detected
lazily inside the per-batch function (executor-side, not driver-side).
Where no codec applies, the stub behavior stands: NULL metadata, or
NotImplementedError under ``decode_media(strict=True)``. This container
ships neither PIL nor pyav, so in-container tests exercise the detection
seam and the stub path; the real-codec contract test
(tests/test_multimodal.py) auto-activates wherever the libs exist.

Synthetic container format (deterministic, seedless):
    magic[4] = IMG!/AUD!/VID! | a uint32 | b uint32 | payload bytes
    image: a=width, b=height;  audio: a=sample_rate, b=n_samples;
    video: a=width<<16|height, b=n_frames (payload = n_frames fixed slices)
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "synthetic_media_table",
    "decode_media",
    "extract_features",
    "resize_images",
    "sample_frames",
    "audio_pcm_stats",
    "image_ahash",
    "video_frame_hashes",
    "have_real_codecs",
]

_MAGIC = {0: b"IMG!", 1: b"AUD!", 2: b"VID!"}
_KIND = {b"IMG!": "image", b"AUD!": "audio", b"VID!": "video"}
FRAME_BYTES = 64  # fixed synthetic frame size


def have_real_codecs() -> dict[str, bool]:
    """Which real codec libraries are importable HERE (call on the
    executor for executor truth; local[32] shares one process)."""
    import importlib.util

    return {
        "pil": importlib.util.find_spec("PIL") is not None,
        "av": importlib.util.find_spec("av") is not None,
    }


def _real_image_meta(b: bytes):
    """PIL path for non-synthetic blobs. Returns the decode_media metadata
    tuple or None (PIL absent, or bytes aren't an image it can sniff)."""
    try:
        from PIL import Image
    except ImportError:
        return None
    import io

    try:
        with Image.open(io.BytesIO(b)) as img:
            w, h = img.size
        return ("image", w, h, None, None, None, len(b))
    except Exception:
        return None


def _real_video_meta(b: bytes):
    """pyav path for non-synthetic blobs: container-level stream metadata."""
    try:
        import av
    except ImportError:
        return None
    import io

    try:
        with av.open(io.BytesIO(b)) as container:
            vs = next((s for s in container.streams if s.type == "video"), None)
            if vs is None:
                return None
            cc = vs.codec_context
            n = int(vs.frames) if vs.frames else None
            return ("video", cc.width, cc.height, None, None, n, len(b))
    except Exception:
        return None


def _payload(seed: int, n: int) -> bytes:
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.md5(f"{seed}:{i}".encode()).digest()
        i += 1
    return out[:n]


def _make_blob(media_id: int) -> bytes:
    kind = media_id % 3
    if kind == 0:  # image
        w, h = 16 + (media_id % 8) * 4, 16 + (media_id % 5) * 4
        return _MAGIC[0] + struct.pack(">II", w, h) + _payload(media_id, w * h)
    if kind == 1:  # audio
        sr, ns = 8000, 256 + (media_id % 16) * 32
        return _MAGIC[1] + struct.pack(">II", sr, ns) + _payload(media_id, ns)
    n_frames = 2 + media_id % 6  # video
    w, h = 32, 24
    return _MAGIC[2] + struct.pack(">II", (w << 16) | h, n_frames) + _payload(
        media_id, n_frames * FRAME_BYTES
    )


def synthetic_media_table(spark: SparkSession, n: int = 300, partitions: int = 8) -> DataFrame:
    """Deterministic media fixture: (media_id long, kind string, blob binary).
    Generated distributed (mapInPandas over an id range) — the driver never
    holds the payload bytes."""
    base = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": [_KIND[_MAGIC[i % 3]] for i in ids],
                    "blob": [_make_blob(i) for i in ids],
                }
            )

    return base.mapInPandas(gen, "media_id long, kind string, blob binary")


def decode_media(df: DataFrame, blob_col: str = "blob", strict: bool = False) -> DataFrame:
    """Parse container headers -> typed metadata columns.

    Output adds: fmt string, width int, height int, sample_rate int,
    n_samples int, n_frames int, payload_bytes long (NULLs where a field
    does not apply to the modality).
    """
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields)
        + ", fmt string, width int, height int, sample_rate int, n_samples int,"
        " n_frames int, payload_bytes long"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for blob in pdf[blob_col]:
                b = bytes(blob) if blob is not None else b""
                kind = _KIND.get(b[:4]) if len(b) >= 12 else None
                if kind is None:
                    # Unknown magic / truncated blob: hand it to the real
                    # codecs when present (PIL sniff, then pyav), else the
                    # stub behavior — NULL metadata, or raise under strict.
                    meta = _real_image_meta(b) or _real_video_meta(b)
                    if meta is not None:
                        metas.append(meta)
                        continue
                    if strict:
                        raise NotImplementedError(f"no codec for blob prefix {b[:4]!r}")
                    metas.append((None, None, None, None, None, None, len(b)))
                    continue
                a, bfield = struct.unpack(">II", b[4:12])
                if kind == "image":
                    # STUB: real codec = PIL.Image.open(BytesIO(b)).size
                    metas.append(("image", a, bfield, None, None, None, len(b) - 12))
                elif kind == "audio":
                    metas.append(("audio", None, None, a, bfield, None, len(b) - 12))
                else:
                    metas.append(("video", a >> 16, a & 0xFFFF, None, None, bfield, len(b) - 12))
            cols = list(zip(*metas)) if metas else [[]] * 7
            for i, name in enumerate(
                ["fmt", "width", "height", "sample_rate", "n_samples", "n_frames", "payload_bytes"]
            ):
                pdf[name] = pd.array(cols[i], dtype="object")
            yield pdf

    return df.mapInPandas(run, out_schema)


def extract_features(
    df: DataFrame, blob_col: str = "blob", dim: int = 16, normalize: bool = True
) -> DataFrame:
    """Binary -> fixed-dim feature vector.

    STUB: the feature extractor is a deterministic byte-histogram projection
    (a real build plugs a vision/audio model here via the same pandas UDF).
    The Arrow batch shape — binary in, array out — is the real contract.

    ``normalize=True`` returns the L2-normalized histogram as
    ``array<double>`` (the embedding shape downstream ANN expects);
    ``normalize=False`` returns the raw counts as ``array<bigint>`` —
    exact integers, which is what lets the DuckDB oracle reproduce the
    whole blob->histogram path bit-for-bit (a byte mod 16 is its low hex
    nibble, so the oracle counts digest hex chars)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for blob in pdf[blob_col]:
                arr = np.frombuffer(bytes(blob)[12:], dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim)
                if not normalize:
                    feats.append([int(x) for x in hist])
                    continue
                hist = hist.astype(np.float64)
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm else hist).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    elem = "double" if normalize else "bigint"
    return df.mapInPandas(run, f"media_id long, feature array<{elem}>")


def resize_images(df: DataFrame, width: int, height: int, blob_col: str = "blob") -> DataFrame:
    """Re-encode image blobs at a new size (non-images pass through).

    Synthetic containers re-synthesize the deterministic payload at the new
    dimensions (oracle-stable; decode_media(resize_images(df)) reports the
    new size). Unknown-magic blobs resample through PIL when it is
    importable (LANCZOS + PNG re-encode) and pass through untouched
    otherwise.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def real_resize(b: bytes):
            try:
                from PIL import Image
            except ImportError:
                return None
            import io

            try:
                with Image.open(io.BytesIO(b)) as img:
                    resized = img.resize((width, height), Image.LANCZOS)
                buf = io.BytesIO()
                resized.save(buf, format="PNG")
                return buf.getvalue()
            except Exception:
                return None

        for pdf in batches:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf[blob_col]):
                b = bytes(blob)
                if b[:4] == _MAGIC[0]:
                    out.append(_MAGIC[0] + struct.pack(">II", width, height) + _payload(int(mid), width * height))
                elif b[:4] in _KIND:
                    out.append(b)  # synthetic audio/video: not an image
                else:
                    out.append(real_resize(b) or b)
            pdf[blob_col] = out
            yield pdf

    return df.mapInPandas(run, df.schema)


def sample_frames(df: DataFrame, every: int = 2, blob_col: str = "blob") -> DataFrame:
    """Explode video blobs into sampled frames: one output row per kept
    frame (media_id, frame_idx, frame binary). The row-explosion happens
    inside the Arrow batch — no driver hop. Synthetic VID! containers slice
    their fixed-size payload frames; unknown-magic blobs decode through
    pyav when importable (every Nth frame as raw rgb24 bytes); otherwise a
    non-video produces no rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def real_frames(b: bytes):
            try:
                import av
            except ImportError:
                return None
            import io

            try:
                out = []
                with av.open(io.BytesIO(b)) as container:
                    if not any(s.type == "video" for s in container.streams):
                        return None
                    for i, frame in enumerate(container.decode(video=0)):
                        if i % every == 0:
                            out.append((i, frame.to_ndarray(format="rgb24").tobytes()))
                return out
            except Exception:
                return None

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf[blob_col]):
                b = bytes(blob)
                if b[:4] == _MAGIC[2]:
                    n_frames = struct.unpack(">II", b[4:12])[1]
                    payload = b[12:]
                    for i in range(0, n_frames, every):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES])
                elif b[:4] not in _KIND:
                    for i, fb in real_frames(b) or []:
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(fb)
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(run, "media_id long, frame_idx int, frame binary")


def audio_pcm_stats(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """REAL audio feature extraction (no stub, no optional dependency):
    interpret each AUD! payload as unsigned-8-bit PCM and compute RMS,
    peak amplitude, and zero-crossing count with numpy — the standard
    first-pass audio quality signals (silence/clipping detection, speech
    activity proxy) a multimodal training pipeline runs before any model.

    Arrow-batched mapInPandas; numpy does the per-blob DSP (vectorized
    int64 ops). Rounding is the explicit floor(x*1e4+0.5)/1e4 half-up
    sequence so the DuckDB oracle (which re-synthesizes the payload from
    the md5 construction) reproduces the double bit-for-bit."""
    import math

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, blob in zip(pdf["media_id"], pdf[blob_col]):
                b = bytes(blob)
                if b[:4] != b"AUD!":
                    continue
                _, ns = struct.unpack(">II", b[4:12])
                arr = np.frombuffer(b[12 : 12 + ns], dtype=np.uint8)
                c = arr.astype(np.int64) - 128
                sumsq = int((c * c).sum())
                rms = math.floor(math.sqrt(sumsq * 1.0 / ns) * 10000 + 0.5) / 10000
                out.append(
                    {
                        "media_id": media_id,
                        "n_samples": ns,
                        "peak": int(np.abs(c).max()),
                        "rms": rms,
                        "zero_crossings": int(((c[:-1] < 0) != (c[1:] < 0)).sum()),
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "n_samples", "peak", "rms", "zero_crossings"],
            )

    return df.mapInPandas(
        run, "media_id long, n_samples long, peak long, rms double, zero_crossings long"
    )


def image_ahash(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """REAL image perceptual hashing (aHash), no codec dependency: the
    IMG! payload IS the decoded grayscale raster (w*h bytes, row-major),
    which is exactly what PIL.convert('L') would hand us. 8x8 nearest-
    neighbor downsample -> 64 mean-threshold bits -> 16-hex-char hash.
    This is the image near-dup primitive (pHash family): Hamming distance
    between ahashes finds resized/re-encoded copies, composing with the
    banded Hamming search tier (similarity_topk_hamming) at corpus scale.

    Everything is INTEGER arithmetic — the mean comparison is written as
    pixel*64 > sum (no division), so the DuckDB oracle reproduces the
    hash exactly from the md5 payload construction."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, blob in zip(pdf["media_id"], pdf[blob_col]):
                b = bytes(blob)
                if b[:4] != b"IMG!":
                    continue
                w, h = struct.unpack(">II", b[4:12])
                arr = np.frombuffer(b[12 : 12 + w * h], dtype=np.uint8).reshape(h, w)
                si = (np.arange(8) * h) // 8
                sj = (np.arange(8) * w) // 8
                thumb = arr[np.ix_(si, sj)].astype(np.int64)
                total = int(thumb.sum())
                bits = (thumb.flatten() * 64 > total).astype(int)
                val = 0
                for bit in bits:
                    val = (val << 1) | int(bit)
                out.append(
                    {
                        "media_id": media_id,
                        "width": int(w),
                        "height": int(h),
                        "ahash": format(val, "016x"),
                    }
                )
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "ahash"])

    return df.mapInPandas(run, "media_id long, width long, height long, ahash string")


def video_frame_hashes(df: DataFrame, boundary_hamming: int = 20, blob_col: str = "blob") -> DataFrame:
    """REAL video temporal analysis on the synthetic container: each VID!
    frame is a 64-byte 8x8 grayscale raster; compute the per-frame aHash
    (same integer mean-threshold as image_ahash, thumbnail = identity at
    8x8) and flag shot boundaries where consecutive frames' Hamming
    distance exceeds ``boundary_hamming`` — the standard first pass of
    video dedup/segmentation (frame-sample -> hash -> boundary/near-dup).
    Integer-only, so the oracle reproduces every bit."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, blob in zip(pdf["media_id"], pdf[blob_col]):
                b = bytes(blob)
                if b[:4] != b"VID!":
                    continue
                _, n_frames = struct.unpack(">II", b[4:12])
                prev = None
                for fi in range(n_frames):
                    fr = np.frombuffer(
                        b[12 + fi * FRAME_BYTES : 12 + (fi + 1) * FRAME_BYTES],
                        dtype=np.uint8,
                    ).astype(np.int64)
                    total = int(fr.sum())
                    val = 0
                    for px in fr:
                        val = (val << 1) | int(px * 64 > total)
                    ham = None if prev is None else bin(val ^ prev).count("1")
                    out.append(
                        {
                            "media_id": media_id,
                            "frame_idx": fi,
                            "ahash": format(val, "016x"),
                            "hamming_prev": ham,
                            "is_shot_boundary": bool(ham is not None and ham > boundary_hamming),
                        }
                    )
                    prev = val
            yield pd.DataFrame(
                out,
                columns=["media_id", "frame_idx", "ahash", "hamming_prev", "is_shot_boundary"],
            )

    return df.mapInPandas(
        run,
        "media_id long, frame_idx long, ahash string, hamming_prev long, is_shot_boundary boolean",
    )
