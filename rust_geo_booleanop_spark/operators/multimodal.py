"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode step is a DETERMINISTIC FAKE (clearly marked): this container
has no image/audio libraries, so `_decode_image` / `_decode_audio`
synthesize pixel/sample statistics from the payload bytes. Everything
around the decode — schemas, Arrow batch shapes, mapInPandas signatures,
partition-friendly explode of frame samples — is real and tested; swapping
the fake for Pillow/librosa is a one-function change.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "url string, kind string, media binary, "
    "width int, height int, sample_rate int, duration_ms int, codec string"
)

# real decoders would be plugged here (PIL.Image.open / soundfile.read);
# the fake derives deterministic content from the payload so tests can
# assert exact values
_FAKE_DECODE = True


def synth_media(spark, documents: DataFrame, kinds=("image", "audio")) -> DataFrame:
    """Deterministic media table derived from document urls (binary payload
    = keyed hash bytes; metadata derived from the key)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "url", "kind", "media", "width", "height",
                "sample_rate", "duration_ms", "codec",
            )}
            for url in pdf["url"]:
                seed = int.from_bytes(
                    hashlib.blake2b(url.encode(), digest_size=8).digest(), "little"
                )
                kind = kinds[seed % len(kinds)]
                payload = hashlib.blake2b(
                    url.encode(), digest_size=32, person=b"media"
                ).digest() * 8  # 256 bytes of deterministic "content"
                out["url"].append(url)
                out["kind"].append(kind)
                out["media"].append(payload)
                if kind == "image":
                    out["width"].append(64 + seed % 512)
                    out["height"].append(64 + (seed >> 9) % 512)
                    out["sample_rate"].append(None)
                    out["duration_ms"].append(None)
                    out["codec"].append("png")
                elif kind == "video":
                    out["width"].append(64 + seed % 256)
                    out["height"].append(64 + (seed >> 9) % 256)
                    out["sample_rate"].append(None)
                    out["duration_ms"].append(2000 + seed % 30000)
                    out["codec"].append("h264")
                else:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["sample_rate"].append(16000)
                    out["duration_ms"].append(1000 + seed % 60000)
                    out["codec"].append("pcm16")
            yield pd.DataFrame(out)

    return documents.select("url").mapInPandas(batches, schema=MEDIA_SCHEMA)


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """FAKE decode: deterministic pseudo-pixels from payload bytes.

    A real implementation would be:  np.asarray(PIL.Image.open(BytesIO(payload)))
    """
    if not _FAKE_DECODE:  # pragma: no cover
        raise NotImplementedError("real image decode requires Pillow")
    rng_bytes = np.frombuffer(payload, dtype=np.uint8)
    reps = (width * height) // len(rng_bytes) + 1
    return np.tile(rng_bytes, reps)[: width * height].reshape(height, width)


def _decode_audio(payload: bytes, n_samples: int) -> np.ndarray:
    """FAKE decode: deterministic int16 samples from payload bytes."""
    if not _FAKE_DECODE:  # pragma: no cover
        raise NotImplementedError("real audio decode requires soundfile")
    raw = np.frombuffer(payload, dtype=np.uint8).astype(np.int16)
    reps = n_samples // len(raw) + 1
    return (np.tile(raw, reps)[:n_samples] - 128) * 256


IMAGE_FEATURES_SCHEMA = (
    "url string, width int, height int, mean_pixel double, std_pixel double, "
    "phash long"
)


def image_features(media: DataFrame) -> DataFrame:
    """Decode (stub) + feature-extract per image, Arrow-batched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("url", "width", "height", "mean_pixel", "std_pixel", "phash")}
            for url, payload, w, h in zip(pdf["url"], pdf["media"], pdf["width"], pdf["height"]):
                img = _decode_image(bytes(payload), int(w), int(h))
                # 8x8 average-hash style fingerprint on a coarse grid
                hh = img[:: max(1, img.shape[0] // 8), :: max(1, img.shape[1] // 8)][:8, :8]
                bits = (hh > hh.mean()).flatten()
                phash = 0
                for i, b in enumerate(bits):
                    if b:
                        phash |= 1 << i
                out["url"].append(url)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_pixel"].append(float(img.mean()))
                out["std_pixel"].append(float(img.std()))
                out["phash"].append(phash - (1 << 63) if phash >= (1 << 63) else phash)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


RESIZE_SCHEMA = "url string, out_width int, out_height int, thumb binary"


def resize_images(media: DataFrame, out_width: int = 32, out_height: int = 32) -> DataFrame:
    """Stub resize: nearest-neighbor downsample of the (fake-)decoded image;
    emits the raw thumbnail bytes (real impl would re-encode)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"url": [], "out_width": [], "out_height": [], "thumb": []}
            for url, payload, w, h in zip(pdf["url"], pdf["media"], pdf["width"], pdf["height"]):
                img = _decode_image(bytes(payload), int(w), int(h))
                ys = np.linspace(0, img.shape[0] - 1, out_height).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, out_width).astype(int)
                thumb = img[np.ix_(ys, xs)]
                out["url"].append(url)
                out["out_width"].append(out_width)
                out["out_height"].append(out_height)
                out["thumb"].append(thumb.astype(np.uint8).tobytes())
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(batches, schema=RESIZE_SCHEMA)


def _decode_video_frame(payload: bytes, width: int, height: int, frame_no: int) -> np.ndarray:
    """FAKE decode of one video frame: deterministic pseudo-pixels from
    (payload, frame_no). A real implementation would seek+decode via
    PyAV/ffmpeg; only this function changes."""
    if not _FAKE_DECODE:  # pragma: no cover
        raise NotImplementedError("real video decode requires PyAV/ffmpeg")
    salt = hashlib.blake2b(
        payload + struct.pack("<i", frame_no), digest_size=32
    ).digest()
    return _decode_image(salt * 8, width, height)


VIDEO_FRAMES_SCHEMA = (
    "url string, frame_no int, ts_ms int, mean_pixel double, phash long"
)


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Frame-sample video: decode (stub) one frame per `every_ms`, emit
    per-frame features — one output row per (clip, sampled frame). The
    explode happens Python-side inside the Arrow batch (no per-row UDF),
    exactly the shape a real keyframe extractor would use."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"url": [], "frame_no": [], "ts_ms": [], "mean_pixel": [], "phash": []}
            for url, payload, w, h, dur in zip(
                pdf["url"], pdf["media"], pdf["width"], pdf["height"], pdf["duration_ms"]
            ):
                n_frames = min(max_frames, max(1, int(dur) // every_ms))
                for fi in range(n_frames):
                    img = _decode_video_frame(bytes(payload), int(w), int(h), fi)
                    hh = img[:: max(1, img.shape[0] // 8), :: max(1, img.shape[1] // 8)][:8, :8]
                    bits = (hh > hh.mean()).flatten()
                    phash = 0
                    for i, b in enumerate(bits):
                        if b:
                            phash |= 1 << i
                    out["url"].append(url)
                    out["frame_no"].append(fi)
                    out["ts_ms"].append(fi * every_ms)
                    out["mean_pixel"].append(float(img.mean()))
                    out["phash"].append(phash - (1 << 63) if phash >= (1 << 63) else phash)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(
        batches, schema=VIDEO_FRAMES_SCHEMA
    )


AUDIO_FRAMES_SCHEMA = "url string, frame_no int, rms double, peak int"


def sample_audio_frames(media: DataFrame, frame_ms: int = 100, max_frames: int = 16) -> DataFrame:
    """Frame-sample audio: one output row per (clip, frame) with RMS/peak —
    the batch-explode shape a real feature extractor would use."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"url": [], "frame_no": [], "rms": [], "peak": []}
            for url, payload, sr, dur in zip(
                pdf["url"], pdf["media"], pdf["sample_rate"], pdf["duration_ms"]
            ):
                n_samples = int(int(sr) * int(dur) / 1000)
                samples = _decode_audio(bytes(payload), n_samples)
                frame_len = int(int(sr) * frame_ms / 1000)
                n_frames = min(max_frames, max(1, len(samples) // frame_len))
                for fi in range(n_frames):
                    frame = samples[fi * frame_len : (fi + 1) * frame_len]
                    if len(frame) == 0:
                        continue
                    out["url"].append(url)
                    out["frame_no"].append(fi)
                    out["rms"].append(float(np.sqrt(np.mean(frame.astype(np.float64) ** 2))))
                    # abs in int64: np.abs(int16 -32768) overflows back to
                    # -32768 and the true peak sample would be dropped
                    out["peak"].append(int(np.abs(frame.astype(np.int64)).max()))
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").mapInPandas(batches, schema=AUDIO_FRAMES_SCHEMA)
