"""Pure-stdlib media codecs: 8-bit grayscale PNG, PCM16 WAV, MPNG video.

This container has no Pillow/soundfile/ffmpeg, but PNG and WAV are
stdlib-decodable (zlib + struct, `wave`), so the image, audio, AND video
seams of operators/multimodal.py run REAL decodes over real containers:
the media column holds genuine PNG/WAV/MPNG bytes and the feature
extractors parse them.

Video (round 4): there is no stdlib H.264, so the synthetic clips use an
MJPEG-style intra-only stream with PNG in place of JPEG — "MPNG":
length-prefixed PNG keyframes at a fixed frame interval. The decoder
seeks by skipping length prefixes (no decode of skipped frames) and
parses only the requested keyframe, the exact access pattern a PyAV
keyframe extractor uses (`container.seek(ts)` + decode one frame).

Scope (exactly what the synthetic corpus needs, kept small on purpose):
PNG: 8-bit grayscale, non-interlaced; decoder handles all five scanline
filters (None/Sub/Up/Average/Paeth) so a foreign encoder's output parses
too; encoder emits filter 0 rows. WAV: mono PCM16 via the stdlib `wave`
module. A Pillow/soundfile/PyAV drop-in only has to reproduce
`decode_png_gray8` / `decode_wav_pcm16` / `decode_mpng_frame` semantics
(pinned by
tests/test_multimodal.py seam tests).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# Upper bound on the decoded scanline bytes a single PNG may declare
# (h * (w+1)); 2^28 = 256 MiB comfortably covers any crawl thumbnail
# while bounding what a hostile header can make an executor allocate.
_MAX_RAW_BYTES = 1 << 28

# Every exception class a corrupt or truncated container can raise out
# of the decoders in this module (short buffers -> struct.error /
# IndexError, bad DEFLATE -> zlib.error, malformed RIFF -> wave.Error /
# EOFError, everything explicitly rejected -> ValueError). Operators
# that must survive dirty corpora catch exactly this set at their
# decode seam.
DECODE_ERRORS = (
    ValueError,
    IndexError,
    EOFError,
    ZeroDivisionError,
    struct.error,
    zlib.error,
    wave.Error,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png_gray8(img: np.ndarray) -> bytes:
    """Minimal valid PNG: 8-bit grayscale, filter 0 scanlines."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_png_gray8 expects a 2-D uint8 array")
    h, w = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png_gray8(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale non-interlaced PNG, all filter types."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    idat = []
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, bit_depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if bit_depth != 8 or color != 0 or interlace != 0:
                raise ValueError("only 8-bit grayscale non-interlaced PNG supported")
            if w == 0 or h == 0:
                # a zero-dimension raster decodes to an empty array that
                # crashes feature folds (min/max of nothing) PAST the
                # decode seam — treat the degenerate container as
                # undecodable here instead
                raise ValueError("degenerate PNG dimensions (w or h is 0)")
            if h * (w + 1) > _MAX_RAW_BYTES:
                raise ValueError("PNG dimensions exceed the decoder bound")
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    stride = w + 1
    # decompress AT MOST the expected scanline bytes (+1 to detect
    # overrun): an adversarial container cannot make the decoder
    # allocate more than the header-declared raster (decompression-bomb
    # guard); byte-identical to a plain decompress for valid payloads
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), h * stride + 1)
    if (
        len(raw) != h * stride
        or d.unconsumed_tail
        or d.unused_data
        or not d.eof
    ):
        raise ValueError("PNG scanline data size mismatch")
    out = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        row = raw[y * stride : (y + 1) * stride]
        ft = row[0]
        cur = np.frombuffer(row[1:], dtype=np.uint8).copy()
        if ft == 0:
            pass
        elif ft == 1:  # Sub: recon[x] = filt[x] + recon[x-1] -> cumsum mod 256
            cur = np.cumsum(cur, dtype=np.uint64).astype(np.uint8)
        elif ft == 2:  # Up
            cur += prev  # uint8 wraparound
        elif ft == 3:  # Average (sequential in x)
            for x in range(w):
                left = int(cur[x - 1]) if x else 0
                cur[x] = (int(cur[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ft == 4:  # Paeth (sequential in x)
            for x in range(w):
                a = int(cur[x - 1]) if x else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = cur
        prev = cur
    return out


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono PCM16 WAV via the stdlib wave module."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav_pcm16 expects int16 samples")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """(samples int16, sample_rate) from a mono PCM16 WAV payload."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getnchannels() != 1 or wf.getsampwidth() != 2:
            raise ValueError("only mono PCM16 WAV supported")
        frames = wf.readframes(wf.getnframes())
        return np.frombuffer(frames, dtype=np.int16), wf.getframerate()


_MPNG_MAGIC = b"MPNG"


def encode_mpng(frames: list, frame_interval_ms: int) -> bytes:
    """Intra-only video container: length-prefixed PNG keyframes.

    Layout: b'MPNG' | u32 n_frames | u32 interval_ms | (u32 len | PNG)*.
    Every frame is an independent keyframe (like MJPEG), so decode of any
    frame needs no other frame — the property that makes distributed
    frame sampling embarrassingly parallel."""
    if not frames:
        raise ValueError("encode_mpng requires at least one frame")
    if frame_interval_ms <= 0:
        raise ValueError("frame_interval_ms must be positive")
    parts = [_MPNG_MAGIC + struct.pack("<II", len(frames), frame_interval_ms)]
    for img in frames:
        png = encode_png_gray8(img)
        parts.append(struct.pack("<I", len(png)))
        parts.append(png)
    return b"".join(parts)


def mpng_info(data: bytes) -> tuple[int, int]:
    """(n_frames, frame_interval_ms) from the MPNG header — O(1)."""
    if data[:4] != _MPNG_MAGIC:
        raise ValueError("not an MPNG payload")
    n_frames, interval_ms = struct.unpack("<II", data[4:12])
    if n_frames == 0 or interval_ms == 0:
        # the encoder enforces >= 1 frame and a positive interval, so a
        # zero here is a corrupt header; interval 0 would otherwise
        # surface as ZeroDivisionError in the seek arithmetic — outside
        # the decode-error set the operators catch
        raise ValueError("corrupt MPNG header (zero frames or interval)")
    return n_frames, interval_ms


def decode_mpng_frame(data: bytes, frame_no: int) -> np.ndarray:
    """Seek + decode ONE keyframe: earlier frames are skipped by their
    length prefix (never decompressed); only the requested PNG is parsed."""
    n_frames, _ = mpng_info(data)
    if not 0 <= frame_no < n_frames:
        raise IndexError(f"frame {frame_no} out of range (n_frames={n_frames})")
    pos = 12
    for _ in range(frame_no):
        (ln,) = struct.unpack("<I", data[pos : pos + 4])
        pos += 4 + ln
    (ln,) = struct.unpack("<I", data[pos : pos + 4])
    return decode_png_gray8(data[pos + 4 : pos + 4 + ln])
