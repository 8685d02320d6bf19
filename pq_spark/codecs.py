"""Real, dependency-free media codecs for the multimodal pipeline.

The container ships no PIL/ffmpeg, so these implement the two formats that
need nothing beyond the standard library:

- **PNG** (8-bit grayscale, non-interlaced): full spec-compliant encode
  (filter 0 scanlines, zlib IDAT, CRC-checked chunks) and decode (all five
  scanline filters incl. Paeth, multi-IDAT, CRC validation). Any external
  grayscale PNG of this shape decodes here; our thumbnails open in any
  viewer.
- **WAV** (PCM16 mono): RIFF/fmt/data encode + chunk-walking decode.

Video remains a documented seam (an MJPEG-style container of PNG frames —
see multimodal.py): real ffmpeg integration needs the native library.

Pure functions over bytes/ndarrays — no Spark imports — so the
mapInPandas codecs in multimodal.py stay trivially testable.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """8-bit grayscale ndarray (h, w) → PNG bytes (filter 0, one IDAT)."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("encode_png expects a 2-D uint8 array")
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 ndarray (h, w). Supports 8-bit grayscale,
    non-interlaced, all five scanline filters, multiple IDAT chunks;
    validates the signature and every chunk CRC."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    h = None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG (chunk header past end)")
        (length,) = struct.unpack_from(">I", data, pos)
        if pos + 12 + length > len(data):
            raise ValueError("truncated PNG (chunk body past end)")
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, color, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise ValueError(
                    "unsupported PNG variant (need 8-bit grayscale, "
                    "deflate, non-interlaced)"
                )
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")

    raw = zlib.decompress(bytes(idat))
    stride = w + 1
    if len(raw) != h * stride:
        raise ValueError("PNG payload size mismatch")
    out = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * stride]
        line = np.frombuffer(raw, np.uint8, w, y * stride + 1).copy()
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(1, w):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            line = (line.astype(np.uint16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(w):
                left = int(line[x - 1]) if x else 0
                line[x] = (line[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(w):
                left = int(line[x - 1]) if x else 0
                ul = int(prev[x - 1]) if x else 0
                line[x] = (line[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = line
        prev = line
    return out


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono samples → WAV (RIFF PCM16) bytes."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav expects a 1-D int16 array")
    payload = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes → (sample_rate, int16 mono samples). Chunk-walking parse
    (tolerates extra chunks like LIST/INFO before data)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        typ = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + length > len(data):
            raise ValueError("truncated WAV (chunk body past end)")
        body = data[pos + 8 : pos + 8 + length]
        if typ == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV (short fmt chunk)")
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError("unsupported WAV variant (need PCM16 mono)")
        elif typ == b"data":
            if len(body) % 2:
                raise ValueError("truncated WAV (odd-length PCM16 data)")
            samples = np.frombuffer(body, dtype=np.int16)
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("truncated WAV (missing fmt/data)")
    return rate, samples
