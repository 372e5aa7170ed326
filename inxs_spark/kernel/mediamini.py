"""Minimal real image/audio codecs (pure stdlib — no PIL/ffmpeg in the
container, SURVEY.md §0, but zlib and wave ARE stdlib).

Scope:

- PNG: encoder (8-bit RGB/RGBA/grayscale, filter 0, non-interlaced)
  and decoder (IHDR/IDAT/IEND, full unfiltering: None/Sub/Up/Average/
  Paeth). Palette, 16-bit, and interlaced images raise ``MediaError``.
- WAV: PCM 16-bit mono/stereo read/write via the stdlib ``wave``
  module.
- nearest-neighbor resize for thumbnails.

Video decode stays out of scope (real codecs) — ``operators/
multimodal.py`` documents that stub explicitly.
"""

from __future__ import annotations

import io
import struct
import wave as _wave
import zlib
from typing import List, Tuple

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type we support
_COLOR_CHANNELS = {0: 1, 2: 3, 6: 4}


class MediaError(ValueError):
    pass


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

def _chunk(kind: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + kind + data
        + struct.pack(">I", zlib.crc32(kind + data) & 0xFFFFFFFF)
    )


def png_encode(pixels: List[List[Tuple[int, ...]]]) -> bytes:
    """rows of (r,g,b) / (r,g,b,a) / (lum,) tuples → PNG bytes."""
    if not pixels or not pixels[0]:
        raise MediaError("empty image")
    height, width = len(pixels), len(pixels[0])
    nch = len(pixels[0][0])
    color_type = {1: 0, 3: 2, 4: 6}.get(nch)
    if color_type is None:
        raise MediaError(f"unsupported channel count {nch}")
    raw = bytearray()
    for row in pixels:
        raw.append(0)  # filter type None
        for px in row:
            raw.extend(px)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> Tuple[int, int, int, List[List[Tuple[int, ...]]]]:
    """PNG bytes → (width, height, channels, rows of pixel tuples)."""
    if not data.startswith(_PNG_SIG):
        raise MediaError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    width = height = None
    bit_depth = color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        kind = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + kind + data + crc
        if kind == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise MediaError(f"unsupported bit depth {bit_depth}")
            if color_type not in _COLOR_CHANNELS:
                raise MediaError(f"unsupported color type {color_type}")
            if interlace:
                raise MediaError("interlaced PNG unsupported")
        elif kind == b"IDAT":
            idat.extend(body)
        elif kind == b"IEND":
            break
    if width is None or not idat:
        raise MediaError("missing IHDR/IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise MediaError(f"bad IDAT: {exc}")
    nch = _COLOR_CHANNELS[color_type]
    stride = width * nch
    if len(raw) != height * (stride + 1):
        raise MediaError("IDAT size mismatch")
    rows: List[List[Tuple[int, ...]]] = []
    prev = bytearray(stride)
    for r in range(height):
        start = r * (stride + 1)
        ftype = raw[start]
        line = bytearray(raw[start + 1 : start + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                upleft = prev[i - nch] if i >= nch else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise MediaError(f"unknown filter type {ftype}")
        rows.append(
            [tuple(line[i : i + nch]) for i in range(0, stride, nch)]
        )
        prev = line
    return width, height, nch, rows


def resize_nearest(
    rows: List[List[Tuple[int, ...]]], out_w: int, out_h: int
) -> List[List[Tuple[int, ...]]]:
    """Nearest-neighbor thumbnail resize."""
    in_h, in_w = len(rows), len(rows[0])
    return [
        [rows[(y * in_h) // out_h][(x * in_w) // out_w] for x in range(out_w)]
        for y in range(out_h)
    ]


# ---------------------------------------------------------------------------
# WAV (PCM 16-bit)
# ---------------------------------------------------------------------------

def wav_encode(samples: List[int], sample_rate: int = 16_000,
               channels: int = 1) -> bytes:
    """16-bit PCM samples (interleaved if stereo) → WAV bytes."""
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def wav_decode(data: bytes) -> Tuple[int, int, List[int]]:
    """WAV bytes → (sample_rate, channels, 16-bit samples)."""
    try:
        with _wave.open(io.BytesIO(data), "rb") as w:
            if w.getsampwidth() != 2:
                raise MediaError(
                    f"unsupported sample width {w.getsampwidth()} (16-bit only)"
                )
            frames = w.readframes(w.getnframes())
            n = len(frames) // 2
            return (
                w.getframerate(),
                w.getnchannels(),
                list(struct.unpack(f"<{n}h", frames[: n * 2])),
            )
    except _wave.Error as exc:
        raise MediaError(f"bad WAV: {exc}")
