"""Dependency-free PNG codec (stdlib zlib only).

The container has no Pillow/ffmpeg, but PNG itself needs nothing beyond
DEFLATE — signature, chunked layout, scanline filters and the Paeth
predictor are all public spec (RFC 2083 / W3C PNG). This module
implements the subset a training-data pipeline's image plumbing needs:

- ``encode_png``: 8-bit grayscale / gray+alpha / RGB / RGBA from a
  numpy array, filter-0 scanlines (simple, deterministic layout; the
  compressed bytes still vary with zlib version — callers compare
  PIXELS, never encoded bytes).
- ``decode_png``: 8-bit non-interlaced images, ALL five scanline
  filters (None/Sub/Up/Average/Paeth), gray / gray+alpha / RGB / RGBA.
  Palette (color type 3), 16-bit depth and Adam7 interlace raise with
  the exact unsupported feature named — real rasters at scale should
  decode with Pillow when available (multimodal.decode_image_real
  prefers it and falls back here for PNG only).

Row unfiltering is a per-row Python loop (Sub/Paeth carry a
left-neighbor dependency that doesn't vectorize); fine for the
thumbnail/fixture sizes this engine decodes inline — the 100 TB path
runs the same operator with Pillow installed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channels
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> color type


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit image array (h, w) or (h, w, channels in {1,2,3,4}) ->
    PNG bytes (filter-0 scanlines)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _COLOR_TYPE:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, ch = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[ch], 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w, channels). Supports 8-bit
    non-interlaced gray/gray+alpha/RGB/RGBA with any scanline filter."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + type + data + crc
        if typ == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif typ == b"IDAT":
            idat.extend(body)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG has no IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"bit depth {bit_depth} (only 8-bit)")
    if color_type not in _CHANNELS:
        raise NotImplementedError(f"color type {color_type} (palette PNGs need Pillow)")
    if interlace:
        raise NotImplementedError("Adam7 interlace (needs Pillow)")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.empty((h, w, ch), dtype=np.uint8)
    prev = bytearray(stride)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8).reshape(w, ch)
        prev = line
    return out
