"""Minimal PNG codec — stdlib only (struct + zlib + numpy).

A REAL image decode path for the multimodal pipeline: the container has no
PIL/ffmpeg-class libraries, but PNG is decodable from first principles
with the standard library — chunk walk, IDAT inflate, per-scanline
unfilter (the five filters of the PNG spec, RFC 2083 §6). Scope is the
common subset a synthetic/test corpus needs and an honest subset of the
web's PNGs: 8-bit depth, grayscale / RGB / RGBA, non-interlaced. Anything
else raises ValueError with the reason — at 100 TB scale those rows route
to a decode_error column, they don't kill the job (same contract as
audio_features).

The matching encoder exists so tests and fixtures can synthesize real
PNGs deterministically without any external library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 array (h, w) | (h, w, 1|3|4) -> PNG bytes (filter 0 rows)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w, channels). Raises ValueError on
    malformed input or a feature outside the supported subset."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length:pos + 12 + length]
        )
        if crc != zlib.crc32(tag + data) & 0xFFFFFFFF:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth}")
    if interlace != 0:
        raise ValueError("interlaced PNG unsupported")
    ch = _CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported color type {color_type}")

    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:  # None
            cur = row
        elif f == 2:  # Up — vectorized
            cur = (row + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: left-pixel recurrence
            cur = row.copy()
            pv = prev.astype(np.int32)
            for x in range(stride):
                left = cur[x - ch] if x >= ch else 0
                if f == 1:
                    cur[x] = (row[x] + left) & 0xFF
                elif f == 3:
                    cur[x] = (row[x] + ((left + pv[x]) >> 1)) & 0xFF
                else:
                    ul = pv[x - ch] if x >= ch else 0
                    cur[x] = (row[x] + _paeth(int(left), int(pv[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"unknown filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out.reshape(h, w, ch)
