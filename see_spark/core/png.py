"""Minimal PNG codec — stdlib only (struct + zlib + numpy).

A REAL image decode path for the multimodal pipeline: the container has no
PIL/ffmpeg-class libraries, but PNG is decodable from first principles
with the standard library — chunk walk, IDAT inflate, per-scanline
unfilter (the five filters of the PNG spec, RFC 2083 §6), and Adam7
de-interlacing (RFC 2083 §2.6/§8.2: seven sub-images, each filtered
independently, scattered on an 8x8 grid). Scope is the common subset a
synthetic/test corpus needs and an honest subset of the web's PNGs:
8-bit depth, grayscale / RGB / RGBA, interlace methods 0 and 1. Anything
else raises ValueError with the reason — at 100 TB scale those rows route
to a decode_error column, they don't kill the job (same contract as
audio_features).

The matching encoder exists so tests and fixtures can synthesize real
PNGs deterministically without any external library; it can emit both
interlace methods, so interlaced fixtures have byte-identical
non-interlaced twins.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA

# Adam7 pass grid (RFC 2083 §8.2): (x_start, x_step, y_start, y_step).
# Pass k covers pixels (y_start + i*y_step, x_start + j*x_step); empty
# passes (zero rows or columns for small images) contribute no bytes.
_ADAM7 = [
    (0, 8, 0, 8),
    (4, 8, 0, 8),
    (0, 4, 4, 8),
    (2, 4, 0, 4),
    (0, 2, 2, 4),
    (1, 2, 0, 2),
    (0, 1, 1, 2),
]


def encode_png(pixels: np.ndarray, interlace: int = 0) -> bytes:
    """uint8 array (h, w) | (h, w, 1|3|4) -> PNG bytes (filter 0 rows).
    ``interlace=1`` writes Adam7: each pass's sub-image serialized as its
    own run of filtered scanlines, all passes in one zlib stream."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    if interlace not in (0, 1):
        raise ValueError(f"unsupported interlace method {interlace}")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, interlace)
    if interlace == 0:
        raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    else:
        parts = []
        for x0, xs, y0, ys in _ADAM7:
            sub = px[y0::ys, x0::xs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for y in range(sub.shape[0]):
                parts.append(b"\x00" + sub[y].tobytes())
        raw = b"".join(parts)
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


def _unfilter(raw: bytes, offset: int, h: int, w: int, ch: int) -> np.ndarray:
    """Unfilter ``h`` scanlines of a (sub-)image starting at ``offset``
    in the inflated stream; returns a (h, w*ch) uint8 array. The filter
    state (prior scanline) is local to the sub-image — Adam7 passes
    filter independently (RFC 2083 §8.2)."""
    stride = w * ch
    if len(raw) - offset < h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        base = offset + y * (stride + 1)
        f = raw[base]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=base + 1
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
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w, channels). Raises ValueError on
    malformed input or a feature outside the supported subset
    (non-8-bit depth, palette color, interlace methods beyond 0/1)."""
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
    if interlace not in (0, 1):
        raise ValueError(f"unsupported interlace method {interlace}")
    ch = _CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported color type {color_type}")
    if w == 0 or h == 0:
        raise ValueError("zero image dimension")

    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream ({e})") from e
    if interlace == 0:
        if len(raw) != h * (w * ch + 1):
            raise ValueError("IDAT size mismatch")
        return _unfilter(raw, 0, h, w, ch).reshape(h, w, ch)

    # Adam7: seven independently-filtered sub-images, scattered back
    # onto the 8x8 pixel grid
    out = np.empty((h, w, ch), dtype=np.uint8)
    offset = 0
    for x0, xs, y0, ys in _ADAM7:
        pw = (w - x0 + xs - 1) // xs
        ph = (h - y0 + ys - 1) // ys
        if pw == 0 or ph == 0:
            continue
        sub = _unfilter(raw, offset, ph, pw, ch)
        offset += ph * (pw * ch + 1)
        out[y0::ys, x0::xs] = sub.reshape(ph, pw, ch)
    if offset != len(raw):
        raise ValueError("IDAT size mismatch")
    return out
