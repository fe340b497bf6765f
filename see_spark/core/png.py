"""Minimal PNG codec — stdlib only (struct + zlib + numpy).

A REAL image decode path for the multimodal pipeline: the container has no
PIL/ffmpeg-class libraries, but PNG is decodable from first principles
with the standard library — chunk walk, IDAT inflate, per-scanline
unfilter (the five filters of the PNG spec, RFC 2083 §6), and Adam7
de-interlacing (RFC 2083 §2.6/§8.2: seven sub-images, each filtered
independently, scattered on an 8x8 grid). Scope covers the shapes a real
web corpus actually serves: all five color types (grayscale, RGB,
PALETTE — the icon/logo workhorse — gray+alpha, RGBA), every legal bit
depth (sub-byte 1/2/4 MSB-first packed per RFC 2083 §2.3; 16-bit
big-endian samples downconverted by high byte, the browser/Pillow
display convention, with tRNS keys compared at full 16-bit precision),
PLTE lookup, tRNS transparency (palette alpha table AND the single
transparent color for gray/RGB), interlace methods 0 and 1, in any
combination. Malformed input raises ValueError with the reason — at
100 TB scale those rows route to a decode_error column, they don't kill
the job (same contract as audio_features).

The matching encoders exist so tests and fixtures can synthesize real
PNGs deterministically without any external library (``encode_png`` for
direct color, ``encode_png_palette`` for indexed, both interlace
methods), so every exotic fixture has a byte-identical plain twin.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# shared decode-bomb bound (defined once, in core.jpeg — Pillow's
# Image.MAX_IMAGE_PIXELS default): header-claimed pixel counts above it
# raise before any plane/canvas allocation
from .jpeg import MAX_IMAGE_PIXELS

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# samples per pixel by color type: gray, RGB, palette index, gray+alpha,
# RGBA (palette pixels are ONE sample — the index; PLTE expands later)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# bit depths each color type admits in this codec's scope (16-bit
# samples are the one spec depth excluded — raise, never misdecode)
_VALID_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}

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


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + tag + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _pack_row(row: np.ndarray, depth: int) -> bytes:
    """1-D sample values -> packed scanline bytes at ``depth`` bits per
    sample, MSB-first, zero pad bits (RFC 2083 §2.3); depth 16 takes
    uint16 samples and writes big-endian pairs."""
    if depth == 8:
        return row.tobytes()
    if depth == 16:
        return row.astype(">u2").tobytes()
    bits = np.unpackbits(row[:, None], axis=1)[:, 8 - depth:].reshape(-1)
    return np.packbits(bits).tobytes()


def _serialize_rows(arr: np.ndarray, depth: int, interlace: int) -> bytes:
    """Filter-0 scanline stream (plain or Adam7 pass order) — shared by
    all three encoders. Accepts a (h, w) sample plane or a (h, w, ch)
    pixel array (depth 8 only for the latter): Adam7 slicing subsamples
    PIXELS first, then channels fold into the scanline."""

    def rows_of(a: np.ndarray) -> np.ndarray:
        return a.reshape(a.shape[0], -1) if a.ndim == 3 else a

    if interlace == 0:
        a = rows_of(arr)
        return b"".join(
            b"\x00" + _pack_row(a[y], depth) for y in range(a.shape[0])
        )
    parts = []
    for x0, xs, y0, ys in _ADAM7:
        sub = arr[y0::ys, x0::xs]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        a = rows_of(sub)
        for y in range(a.shape[0]):
            parts.append(b"\x00" + _pack_row(a[y], depth))
    return b"".join(parts)


def encode_png(
    pixels: np.ndarray, interlace: int = 0, transparent=None
) -> bytes:
    """uint8 array (h, w) | (h, w, 1|2|3|4) -> PNG bytes (filter 0 rows,
    channel counts map to gray / gray+alpha / RGB / RGBA).
    ``interlace=1`` writes Adam7: each pass's sub-image serialized as its
    own run of filtered scanlines, all passes in one zlib stream.
    ``transparent``: tRNS color key — a gray value (1-channel) or an
    (r, g, b) triple (3-channel)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    if interlace not in (0, 1):
        raise ValueError(f"unsupported interlace method {interlace}")

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, interlace)
    trns_chunk = b""
    if transparent is not None:
        if ch == 1:
            trns_chunk = _chunk(b"tRNS", struct.pack(">H", int(transparent)))
        elif ch == 3:
            trns_chunk = _chunk(
                b"tRNS", struct.pack(">HHH", *[int(v) for v in transparent])
            )
        else:
            raise ValueError("transparent key invalid for alpha color types")
    raw = _serialize_rows(px[:, :, 0] if ch == 1 else px, 8, interlace)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + trns_chunk
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def encode_png_16(
    pixels: np.ndarray, interlace: int = 0, transparent=None
) -> bytes:
    """uint16 array (h, w) | (h, w, 1|2|3|4) -> 16-bit PNG (filter 0,
    big-endian samples). ``transparent``: raw 16-bit gray value or
    (r, g, b) triple for the tRNS color key."""
    px = np.asarray(pixels, dtype=np.uint16)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 16, color_type, 0, 0, interlace)
    trns_chunk = b""
    if transparent is not None:
        if ch == 1:
            trns_chunk = _chunk(b"tRNS", struct.pack(">H", int(transparent)))
        elif ch == 3:
            trns_chunk = _chunk(
                b"tRNS", struct.pack(">HHH", *[int(v) for v in transparent])
            )
        else:
            raise ValueError("transparent key invalid for alpha color types")
    raw = _serialize_rows(px[:, :, 0] if ch == 1 else px, 16, interlace)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + trns_chunk
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def encode_png_palette(
    indices: np.ndarray,
    palette: np.ndarray,
    trns=None,
    depth: int = 8,
    interlace: int = 0,
) -> bytes:
    """(h, w) palette-index array + (n, 3) palette -> indexed PNG
    (color type 3) at ``depth`` bits per index (1/2/4/8). ``trns``: a
    sequence of per-entry alpha values (may be shorter than the
    palette, per spec)."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if pal.ndim != 2 or pal.shape[1] != 3 or pal.shape[0] > 256:
        raise ValueError("palette must be (<=256, 3)")
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"bad palette depth {depth}")
    if int(idx.max(initial=0)) >= min(pal.shape[0], 1 << depth):
        raise ValueError("index beyond palette/depth")
    h, w = idx.shape
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, interlace)
    trns_chunk = (
        _chunk(b"tRNS", bytes(int(a) for a in trns)) if trns is not None else b""
    )
    raw = _serialize_rows(idx, depth, interlace)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal.tobytes())
        + trns_chunk
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def encode_png_gray(
    samples: np.ndarray,
    depth: int,
    interlace: int = 0,
    transparent=None,
) -> bytes:
    """(h, w) RAW gray sample array (values < 2^depth) -> grayscale PNG
    at sub-byte ``depth`` (1/2/4) or 8. The decoder upscales sub-byte
    samples by 255/(2^depth - 1); ``transparent`` is the raw sample
    value for the tRNS color key."""
    a = np.asarray(samples, dtype=np.uint8)
    if depth not in (1, 2, 4, 8):
        raise ValueError(f"bad gray depth {depth}")
    if int(a.max(initial=0)) >= (1 << depth):
        raise ValueError("sample beyond depth range")
    h, w = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, interlace)
    trns_chunk = (
        _chunk(b"tRNS", struct.pack(">H", int(transparent)))
        if transparent is not None
        else b""
    )
    raw = _serialize_rows(a, depth, interlace)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + trns_chunk
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, offset: int, h: int, stride: int, bpp: int) -> np.ndarray:
    """Unfilter ``h`` scanlines of ``stride`` bytes each starting at
    ``offset`` in the inflated stream; returns a (h, stride) uint8
    array. ``bpp`` is the filter's left-neighbor distance in BYTES
    (max(1, depth*samples//8), RFC 2083 §6.2 — sub-byte pixels filter at
    one-byte distance). The filter state (prior scanline) is local to
    the sub-image — Adam7 passes filter independently (§8.2)."""
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
                left = cur[x - bpp] if x >= bpp else 0
                if f == 1:
                    cur[x] = (row[x] + left) & 0xFF
                elif f == 3:
                    cur[x] = (row[x] + ((left + pv[x]) >> 1)) & 0xFF
                else:
                    ul = pv[x - bpp] if x >= bpp else 0
                    cur[x] = (row[x] + _paeth(int(left), int(pv[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"unknown filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out


def _unpack_samples(
    flt: np.ndarray, w: int, depth: int, spp: int
) -> np.ndarray:
    """(h, stride) unfiltered bytes -> (h, w*spp) sample values.
    Sub-byte depths unpack MSB-first within each byte (RFC 2083 §2.3);
    per-scanline pad bits past w*depth are discarded. Depth 16 returns
    uint16 (big-endian pairs joined); all others uint8."""
    if depth == 8:
        return flt[:, : w * spp]
    if depth == 16:
        pairs = flt[:, : w * spp * 2].reshape(flt.shape[0], w * spp, 2)
        return (
            pairs[:, :, 0].astype(np.uint16) << 8
        ) | pairs[:, :, 1].astype(np.uint16)
    bits = np.unpackbits(flt, axis=1)[:, : w * depth]
    vals = bits.reshape(flt.shape[0], w, depth).astype(np.uint8)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (vals * weights).sum(axis=2, dtype=np.int32).astype(np.uint8)


def _colorize(
    samples: np.ndarray, h: int, w: int, color_type: int, depth: int,
    plte, trns,
) -> np.ndarray:
    """(h, w*spp) raw sample values -> final (h, w, out_channels) pixels:
    PLTE expansion (+ tRNS palette alpha), sub-byte gray upscaling
    (255/(2^d - 1), exact integer for d in 1/2/4), the tRNS
    transparent-color key for gray/RGB (compared at the file's full
    sample precision), and 16-bit high-byte downconversion (the
    browser/Pillow display convention — the pipeline's pixel contract
    is uint8)."""
    if color_type == 3:
        if plte is None:
            raise ValueError("palette image missing PLTE")
        idx = samples.reshape(h, w)
        if int(idx.max(initial=0)) >= plte.shape[0]:
            raise ValueError("palette index beyond PLTE")
        rgb = plte[idx]
        if trns is not None:
            # tRNS for type 3: alpha per palette entry, 255 past its end
            alpha = np.full(plte.shape[0], 255, dtype=np.uint8)
            alpha[: min(len(trns), plte.shape[0])] = np.frombuffer(
                trns[: plte.shape[0]], dtype=np.uint8
            )
            return np.dstack([rgb, alpha[idx]])
        return rgb
    spp = _CHANNELS[color_type]
    key_mask = None
    if trns is not None and color_type in (0, 2):
        # tRNS single transparent color: 16-bit sample values at file
        # depth (compare at RAW precision, before any up/downscaling —
        # at depth 16 two values sharing a high byte must not alias)
        vals = struct.unpack(f">{len(trns) // 2}H", trns)
        mask_bits = (1 << depth) - 1 if depth <= 8 else 0xFFFF
        px_raw = samples.reshape(h, w, spp)
        if color_type == 0:
            key_mask = px_raw[:, :, 0] == (vals[0] & mask_bits)
        else:
            key_mask = (
                (px_raw[:, :, 0] == (vals[0] & mask_bits))
                & (px_raw[:, :, 1] == (vals[1] & mask_bits))
                & (px_raw[:, :, 2] == (vals[2] & mask_bits))
            )
    if depth < 8:  # gray upscale (type 0 only — other sub-byte is type 3)
        samples = (samples * (255 // ((1 << depth) - 1))).astype(np.uint8)
    elif depth == 16:  # high byte, the standard 16->8 display conversion
        samples = (samples >> 8).astype(np.uint8)
    px = samples.reshape(h, w, spp)
    if key_mask is not None:
        alpha = np.where(key_mask, 0, 255).astype(np.uint8)
        return np.dstack([px, alpha])
    return px


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w, channels). Output channels: 1
    (gray), 2 (gray+alpha), 3 (RGB / palette), 4 (RGBA / palette+tRNS /
    color-keyed gray+RGB). Raises ValueError on malformed input or a
    feature outside the supported subset (16-bit samples, interlace
    methods beyond 0/1)."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    plte = None
    trns = None
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
        elif tag == b"PLTE":
            if len(data) % 3 or not data:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = data
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    spp = _CHANNELS.get(color_type)
    if spp is None:
        raise ValueError(f"unsupported color type {color_type}")
    if depth not in _VALID_DEPTHS[color_type]:
        raise ValueError(
            f"unsupported bit depth {depth} for color type {color_type}"
        )
    if interlace not in (0, 1):
        raise ValueError(f"unsupported interlace method {interlace}")
    if w == 0 or h == 0:
        raise ValueError("zero image dimension")
    if h * w > MAX_IMAGE_PIXELS:
        # same decode-bomb guard as core.jpeg: the interlaced path
        # allocates the (h, w, spp) canvas from header dimensions before
        # any IDAT size check can fire, so a corrupt IHDR must be
        # rejected here, not at allocation time
        raise ValueError(
            f"image {w}x{h} exceeds MAX_IMAGE_PIXELS "
            f"({MAX_IMAGE_PIXELS}) decode-bomb guard"
        )
    if trns is not None:
        if color_type in (4, 6):
            raise ValueError("tRNS forbidden for alpha color types")
        if color_type == 0 and len(trns) != 2:
            raise ValueError("bad tRNS length for grayscale")
        if color_type == 2 and len(trns) != 6:
            raise ValueError("bad tRNS length for RGB")

    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream ({e})") from e
    bpp = max(1, depth * spp // 8)

    def _stride(width: int) -> int:
        return (width * depth * spp + 7) // 8

    if interlace == 0:
        if len(raw) != h * (_stride(w) + 1):
            raise ValueError("IDAT size mismatch")
        flt = _unfilter(raw, 0, h, _stride(w), bpp)
        samples = _unpack_samples(flt, w, depth, spp)
    else:
        # Adam7: seven independently-filtered sub-images, scattered back
        # onto the 8x8 pixel grid (in the SAMPLE domain; palette/tRNS
        # expansion happens once, after assembly; 16-bit samples keep
        # full precision until _colorize downconverts)
        samples = np.empty(
            (h, w, spp), dtype=np.uint16 if depth == 16 else np.uint8
        )
        offset = 0
        for x0, xs, y0, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (h - y0 + ys - 1) // ys
            if pw == 0 or ph == 0:
                continue
            flt = _unfilter(raw, offset, ph, _stride(pw), bpp)
            offset += ph * (_stride(pw) + 1)
            sub = _unpack_samples(flt, pw, depth, spp)
            samples[y0::ys, x0::xs] = sub.reshape(ph, pw, spp)
        if offset != len(raw):
            raise ValueError("IDAT size mismatch")
        samples = samples.reshape(h, w * spp)
    return _colorize(samples, h, w, color_type, depth, plte, trns)
