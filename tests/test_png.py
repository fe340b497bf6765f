"""Stdlib PNG codec: roundtrip, all five scanline filters, and the
image_features operator end-to-end (real decode, no fake)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from see_spark.core.png import _paeth, decode_png, encode_png


def _rng_pixels(h, w, ch, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8) if ch > 1 \
        else rng.randint(0, 256, size=(h, w), dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_roundtrip(ch):
    px = _rng_pixels(13, 9, ch)
    out = decode_png(encode_png(px))
    want = px if px.ndim == 3 else px[:, :, None]
    assert np.array_equal(out, want)


def _png_with_filters(px: np.ndarray, filters: list) -> bytes:
    """Build a PNG whose scanlines use the given filter per row, by
    applying each filter forward (the encoder direction) to known pixels —
    decode must invert it exactly."""
    h, w, ch = px.shape
    stride = w * ch
    flat = px.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        row = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        filt = np.empty(stride, dtype=np.int32)
        for x in range(stride):
            left = row[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                filt[x] = row[x]
            elif f == 1:
                filt[x] = row[x] - left
            elif f == 2:
                filt[x] = row[x] - up
            elif f == 3:
                filt[x] = row[x] - ((left + up) >> 1)
            else:
                filt[x] = row[x] - _paeth(int(left), int(up), int(ul))
        raw.append(f)
        raw.extend((filt & 0xFF).astype(np.uint8).tobytes())

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    color_type = {1: 0, 3: 2, 4: 6}[ch]
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_each_filter_inverts(f):
    px = _rng_pixels(6, 5, 3).reshape(6, 5, 3)
    data = _png_with_filters(px, [f])
    assert np.array_equal(decode_png(data), px)


def test_mixed_filters_invert():
    px = _rng_pixels(10, 7, 4, seed=11).reshape(10, 7, 4)
    data = _png_with_filters(px, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(data), px)


def test_rejects_bad_input():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    good = encode_png(_rng_pixels(4, 4, 3))
    corrupt = good[:40] + bytes([good[40] ^ 0xFF]) + good[41:]
    with pytest.raises(ValueError):
        decode_png(corrupt)


def test_image_features_real_png_decode(spark):
    from see_spark.operators.multimodal import image_features

    px_rgb = _rng_pixels(12, 8, 3)
    px_gray = _rng_pixels(5, 5, 1)
    media = spark.createDataFrame(
        [
            ("rgb", encode_png(px_rgb)),
            ("gray", encode_png(px_gray)),
            ("bad", b"\x89PNG\r\n\x1a\njunk"),
        ],
        "media_id string, payload binary",
    )
    rows = {r["media_id"]: r for r in image_features(media).collect()}

    assert (rows["rgb"]["width"], rows["rgb"]["height"]) == (8, 12)
    assert rows["rgb"]["n_channels"] == 3
    assert rows["rgb"]["pixel_mean"] == pytest.approx(px_rgb.astype("float64").mean())
    assert rows["rgb"]["pixel_std"] == pytest.approx(px_rgb.astype("float64").std())
    assert rows["rgb"]["decode_error"] is None

    assert (rows["gray"]["width"], rows["gray"]["height"]) == (5, 5)
    assert rows["gray"]["n_channels"] == 1

    assert rows["bad"]["decode_error"] is not None
    assert rows["bad"]["width"] is None


def test_extract_features_fake_false_decodes_real_png(spark):
    from see_spark.operators.multimodal import extract_features

    px = _rng_pixels(6, 6, 3)
    media = spark.createDataFrame(
        [("i", "image", encode_png(px))],
        "media_id string, kind string, payload binary",
    )
    row = extract_features(media, fake=False).collect()[0]
    flat = px.reshape(-1)
    assert row["n_bytes"] == flat.size
    assert row["byte_mean"] == pytest.approx(flat.mean())
    assert row["byte_histogram"] == np.bincount(flat % 16, minlength=16).tolist()
