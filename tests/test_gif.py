"""GIF codec (core/gif.py): roundtrip through the real LZW decoder,
spec conformance via a hand-packed bitstream (KwKwK case), extension
skipping, and the out-of-subset / garbage error contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from see_spark.core.gif import decode_gif, encode_gif


def _rng_indices(h, w, n_colors, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, n_colors, size=(h, w)).astype(np.uint8)


def _rng_palette(n, seed=11):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, 3)).astype(np.uint8)


@pytest.mark.parametrize("n_colors", [2, 4, 16, 256])
def test_roundtrip(n_colors):
    idx = _rng_indices(13, 17, n_colors)
    pal = _rng_palette(n_colors)
    out = decode_gif(encode_gif(idx, pal))
    assert out.shape == (13, 17, 3)
    assert np.array_equal(out, pal[idx])


def test_roundtrip_multi_subblock():
    """> 255 compressed bytes forces multiple data sub-blocks."""
    idx = _rng_indices(64, 64, 256)
    pal = _rng_palette(256)
    assert np.array_equal(decode_gif(encode_gif(idx, pal)), pal[idx])


def _hand_gif():
    """3x1, 4-entry palette, hand-packed LZW codes [clear,0,6,eoi] at
    width 3 — code 6 == next_code exercises the KwKwK special case and
    must decode to pixels [0, 0, 0]. Packed LSB-first: 4|0<<3|6<<6|5<<9
    = 0xB84 -> bytes 84 0B."""
    pal = bytes([0, 0, 0, 255, 255, 255, 10, 20, 30, 40, 50, 60])
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", 3, 1, 0x81, 0, 0)
        + pal
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 1, 0)
        + bytes([2])            # LZW min code size
        + bytes([2, 0x84, 0x0B])  # one sub-block, 2 bytes
        + b"\x00\x3b"
    )


def test_hand_packed_kwkwk_stream():
    out = decode_gif(_hand_gif())
    assert out.shape == (1, 3, 3)
    assert np.array_equal(out, np.zeros((1, 3, 3), np.uint8))


def test_extension_blocks_are_skipped():
    """A graphic-control extension (0x21 0xF9) before the image block
    must be walked over, not fail the decode."""
    g = bytearray(_hand_gif())
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # label + 4-byte block + term
    insert_at = 6 + 7 + 12  # header + LSD + palette
    g[insert_at:insert_at] = ext
    assert np.array_equal(
        decode_gif(bytes(g)), np.zeros((1, 3, 3), np.uint8)
    )


def test_interlace_flag_reorders_rows():
    """Setting the interlace bit on a NON-reordered stream must change
    which display rows the stored rows land on (i.e. the flag is honored,
    not ignored) — full interlace roundtrips live in test_interlace.py."""
    idx = _rng_indices(8, 4, 4)
    plain = decode_gif(encode_gif(idx, _rng_palette(4)))
    g = bytearray(encode_gif(idx, _rng_palette(4)))
    # image descriptor packed byte: header(6)+LSD(7)+palette(12)+0x2C+8
    g[6 + 7 + 12 + 9] |= 0x40
    flagged = decode_gif(bytes(g))
    assert flagged.shape == plain.shape
    assert not np.array_equal(flagged, plain)
    # stored row 1 is display row 8//... : under 8-row interlace the
    # second stored row (display row 8 absent at h=8 -> pass 2 row 4)
    assert np.array_equal(flagged[4], plain[1])


@pytest.mark.parametrize(
    "payload",
    [b"", b"GIF89a", b"not a gif at all", b"GIF89a" + b"\x00" * 20],
)
def test_garbage_raises_value_error(payload):
    with pytest.raises(ValueError):
        decode_gif(payload)


def test_truncated_stream_raises():
    good = encode_gif(_rng_indices(8, 8, 16), _rng_palette(16))
    with pytest.raises(ValueError):
        decode_gif(good[: len(good) // 2])


def test_local_color_table_precedence():
    """A local table must override the global one."""
    g = bytearray(_hand_gif())
    # rewrite image descriptor to carry a local 4-entry table (flag 0x81):
    # 0x2C at d, then <HHHHB> — the packed byte sits at d+9, the local
    # table (2<<1 = 4 entries) follows it
    d = 6 + 7 + 12
    g[d + 9] = 0x81
    local = bytes([9, 9, 9] * 4)
    g[d + 10 : d + 10] = local
    out = decode_gif(bytes(g))
    assert np.array_equal(out, np.full((1, 3, 3), 9, np.uint8))


def test_image_features_mixed_gif_png_jpeg(spark):
    """The operator sniffs the container per row: GIF, PNG, and baseline
    JPEG all decode in the same batch; an unknown-signature row (BMP) and
    a truncated JPEG carry errors instead of killing the job."""
    import pytest as _pytest

    from see_spark.core.jpeg import encode_jpeg
    from see_spark.core.png import encode_png
    from see_spark.operators.multimodal import image_features

    idx = _rng_indices(6, 9, 16)
    pal = _rng_palette(16)
    png_px = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    jpg_px = np.full((16, 16, 3), [120, 40, 220], np.uint8)
    media = spark.createDataFrame(
        [
            ("gif", encode_gif(idx, pal)),
            ("png", encode_png(png_px)),
            ("jpeg", encode_jpeg(jpg_px, quality=95)),
            ("jpeg_trunc", b"\xff\xd8\xff\xe0rest"),
            ("bmp", b"BM1234567890"),
        ],
        "media_id string, payload binary",
    )
    rows = {r["media_id"]: r for r in image_features(media).collect()}
    expected = pal[idx].astype("float64")
    assert (rows["gif"]["width"], rows["gif"]["height"]) == (9, 6)
    assert rows["gif"]["n_channels"] == 3
    assert rows["gif"]["pixel_mean"] == _pytest.approx(expected.mean())
    assert rows["gif"]["pixel_std"] == _pytest.approx(expected.std())
    assert rows["gif"]["decode_error"] is None
    assert rows["png"]["decode_error"] is None
    assert rows["jpeg"]["decode_error"] is None
    assert (rows["jpeg"]["width"], rows["jpeg"]["height"]) == (16, 16)
    assert rows["jpeg"]["pixel_mean"] == _pytest.approx(
        jpg_px.astype("float64").mean(), abs=2.0
    )
    assert rows["jpeg_trunc"]["decode_error"] is not None
    assert "unrecognized image container" in rows["bmp"]["decode_error"]
