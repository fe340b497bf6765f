"""Regression pins for the round-4 ADVICE findings, all four fixed in
round 5, plus the corrupt-input fuzz the verdict asked for:

1. merkle `_row_render` now escapes the \\x1f column separator, so a
   change that moves a \\x1f across a column boundary is visible.
2. `core.jpeg._BitReader` zero-pads (libjpeg convention) and raises
   ValueError the moment padded bits are CONSUMED — a truncated entropy
   stream can no longer decode silently-wrong trailing pixels.
3. `decode_jpeg` honors its documented contract: malformed input raises
   ValueError, never struct.error / KeyError / IndexError.
4. `decode_avi` filters movi chunks on the vids stream id and refuses
   two-video-stream files instead of silently interleaving them.

Plus: the Pillow-style MAX_IMAGE_PIXELS decode-bomb guard, and a seeded
mutation fuzz over real JPEG/AVI bytes asserting nothing but
ValueError/ndarray ever comes out of the decoders (the property the
mapInPandas feature stages rely on: every failure lands as a
decode_error row, no exception class escapes the documented contract).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from see_spark.core.avi import decode_avi, encode_avi
from see_spark.core.jpeg import MAX_IMAGE_PIXELS, decode_jpeg, encode_jpeg


def _test_image(seed: int = 7, h: int = 24, w: int = 32) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------- merkle


def test_merkle_leaf_distinguishes_separator_position(spark):
    """('a\\x1fb', 'c') and ('a', 'b\\x1fc') concatenate identically
    without separator escaping; the tree must see them as different."""
    from see_spark.operators.merkle import merkle_levels

    def root(a: str, b: str) -> str:
        df = spark.createDataFrame([(1, a, b)], "id int, x string, y string")
        rows = merkle_levels(df, ["id"], ["x", "y"], fanout=4).collect()
        return max(rows, key=lambda r: r["level"])["node_hash"]

    assert root("a\x1fb", "c") != root("a", "b\x1fc")
    # and the escape is deterministic, not a salt: same input, same root
    assert root("a\x1fb", "c") == root("a\x1fb", "c")


def test_merkle_leaf_separator_and_nul_interplay(spark):
    """The \\x00 escape pass and the \\x1f escape pass must compose
    injectively (\\x00\\x02 in a value vs an escaped \\x1f)."""
    from see_spark.operators.merkle import merkle_levels

    def root(a: str, b: str) -> str:
        df = spark.createDataFrame([(1, a, b)], "id int, x string, y string")
        rows = merkle_levels(df, ["id"], ["x", "y"], fanout=4).collect()
        return max(rows, key=lambda r: r["level"])["node_hash"]

    # a literal \x00\x02 in the value must not collide with an escaped \x1f
    assert root("a\x00\x02", "c") != root("a\x1f", "c")
    assert root("a\x00", "c") != root("a", "c")


# ------------------------------------------------- jpeg truncation + guard


def test_truncated_entropy_stream_raises_valueerror():
    img = _test_image()
    payload = encode_jpeg(img, quality=85)
    assert payload.endswith(b"\xff\xd9")
    body = payload[:-2]
    # chop 40% of the entropy tail: far more MCUs remain than bits, so
    # the reader must consume pad bits -> ValueError, never fabricated
    # trailing pixels
    cut = body[: int(len(body) * 0.6)]
    with pytest.raises(ValueError):
        decode_jpeg(cut)


def test_mild_truncation_still_raises_not_garbage():
    img = _test_image(seed=11)
    payload = encode_jpeg(img, quality=85)
    body = payload[:-2]
    for drop in (1, 2, 3, 5, 8):
        with pytest.raises(ValueError):
            decode_jpeg(body[:-drop])


def test_valid_jpeg_final_symbol_peek_is_not_flagged():
    """A VALID stream's last Huffman decode peeks (but does not consume)
    past the end — that must still decode, only consumption raises."""
    img = _test_image(seed=3)
    assert decode_jpeg(encode_jpeg(img, quality=90)).shape == img.shape


def test_sos_with_undefined_table_raises_valueerror():
    payload = bytearray(encode_jpeg(_test_image(), quality=85))
    sos = payload.find(b"\xff\xda")
    assert sos > 0
    # SOS: FFDA len ns (cid tableids)... -> point component 0 at
    # DC table 3 / AC table 3, which the stream never defines
    payload[sos + 6] = 0x33
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))


def test_truncated_dqt_raises_valueerror():
    # SOI + DQT claiming a 16-bit table (pq=1) but truncated: the '>64H'
    # unpack used to escape as struct.error
    payload = (
        b"\xff\xd8" + b"\xff\xdb" + struct.pack(">H", 10) + b"\x10" + b"\x00" * 7
    )
    with pytest.raises(ValueError):
        decode_jpeg(payload)


def test_decode_bomb_sof_dimensions_rejected():
    payload = bytearray(encode_jpeg(_test_image(), quality=85))
    sof = payload.find(b"\xff\xc0")
    assert sof > 0
    # SOF0: FFC0 len prec H H W W ... -> claim 65535 x 65535
    payload[sof + 5:sof + 9] = b"\xff\xff\xff\xff"
    assert 65535 * 65535 > MAX_IMAGE_PIXELS
    with pytest.raises(ValueError, match="decode-bomb"):
        decode_jpeg(bytes(payload))


def test_zero_dimension_sof_rejected():
    payload = bytearray(encode_jpeg(_test_image(), quality=85))
    sof = payload.find(b"\xff\xc0")
    payload[sof + 5:sof + 9] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))


# ------------------------------------------------------------------- avi


def _chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _lst(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def _strl(stream_type: bytes, fourcc: bytes, n: int) -> bytes:
    strh = stream_type + fourcc + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, 10, 0, n, 1 << 16, 0xFFFFFFFF, 0, 0
    )
    return _lst(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", b"\x00" * 40))


def test_audio_first_avi_decodes_only_the_video_stream():
    """Stream 00 = audio, stream 01 = MJPEG video. The movi list carries
    '00wb' audio AND junk '00dc' chunks for the audio stream; only the
    '01dc' JPEG frames may decode."""
    frames = [_test_image(seed=s, h=16, w=16) for s in (1, 2)]
    jpegs = [encode_jpeg(f, quality=90) for f in frames]
    hdrl = _lst(
        b"hdrl",
        _chunk(b"avih", b"\x00" * 56)
        + _strl(b"auds", b"\x00\x00\x00\x00", 100)
        + _strl(b"vids", b"MJPG", len(jpegs)),
    )
    movi_body = (
        _chunk(b"00wb", b"\x01\x02\x03\x04")
        + _chunk(b"00dc", b"not a jpeg")  # mislabeled audio-stream chunk
        + _chunk(b"01dc", jpegs[0])
        + _chunk(b"00wb", b"\x05\x06")
        + _chunk(b"01dc", jpegs[1])
    )
    body = b"AVI " + hdrl + _lst(b"movi", movi_body)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    decoded, meta = decode_avi(payload)
    assert meta["n_frames"] == 2
    assert meta["fourcc"] == "MJPG"
    assert len(decoded) == 2
    for got, want in zip(decoded, frames):
        assert got.shape == want.shape


def test_two_video_streams_raise():
    hdrl = _lst(
        b"hdrl",
        _chunk(b"avih", b"\x00" * 56)
        + _strl(b"vids", b"MJPG", 1)
        + _strl(b"vids", b"MJPG", 1),
    )
    body = b"AVI " + hdrl + _lst(b"movi", b"")
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError, match="multiple video streams"):
        decode_avi(payload)


def test_encode_decode_roundtrip_still_green():
    frames = [_test_image(seed=s, h=16, w=24) for s in (5, 6, 7)]
    decoded, meta = decode_avi(encode_avi(frames, fps=10, quality=92))
    assert meta["n_frames"] == 3
    assert len(decoded) == 3


# ------------------------------------------------------------------ fuzz


def _contract(decode, payload):
    """Run a decoder; anything but success / ValueError /
    NotImplementedError is a contract violation."""
    try:
        decode(payload)
    except ValueError:
        pass
    except NotImplementedError:
        pass


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_jpeg_mutations_stay_in_contract(seed):
    """Seeded byte mutations + truncations of a real JPEG: decode_jpeg
    must return pixels or raise ValueError — no struct.error, KeyError,
    IndexError, MemoryError, or silent hang (the decode-bomb guard caps
    allocations)."""
    base = encode_jpeg(_test_image(seed=seed, h=32, w=40), quality=80)
    rng = np.random.default_rng(1000 + seed)
    for _ in range(40):
        buf = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            buf[int(rng.integers(2, len(buf)))] = int(rng.integers(0, 256))
        _contract(decode_jpeg, bytes(buf))
    for _ in range(20):
        cut = int(rng.integers(2, len(base)))
        _contract(decode_jpeg, base[:cut])


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_avi_mutations_stay_in_contract(seed):
    base = encode_avi(
        [_test_image(seed=seed + 20, h=16, w=16) for _ in range(2)], fps=5
    )
    rng = np.random.default_rng(2000 + seed)
    for _ in range(30):
        buf = bytearray(base)
        for _ in range(int(rng.integers(1, 5))):
            buf[int(rng.integers(4, len(buf)))] = int(rng.integers(0, 256))
        _contract(decode_avi, bytes(buf))
    for _ in range(15):
        cut = int(rng.integers(12, len(base)))
        _contract(decode_avi, base[:cut])


def test_image_features_routes_corrupt_rows_to_decode_error(spark):
    """Operator-level: a batch mixing valid and corrupt payloads yields
    one row per input; corrupt rows carry decode_error, valid rows
    carry pixels — no exception escapes the mapInPandas stage."""
    from see_spark.operators.multimodal import image_features

    good = encode_jpeg(_test_image(seed=42, h=16, w=16), quality=90)
    trunc = good[: len(good) // 2]
    bomb = bytearray(good)
    sof = bomb.find(b"\xff\xc0")
    bomb[sof + 5:sof + 9] = b"\xff\xff\xff\xff"
    rows = [
        ("ok", "image", bytes(good)),
        ("trunc", "image", bytes(trunc)),
        ("bomb", "image", bytes(bomb)),
        ("junk", "image", b"\x00\x01\x02"),
    ]
    media = spark.createDataFrame(
        rows, "media_id string, kind string, payload binary"
    )
    out = {r["media_id"]: r for r in image_features(media).collect()}
    assert len(out) == 4
    assert out["ok"]["decode_error"] is None
    assert out["ok"]["width"] == 16
    for bad in ("trunc", "bomb", "junk"):
        assert out[bad]["decode_error"] is not None
        assert out[bad]["width"] is None
    assert "decode-bomb" in out["bomb"]["decode_error"]
