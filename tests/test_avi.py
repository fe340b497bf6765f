"""MJPEG-AVI codec (core/avi.py): RIFF structure pins, mux/demux
roundtrip, selective frame decode, error paths, and the video_features /
video_frame_sample operators end-to-end over real AVI bytes."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from see_spark.core.avi import decode_avi, encode_avi


def _frames(n=6, h=32, w=48):
    return [
        np.full((h, w, 3), [10 * i, 200 - 10 * i, 50 + 5 * i], np.uint8)
        for i in range(n)
    ]


def test_riff_structure_pins():
    avi = encode_avi(_frames(3), fps=10)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    # RIFF size covers everything after the 8-byte header
    assert struct.unpack("<I", avi[4:8])[0] == len(avi) - 8
    assert b"hdrl" in avi and b"movi" in avi and b"idx1" in avi
    assert b"vids" in avi and b"MJPG" in avi
    # each frame chunk is a complete JPEG (SOI right after '00dc' size)
    assert avi.count(b"00dc\x00") >= 0  # tag present
    i = avi.find(b"movi")
    first = avi.find(b"00dc", i)
    assert avi[first + 8:first + 10] == b"\xff\xd8"


def test_roundtrip_all_frames():
    frames = _frames()
    dec, meta = decode_avi(encode_avi(frames, fps=5, quality=95))
    assert meta == {"n_frames": 6, "fps": 5.0, "fourcc": "MJPG"}
    assert len(dec) == 6
    for f, d in zip(frames, dec):
        assert d.shape == f.shape
        assert np.abs(d.astype(int) - f.astype(int)).max() <= 1


def test_selective_frame_decode():
    frames = _frames()
    avi = encode_avi(frames, fps=5, quality=95)
    dec, meta = decode_avi(avi, frame_indices=[1, 4])
    assert meta["n_frames"] == 6 and len(dec) == 2
    assert np.abs(dec[0].astype(int) - frames[1].astype(int)).max() <= 1
    assert np.abs(dec[1].astype(int) - frames[4].astype(int)).max() <= 1
    # empty index list: chunk walk only, zero decodes
    none, meta2 = decode_avi(avi, frame_indices=[])
    assert none == [] and meta2["n_frames"] == 6


def test_grayscale_frames_roundtrip():
    frames = [np.full((16, 16), 40 * i, np.uint8) for i in range(4)]
    dec, meta = decode_avi(encode_avi(frames, fps=2, quality=95))
    assert meta["n_frames"] == 4
    assert dec[0].shape == (16, 16, 1)
    assert np.abs(int(dec[3][0, 0, 0]) - 120) <= 1


def test_error_paths():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi(b"RIFF\x00\x00\x00\x00WAVEjunk")
    avi = bytearray(encode_avi(_frames(2)))
    i = avi.find(b"vids") + 4
    avi[i:i + 4] = b"H264"
    with pytest.raises(ValueError, match="fourcc"):
        decode_avi(bytes(avi))
    with pytest.raises(ValueError, match="no frames"):
        encode_avi([])


def test_video_operators_end_to_end(spark):
    from see_spark.operators.multimodal import (
        video_features,
        video_frame_sample,
    )

    frames = _frames()
    good = encode_avi(frames, fps=5, quality=95)
    media = spark.createDataFrame(
        [("v1", good), ("bad", b"RIFF\x00\x00\x00\x00WAVEjunk")],
        "media_id string, payload binary",
    )
    feats = {r["media_id"]: r for r in video_features(media).collect()}
    assert feats["v1"]["decode_error"] is None
    assert feats["v1"]["n_frames"] == 6
    assert feats["v1"]["fps"] == pytest.approx(5.0)
    assert (feats["v1"]["width"], feats["v1"]["height"]) == (48, 32)
    expected_mean = float(
        np.mean([f.astype("float64").mean() for f in frames])
    )
    assert feats["v1"]["pixel_mean"] == pytest.approx(expected_mean, abs=1.0)
    assert feats["bad"]["decode_error"] is not None

    sampled = video_frame_sample(media, stride=2).collect()
    got = sorted((r["media_id"], r["frame_no"]) for r in sampled)
    assert got == [("v1", 0), ("v1", 2), ("v1", 4)]
    for r in sampled:
        assert (r["width"], r["height"]) == (48, 32)


def test_decode_buffer_video_path():
    from see_spark.operators.multimodal import _decode_buffer

    frames = _frames(2, h=8, w=8)
    buf = _decode_buffer(encode_avi(frames, quality=95), "video", fake=False)
    assert buf.shape == (2 * 8 * 8 * 3,)
