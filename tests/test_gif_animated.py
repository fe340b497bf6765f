"""Animated-GIF frame decode (core/gif.py:decode_gif_frames + the
encode_gif_animated fixture muxer): canvas compositing per GIF89a §23
graphic control extensions — sub-rectangle deltas, transparent-index
holes, disposal methods 0/1 (keep), 2 (restore background), 3 (restore
previous) — plus selective frame copy-out and the video operators over
GIF payloads."""

from __future__ import annotations

import numpy as np
import pytest

from see_spark.core.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif_animated,
)

PAL = np.array(
    [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255],
     [255, 255, 0], [255, 0, 255], [0, 255, 255], [255, 255, 255]],
    dtype=np.uint8,
)


def test_full_frame_animation_roundtrip():
    rng = np.random.default_rng(1)
    fr = [rng.integers(0, 8, (6, 7), dtype=np.uint8) for _ in range(4)]
    frames, meta = decode_gif_frames(encode_gif_animated(fr, PAL))
    assert meta["n_frames"] == 4
    assert len(frames) == 4
    for got, idx in zip(frames, fr):
        assert np.array_equal(got, PAL[idx])


def test_delta_frame_composites_over_previous():
    """Frame 1 is a 2x2 patch at (top=1, left=2) with transparent index
    0: the hole shows frame 0's pixels."""
    base = np.full((5, 6), 7, np.uint8)
    patch = np.array([[1, 0], [0, 2]], dtype=np.uint8)
    payload = encode_gif_animated(
        [base, patch], PAL, offsets=[(0, 0), (2, 1)], transparent=0
    )
    frames, meta = decode_gif_frames(payload)
    assert meta["n_frames"] == 2
    want = PAL[base].copy()
    want[1, 2] = PAL[1]  # patch[0,0]
    want[2, 3] = PAL[2]  # patch[1,1]; holes (0s) keep base
    assert np.array_equal(frames[1], want)
    # frame 0: transparent index 0 punches holes to the BACKGROUND color
    # (bg_index default 0 -> PAL[0]); base has no 0s, so fully drawn
    assert np.array_equal(frames[0], PAL[base])


def test_disposal_restore_background():
    """Disposal 2 on frame 0's sub-rect: frame 1 (elsewhere) sees the
    background color in that rect."""
    full = np.full((4, 4), 7, np.uint8)
    spot = np.full((2, 2), 1, np.uint8)
    dot = np.full((1, 1), 2, np.uint8)
    payload = encode_gif_animated(
        [full, spot, dot],
        PAL,
        offsets=[(0, 0), (1, 1), (3, 3)],
        disposals=[0, 2, 0],
        bg_index=3,
    )
    frames, _ = decode_gif_frames(payload)
    # frame 1 shows the spot
    assert np.array_equal(frames[1][1:3, 1:3], PAL[np.full((2, 2), 1)])
    # frame 2: spot's rect restored to background (index 3), dot drawn
    assert np.array_equal(frames[2][1:3, 1:3], PAL[np.full((2, 2), 3)])
    assert np.array_equal(frames[2][3, 3], PAL[2])
    # untouched area still frame-0 content
    assert np.array_equal(frames[2][0, 0], PAL[7])


def test_disposal_restore_previous():
    full = np.full((4, 4), 7, np.uint8)
    spot = np.full((2, 2), 1, np.uint8)
    dot = np.full((1, 1), 2, np.uint8)
    payload = encode_gif_animated(
        [full, spot, dot],
        PAL,
        offsets=[(0, 0), (1, 1), (0, 0)],
        disposals=[0, 3, 0],
    )
    frames, _ = decode_gif_frames(payload)
    # frame 2: spot's rect restored to frame-0 pixels
    assert np.array_equal(frames[2][1:3, 1:3], PAL[np.full((2, 2), 7)])
    assert np.array_equal(frames[2][0, 0], PAL[2])


def test_frame_indices_copy_out_matches_full_decode():
    rng = np.random.default_rng(3)
    fr = [rng.integers(0, 8, (5, 5), dtype=np.uint8) for _ in range(6)]
    payload = encode_gif_animated(fr, PAL)
    full, meta = decode_gif_frames(payload)
    some, meta2 = decode_gif_frames(payload, frame_indices=[0, 3, 5])
    assert meta2["n_frames"] == meta["n_frames"] == 6
    assert len(some) == 3
    for got, i in zip(some, [0, 3, 5]):
        assert np.array_equal(got, full[i])


def test_fps_from_gce_delays():
    fr = [np.zeros((2, 2), np.uint8)] * 3
    _, meta = decode_gif_frames(
        encode_gif_animated(fr, PAL, delays_cs=[5, 5, 5])
    )
    assert meta["fps"] == pytest.approx(20.0)


def test_first_frame_contract_of_decode_gif_unchanged():
    """decode_gif stays the image-path first-block decode: it returns
    frame 0's BLOCK (its own rect), not the composited canvas."""
    base = np.full((3, 3), 7, np.uint8)
    patch = np.zeros((1, 1), np.uint8)
    payload = encode_gif_animated([base, patch], PAL, offsets=[(0, 0), (1, 1)])
    assert np.array_equal(decode_gif(payload), PAL[base])


def test_malformed_animation_raises_valueerror():
    base = np.full((3, 3), 1, np.uint8)
    payload = bytearray(encode_gif_animated([base, base], PAL))
    rng = np.random.default_rng(0)
    for _ in range(60):
        buf = bytearray(payload)
        for _ in range(int(rng.integers(1, 4))):
            buf[int(rng.integers(6, len(buf)))] = int(rng.integers(0, 256))
        try:
            decode_gif_frames(bytes(buf))
        except ValueError:
            pass
    # frame exceeding the canvas must raise, not scatter out of bounds:
    # encode on a 4x4 canvas at (1,1), then shrink the logical screen
    # descriptor to 3x3
    import struct

    crafted = bytearray(
        encode_gif_animated([base], PAL, canvas=(4, 4), offsets=[(1, 1)])
    )
    crafted[6:10] = struct.pack("<HH", 3, 3)
    with pytest.raises(ValueError, match="logical screen"):
        decode_gif_frames(bytes(crafted))


def test_video_operators_over_animated_gif(spark):
    from see_spark.operators.multimodal import (
        video_features,
        video_frame_sample,
    )

    rng = np.random.default_rng(9)
    fr = [rng.integers(0, 8, (8, 10), dtype=np.uint8) for _ in range(7)]
    payload = encode_gif_animated(fr, PAL, delays_cs=[4] * 7)
    media = spark.createDataFrame(
        [
            ("anim", "video", bytes(payload)),
            ("junk", "video", b"\x00\x01"),
        ],
        "media_id string, kind string, payload binary",
    )
    feats = {r["media_id"]: r for r in video_features(media).collect()}
    assert feats["anim"]["decode_error"] is None
    assert feats["anim"]["n_frames"] == 7
    assert feats["anim"]["fps"] == pytest.approx(25.0)
    assert (feats["anim"]["width"], feats["anim"]["height"]) == (10, 8)
    assert feats["junk"]["decode_error"] is not None

    sampled = video_frame_sample(media, stride=3).collect()
    got = {(r["media_id"], r["frame_no"]) for r in sampled}
    assert got == {("anim", 0), ("anim", 3), ("anim", 6)}
    full, _ = decode_gif_frames(payload)
    by_no = {r["frame_no"]: r for r in sampled}
    for i in (0, 3, 6):
        assert by_no[i]["frame_mean"] == pytest.approx(
            float(full[i].astype("float64").mean())
        )
