"""Minimal MJPEG-in-AVI video codec — stdlib + the in-repo JPEG codec.

The last real-decode path for the multimodal pipeline: the container has
no ffmpeg-class libraries, but AVI is a plain RIFF container (the same
chunk grammar as WAV, Microsoft AVI RIFF spec / OpenDML) and Motion-JPEG
stores every frame as an ordinary JPEG — which ``core.jpeg`` already
decodes, baseline or progressive. Scope is the honest subset the pattern
supports: single video stream, 'MJPG'/'mjpg'/'dmb1' fourcc, frames in
``00dc``/``00db`` chunks. Anything else (compressed fourccs like H.264,
multi-stream interleaves' audio chunks are skipped not decoded) raises
ValueError with the reason; at scale those rows route to a decode_error
column, never killing the job — the same contract as PNG/GIF/WAV/JPEG.

The matching muxer exists so tests and fixtures can synthesize real AVI
files deterministically (frames encoded via ``core.jpeg.encode_jpeg``),
mirroring the PNG/GIF/JPEG encoder convention.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg

_MJPG_FOURCCS = {b"MJPG", b"mjpg", b"dmb1", b"MJPA"}


def _chunks(data: bytes, start: int, end: int):
    """Iterate (fourcc, payload_start, payload_size) over a RIFF chunk
    run; chunks are word-aligned (odd sizes pad one byte)."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)


def decode_avi(payload: bytes, frame_indices=None):
    """AVI bytes -> (frames, meta). ``frames`` is a list of uint8
    (h, w, ch) arrays — every frame, or only ``frame_indices`` (sorted
    unique ints) when given (the frame-sampling path: undecoded frames
    cost only the chunk walk). ``meta`` carries n_frames / fps / fourcc.
    ValueError for non-AVI RIFF, non-MJPEG fourcc, or corrupt frames —
    including any low-level unpack/slice error from corrupt chunk
    headers, re-raised as ValueError so callers can filter on one type
    (same contract as ``core.jpeg.decode_jpeg``)."""
    try:
        return _decode_avi_impl(payload, frame_indices)
    except ValueError:
        raise
    except (struct.error, KeyError, IndexError) as e:
        raise ValueError(f"corrupt AVI ({type(e).__name__}: {e})") from e


def _decode_avi_impl(payload: bytes, frame_indices=None):
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (missing RIFF/AVI signature)")
    want = None
    if frame_indices is not None:
        want = set(int(i) for i in frame_indices)

    fourcc_video = None
    video_stream = None  # two-ASCII-digit stream id of the vids strl
    rate = scale = None
    movi_runs = []
    strl_no = 0
    # top-level walk: LIST hdrl (stream headers), LIST movi (frame data)
    for tag, start, size in _chunks(payload, 12, len(payload)):
        if tag != b"LIST":
            continue
        list_type = payload[start:start + 4]
        if list_type == b"hdrl":
            for t2, s2, z2 in _chunks(payload, start + 4, start + size):
                if t2 == b"LIST" and payload[s2:s2 + 4] == b"strl":
                    for t3, s3, z3 in _chunks(payload, s2 + 4, s2 + z2):
                        if t3 == b"strh" and payload[s3:s3 + 4] == b"vids":
                            if video_stream is not None:
                                # two video streams: interleaving both
                                # into one frame sequence would be
                                # silently wrong — out of scope, raise
                                raise ValueError(
                                    "multiple video streams unsupported"
                                )
                            fourcc_video = payload[s3 + 4:s3 + 8]
                            video_stream = b"%02d" % strl_no
                            scale, rate = struct.unpack(
                                "<II", payload[s3 + 20:s3 + 28]
                            )
                    strl_no += 1
        elif list_type == b"movi":
            movi_runs.append((start + 4, start + size))

    if fourcc_video is None:
        raise ValueError("no video stream header (strh/vids) found")
    if fourcc_video not in _MJPG_FOURCCS:
        raise ValueError(
            f"video fourcc {fourcc_video!r} unsupported (MJPEG only — "
            "H.264-class codecs need libraries absent from this container)"
        )
    if not movi_runs:
        raise ValueError("no movi data list found")

    frames = []
    n_seen = 0
    for mstart, mend in movi_runs:
        for tag, start, size in _chunks(payload, mstart, mend):
            # '##dc' compressed / '##db' uncompressed video chunks OF
            # THE vids STREAM only (an audio-first file's '01dc' chunks
            # must not decode as frames); skip audio ('##wb') and index
            # chunks
            if tag[2:4] not in (b"dc", b"db") or tag[:2] != video_stream:
                continue
            if want is None or n_seen in want:
                frames.append(decode_jpeg(payload[start:start + size]))
            n_seen += 1
    fps = (rate / scale) if (rate and scale) else 0.0
    return frames, {
        "n_frames": n_seen,
        "fps": fps,
        "fourcc": fourcc_video.decode("ascii", "replace"),
    }


def encode_avi(frames, fps: int = 10, quality: int = 90) -> bytes:
    """uint8 (h, w[, ch]) frame arrays -> MJPEG AVI bytes (with idx1)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(tag: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return tag + struct.pack("<I", len(body)) + body + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, max_bytes * fps, 0, 0x10,  # us/frame, rate, _, HASINDEX
        len(jpegs), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack(
            "<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(jpegs),
            max_bytes, 0xFFFFFFFF, 0, 0
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D,  # 'MJPG'
        w * h * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", j) for j in jpegs)
    movi = lst(b"movi", movi_body)
    # idx1: offsets relative to the start of the movi list type field
    idx = b""
    off = 4
    for j in jpegs:
        size = len(j)
        idx += b"00dc" + struct.pack("<III", 0x10, off, size)
        off += 8 + size + (size & 1)
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
