"""Minimal GIF codec — stdlib only (struct + numpy).

A second REAL image decode path for the multimodal pipeline (beside
core/png.py): GIF87a/89a with full LZW decompression implemented from
the spec (GIF89a specification Appendix F; variable 3..12-bit codes,
LSB-first packing, Clear/EOI codes, the KwKwK code==next case). Scope
covers real-world GIFs: interlaced or not, global or local color
tables, and ANIMATION — ``decode_gif`` keeps the image-path first-frame
contract (extensions walked and skipped), while ``decode_gif_frames``
composites every frame per the GIF89a §23 graphic-control model
(sub-rect deltas, transparent-index holes, disposal keep / restore-
background / restore-previous) for the video path. Interlaced frames store
rows in the spec's four-pass order (rows 0,8,16..., then 4,12..., then
2,6,10..., then odd rows — GIF89a §20 appendix E) and are reordered
after LZW. Out-of-subset features raise ValueError with the reason — at
100 TB those rows route to the decode_error column, they don't kill the
job (same contract as decode_png / decode_wav).

``decode_gif`` returns an (h, w, 3) uint8 RGB array via palette lookup.

``encode_gif`` exists so tests can synthesize real GIFs
deterministically: it emits literal LZW codes with a preemptive Clear
before the decoder's table would force a code-width change ("LZW-less"
encoding — every conformant decoder accepts it; size is irrelevant for
fixtures). Conformance of the DECODER is additionally pinned by a
hand-packed bitstream in tests/test_gif.py, not only by roundtrip.
"""

from __future__ import annotations

import struct

import numpy as np

# shared decode-bomb bound (defined once, in core.jpeg)
from .jpeg import MAX_IMAGE_PIXELS


def _color_table(data: bytes, pos: int, packed: int):
    """Read a color table if the flag bit is set; returns (table|None, pos)."""
    if not packed & 0x80:
        return None, pos
    n = 2 << (packed & 0x07)
    table = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
    if table.shape[0] != n:
        raise ValueError("truncated color table")
    return table, pos + 3 * n


def _sub_blocks(data: bytes, pos: int):
    """Concatenate data sub-blocks; returns (bytes, pos past terminator)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("unterminated sub-blocks")
        size = data[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        out += data[pos : pos + size]
        pos += size


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    next_code = eoi + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: int | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = table[: eoi + 1]
                next_code = eoi + 1
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                if len(out) < n_pixels:
                    raise ValueError("EOI before all pixels decoded")
                return bytes(out[:n_pixels])
            if prev is None:
                if code >= len(table):
                    raise ValueError(f"first code {code} out of table")
                out += table[code]
            else:
                if code < next_code:
                    entry = table[code]
                elif code == next_code:  # the KwKwK case
                    entry = table[prev] + table[prev][:1]
                else:
                    raise ValueError(f"code {code} beyond table {next_code}")
                out += entry
                if next_code < 4096:
                    table.append(table[prev] + entry[:1])
                    next_code += 1
                    if next_code == (1 << width) and width < 12:
                        width += 1
            prev = code
            if len(out) >= n_pixels:
                # some encoders omit EOI; accept once output is complete
                return bytes(out[:n_pixels])
    raise ValueError("bitstream ended before EOI")


def _interlace_order(h: int) -> np.ndarray:
    """Display-row index of each STORED row under GIF's four-pass
    interlace (GIF89a appendix E): rows 0,8,16..., then 4,12,20...,
    then 2,6,10... (step 4), then 1,3,5... (step 2)."""
    return np.array(
        [*range(0, h, 8), *range(4, h, 8), *range(2, h, 4), *range(1, h, 2)],
        dtype=np.int64,
    )


def decode_gif(payload: bytes) -> np.ndarray:
    data = bytes(payload)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    if len(data) < 13:
        raise ValueError("truncated screen descriptor")
    packed = data[10]
    global_table, pos = _color_table(data, 13, packed)
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte + sub-blocks
            pos += 1
            _, pos = _sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        _, _, w, h, ipacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if w * h > MAX_IMAGE_PIXELS:
            # decode-bomb guard (shared bound, core.jpeg): LZW's
            # ~1000:1 expansion plus the (h, w, 3) palette expansion
            # would otherwise allocate from a corrupt 4-byte descriptor
            raise ValueError(
                f"image {w}x{h} exceeds MAX_IMAGE_PIXELS "
                f"({MAX_IMAGE_PIXELS}) decode-bomb guard"
            )
        interlaced = bool(ipacked & 0x40)
        local_table, pos = _color_table(data, pos, ipacked)
        table = local_table if local_table is not None else global_table
        if table is None:
            raise ValueError("no color table")
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"bad LZW min code size {min_code_size}")
        compressed, pos = _sub_blocks(data, pos)
        idx = np.frombuffer(
            _lzw_decode(min_code_size, compressed, w * h), dtype=np.uint8
        )
        if int(idx.max(initial=0)) >= table.shape[0]:
            raise ValueError("pixel index beyond color table")
        rows = idx.reshape(h, w)
        if interlaced:
            # stored row i is display row order[i]: scatter back
            display = np.empty_like(rows)
            display[_interlace_order(h)] = rows
            rows = display
        return table[rows.reshape(-1)].reshape(h, w, 3)
    raise ValueError("no image block before trailer")


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """(h, w) uint8 index array + (n, 3) palette -> GIF89a bytes.

    Literal-code LZW: each pixel is emitted as its own code, with a
    Clear emitted whenever the decoder's next table entry would force a
    width change, so the stream stays at min_code_size+1 bits/code.
    ``interlace=True`` stores rows in the four-pass order (and sets the
    descriptor flag) so interlaced fixtures have exact plain twins."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    if interlace:
        idx = idx[_interlace_order(h)]
    n = pal.shape[0]
    bits = max(2, (n - 1).bit_length())
    if n > 256 or pal.shape[1] != 3:
        raise ValueError("palette must be (<=256, 3)")
    full = 1 << bits
    pal_bytes = np.vstack([pal, np.zeros((full - n, 3), np.uint8)]).tobytes()

    clear = 1 << bits
    eoi = clear + 1
    width = bits + 1
    codes: list[int] = [clear]
    next_code = eoi + 1
    for px in idx.reshape(-1).tolist():
        # reading a literal makes the decoder add one entry (after the
        # first post-clear code); clear preemptively so width never grows
        if next_code + 1 == (1 << width):
            codes.append(clear)
            next_code = eoi + 1
        codes.append(int(px))
        next_code += 1
    codes.append(eoi)

    acc = 0
    nbits = 0
    stream = bytearray()
    for code in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        stream.append(acc & 0xFF)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += pal_bytes
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(bits)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif_frames(payload: bytes, frame_indices=None):
    """ALL frames of a (possibly animated) GIF -> (frames, meta) — the
    video-path sibling of ``decode_gif`` (which keeps its first-frame
    image contract). Animated GIFs are delta-encoded: each image block
    draws a sub-rectangle onto the logical-screen canvas, graphic
    control extensions (GIF89a §23) declare per-frame transparency,
    delay, and disposal. Compositing follows the browser model:
    disposal 0/1 keep the canvas, 2 restores the frame's rectangle to
    the background color, 3 restores the pre-frame pixels. Every frame
    must be decoded+composited to keep canvas state (delta encoding —
    unlike MJPEG there is no skip-cheaply path), but only the frames in
    ``frame_indices`` are COPIED out. Frames return as full-canvas
    (H, W, 3) RGB; ``meta`` carries n_frames / fps (100/mean delay) /
    canvas size. ValueError for malformed input (same contract as every
    codec here)."""
    data = bytes(payload)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    if len(data) < 13:
        raise ValueError("truncated screen descriptor")
    W, H = struct.unpack("<HH", data[6:10])
    if W * H > MAX_IMAGE_PIXELS:
        raise ValueError(
            f"canvas {W}x{H} exceeds MAX_IMAGE_PIXELS "
            f"({MAX_IMAGE_PIXELS}) decode-bomb guard"
        )
    if W == 0 or H == 0:
        raise ValueError("zero canvas dimension")
    packed = data[10]
    bg_index = data[11]
    global_table, pos = _color_table(data, 13, packed)
    if global_table is not None and bg_index < global_table.shape[0]:
        bg_rgb = global_table[bg_index]
    else:
        bg_rgb = np.zeros(3, np.uint8)
    canvas = np.empty((H, W, 3), np.uint8)
    canvas[:] = bg_rgb
    want = set(int(i) for i in frame_indices) if frame_indices is not None else None

    frames = []
    delays = []
    gce_transparent = None
    gce_disposal = 0
    gce_delay = 0
    n_seen = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            body, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # graphic control
                flags = body[0]
                gce_disposal = (flags >> 2) & 0x07
                gce_delay = body[1] | (body[2] << 8)
                gce_transparent = body[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        if left + w > W or top + h > H:
            raise ValueError("image block exceeds logical screen")
        local_table, pos = _color_table(data, pos, ipacked)
        table = local_table if local_table is not None else global_table
        if table is None:
            raise ValueError("no color table")
        min_code_size = data[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"bad LZW min code size {min_code_size}")
        compressed, pos = _sub_blocks(data, pos)
        idx = np.frombuffer(
            _lzw_decode(min_code_size, compressed, w * h), dtype=np.uint8
        ).reshape(h, w)
        if ipacked & 0x40:  # interlaced frame
            display = np.empty_like(idx)
            display[_interlace_order(h)] = idx
            idx = display
        region = canvas[top:top + h, left:left + w]
        saved = region.copy() if gce_disposal == 3 else None
        if gce_transparent is not None:
            mask = idx != gce_transparent
            opaque = idx[mask]
            if opaque.size and int(opaque.max()) >= table.shape[0]:
                raise ValueError("pixel index beyond color table")
            region[mask] = table[opaque]
        else:
            if int(idx.max(initial=0)) >= table.shape[0]:
                raise ValueError("pixel index beyond color table")
            region[:] = table[idx]
        if want is None or n_seen in want:
            frames.append(canvas.copy())
        delays.append(gce_delay)
        if gce_disposal == 2:
            canvas[top:top + h, left:left + w] = bg_rgb
        elif gce_disposal == 3:
            canvas[top:top + h, left:left + w] = saved
        gce_transparent = None
        gce_disposal = 0
        gce_delay = 0
        n_seen += 1
    if n_seen == 0:
        raise ValueError("no image block before trailer")
    mean_delay = sum(delays) / len(delays)
    fps = (100.0 / mean_delay) if mean_delay > 0 else 0.0
    return frames, {
        "n_frames": n_seen,
        "fps": fps,
        "width": int(W),
        "height": int(H),
    }


def encode_gif_animated(
    frames,
    palette: np.ndarray,
    delays_cs=None,
    disposals=None,
    transparent: int = None,
    offsets=None,
    canvas=None,
    bg_index: int = 0,
) -> bytes:
    """Animated-GIF muxer for fixtures: each entry of ``frames`` is an
    (h_i, w_i) index array drawn at ``offsets[i]`` (default (0, 0)) on a
    ``canvas`` = (H, W) logical screen (default: frame 0's size), with a
    per-frame graphic control extension carrying delay (centiseconds),
    disposal method, and the shared ``transparent`` index. Same
    literal-code LZW as ``encode_gif`` (each pixel its own code, Clear
    before any width change)."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    pal = np.asarray(palette, dtype=np.uint8)
    if not frames:
        raise ValueError("no frames")
    n = pal.shape[0]
    if n > 256 or pal.shape[1] != 3:
        raise ValueError("palette must be (<=256, 3)")
    bits = max(2, (n - 1).bit_length())
    full = 1 << bits
    pal_bytes = np.vstack([pal, np.zeros((full - n, 3), np.uint8)]).tobytes()
    H, W = canvas if canvas is not None else frames[0].shape
    offsets = offsets or [(0, 0)] * len(frames)
    delays_cs = delays_cs or [10] * len(frames)
    disposals = disposals or [0] * len(frames)

    def lzw_literal(values) -> bytes:
        clear = 1 << bits
        eoi = clear + 1
        width = bits + 1
        codes = [clear]
        next_code = eoi + 1
        for px in values:
            if next_code + 1 == (1 << width):
                codes.append(clear)
                next_code = eoi + 1
            codes.append(int(px))
            next_code += 1
        codes.append(eoi)
        acc = nbits = 0
        stream = bytearray()
        for code in codes:
            acc |= code << nbits
            nbits += width
            while nbits >= 8:
                stream.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8
        if nbits:
            stream.append(acc & 0xFF)
        return bytes(stream)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack(
        "<HHBBB", W, H, 0x80 | ((bits - 1) & 0x07), bg_index, 0
    )
    out += pal_bytes
    for f, (left, top), delay, disp in zip(frames, offsets, delays_cs, disposals):
        h, w = f.shape
        if left + w > W or top + h > H:
            raise ValueError("frame exceeds canvas")
        flags = ((disp & 0x07) << 2) | (0x01 if transparent is not None else 0)
        out += b"\x21\xf9\x04" + bytes(
            [flags, delay & 0xFF, (delay >> 8) & 0xFF,
             transparent if transparent is not None else 0]
        ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", left, top, w, h, 0)
        out.append(bits)
        stream = lzw_literal(f.reshape(-1).tolist())
        for i in range(0, len(stream), 255):
            chunk = stream[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
