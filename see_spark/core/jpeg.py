"""Minimal baseline JPEG codec — stdlib + numpy only.

The third (and largest-coverage) real image decode path for the
multimodal pipeline: most of a real crawl's media rows are JPEG, and the
container has no PIL/libjpeg, so the decoder is built from the public
spec (ITU-T T.81 / ISO 10918-1): marker walk, DQT/DHT/SOF0/SOS/DRI
parsing, MSB-first Huffman entropy decode with 0xFF00 byte-stuffing and
RST0-7 restart handling, DC prediction + AC run-length, dequantize,
inverse zigzag, 8x8 IDCT (exact float basis-matrix form), level shift,
per-component plane assembly with h/v sampling factors (4:4:4, 4:2:2,
4:2:0), nearest-neighbor chroma upsampling, and JFIF full-range
YCbCr->RGB.

Scope — the overwhelming majority of the web's JPEGs: BASELINE
sequential DCT (SOF0/1) and PROGRESSIVE (SOF2 — spectral selection +
successive approximation per T.81 Annex G: DC first/refine, AC first
with EOB runs, AC refinement with correction bits), 8-bit, 1, 3, or 4
components — 4-component print-workflow streams (Adobe CMYK / YCCK)
decode via the APP14 ColorTransform byte and the libjpeg-consumer
display composite (see _planes_to_image). Arithmetic coding,
hierarchical, lossless, 12-bit, and 4-component streams WITHOUT APP14
raise ValueError with the reason; at 100 TB those rows route to the
decode_error column (operators/multimodal.py:image_features), they never
kill the job — the same contract as the PNG/GIF/WAV codecs. The
progressive path is cross-validated against OpenJDK ImageIO's
progressive encoder output (4:2:0 color and grayscale).

The matching baseline encoder (Annex K quant + Huffman tables, 4:4:4)
exists so tests and fixtures can synthesize real JPEGs deterministically
without any external library, mirroring core/png.py's encoder.
"""

from __future__ import annotations

import struct

import numpy as np

# Decode-bomb guard (the same idea — and default bound — as Pillow's
# Image.MAX_IMAGE_PIXELS): refuse SOF dimensions whose pixel count
# exceeds this before allocating planes. A corrupt/adversarial 2-byte
# header can otherwise make one row of a 100-TB media scan allocate
# ~12 GB inside a Python worker. Module-level so a deployment that
# really ingests larger stills can raise it deliberately.
MAX_IMAGE_PIXELS = 89_478_485

# Inverse-zigzag: ZIGZAG[i] = block index (row*8+col) of the i-th
# coefficient in transmission order (T.81 Figure A.6).
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# 8x8 DCT-II basis: A[k, n] = c(k) cos((2n+1) k pi / 16).
# IDCT(X) = A.T @ X @ A; FDCT(x) = A @ x @ A.T — orthonormal, exact.
_A = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(0.125) if _k == 0 else np.sqrt(0.25)
    for _n in range(8):
        _A[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


class _HuffTable:
    """Canonical Huffman table from a DHT segment's (BITS, HUFFVAL),
    compiled to a flat 16-bit-peek lookup (the classic fast decoder):
    ``sym[peek16]``/``length[peek16]`` give the decoded symbol and its
    code length in one index — no per-bit loop. length 0 marks bit
    patterns no code owns (corrupt/truncated stream).

    Construction is numpy slice-fills and the compiled tables are cached
    by (BITS, HUFFVAL): web JPEGs overwhelmingly ship the Annex-K
    tables, so a media sweep pays the build once, not per image."""

    _cache: dict = {}

    def __new__(cls, counts: list, symbols: bytes):
        key = (tuple(counts), bytes(symbols))
        hit = cls._cache.get(key)
        if hit is not None:
            return hit
        self = super().__new__(cls)
        if sum(counts) > len(symbols):
            raise ValueError("truncated Huffman table")
        sym = np.zeros(65536, dtype=np.int32)
        ln = np.zeros(65536, dtype=np.int32)
        code = 0
        k = 0
        for length in range(1, 17):
            span = 1 << (16 - length)
            for _ in range(counts[length - 1]):
                base = code << (16 - length)
                sym[base:base + span] = symbols[k]
                ln[base:base + span] = length
                code += 1
                k += 1
            code <<= 1
        # plain lists index faster than numpy scalars in the decode loop
        self.sym = sym.tolist()
        self.length = ln.tolist()
        if len(cls._cache) >= 64:  # adversarial per-image DHTs: bound it
            cls._cache.clear()
        cls._cache[key] = self
        return self


def _split_entropy(data: bytes, pos: int) -> tuple:
    """(chunks, end): entropy-coded segments from SOS payload start to
    the next real marker (``end`` = its offset), split at RST0-7
    boundaries, 0xFF00 stuffing removed."""
    chunks = []
    start = pos
    i = pos
    n = len(data)
    while i < n - 1:
        if data[i] == 0xFF:
            m = data[i + 1]
            if m == 0x00:
                i += 2
                continue
            chunks.append(data[start:i].replace(b"\xff\x00", b"\xff"))
            if 0xD0 <= m <= 0xD7:
                i += 2
                start = i
                continue
            return chunks, i  # real marker (EOI or next segment)
        i += 1
    chunks.append(data[start:].replace(b"\xff\x00", b"\xff"))
    return chunks, n


class _BitReader:
    """MSB-first reader over ONE destuffed entropy chunk. The 16-bit
    Huffman peek legitimately reads up to 2 bytes past the end of a
    valid stream, so running out pads with 0x00 (libjpeg's fill-bit
    convention) — but the moment a pad bit is actually CONSUMED (not
    just peeked) the stream is truncated and ValueError is raised:
    0x00/0xFF pads can both decode as valid canonical Huffman symbols,
    so silently decoding them would fabricate trailing pixels."""

    __slots__ = ("data", "n", "pos", "acc", "bits", "padded")

    def __init__(self, data: bytes):
        self.data = data
        self.n = len(data)
        self.pos = 0
        self.acc = 0
        self.bits = 0
        self.padded = 0

    def _need(self, k: int):
        while self.bits < k:
            if self.pos < self.n:
                b = self.data[self.pos]
                self.pos += 1
            else:
                if self.padded > 4:
                    raise ValueError("truncated entropy stream")
                self.padded += 1
                b = 0x00
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFFFFFF
            self.bits += 8

    def _check_consumed(self):
        # loaded bits minus still-buffered bits = consumed bits; eating
        # into the pad region means the real stream ended mid-symbol
        if (self.pos + self.padded) * 8 - self.bits > self.n * 8:
            raise ValueError("truncated entropy stream")

    def decode_symbol(self, table: _HuffTable) -> int:
        self._need(16)
        w = (self.acc >> (self.bits - 16)) & 0xFFFF
        length = table.length[w]
        if length == 0:
            raise ValueError("invalid Huffman code")
        self.bits -= length
        if self.padded:
            self._check_consumed()
        return table.sym[w]

    def receive(self, k: int) -> int:
        if k == 0:
            return 0
        self._need(k)
        self.bits -= k
        if self.padded:
            self._check_consumed()
        return (self.acc >> self.bits) & ((1 << k) - 1)


def _extend(v: int, size: int) -> int:
    """DC/AC magnitude category decode (T.81 F.12)."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 (h, w, ch) array, ch 1 (gray) or 3 (RGB).
    Baseline sequential (SOF0/1) and progressive (SOF2: spectral
    selection + successive approximation, T.81 Annex G) both decode;
    ValueError for anything else (arithmetic, lossless, 12-bit) AND for
    any malformed/truncated input — low-level unpack/lookup errors from
    corrupt segments (truncated DQT, SOS naming an undefined table id,
    …) are re-raised as ValueError so callers can filter on one type."""
    try:
        return _decode_jpeg_impl(payload)
    except ValueError:
        raise
    except (struct.error, KeyError, IndexError) as e:
        raise ValueError(
            f"corrupt JPEG ({type(e).__name__}: {e})"
        ) from e


def _decode_jpeg_impl(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict = {}
    huff_dc: dict = {}
    huff_ac: dict = {}
    restart_interval = 0
    frame = None
    prog = None
    adobe_transform = None  # APP14 ColorTransform (0 CMYK/RGB, 1 YCbCr, 2 YCCK)
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # parameterless
        seglen = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    vals = list(seg[i:i + 64]); i += 64
                else:
                    vals = list(struct.unpack(f">{64}H", seg[i:i + 128]))
                    i += 128
                table = np.zeros(64)
                for j in range(64):
                    table[ZIGZAG[j]] = vals[j]
                qt[tq] = table.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                total = sum(counts)
                symbols = seg[i + 17:i + 17 + total]
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(
                    counts, symbols
                )
                i += 17 + total
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", seg[:6]
            )
            if precision != 8:
                raise ValueError(f"{precision}-bit precision unsupported")
            if ncomp not in (1, 3, 4):
                raise ValueError(f"{ncomp}-component JPEG unsupported")
            if height == 0 or width == 0:
                raise ValueError("zero image dimension")
            if height * width > MAX_IMAGE_PIXELS:
                # decode-bomb guard (same idea as Pillow's
                # Image.MAX_IMAGE_PIXELS): a 2-byte flip in a corrupt
                # SOF can claim 65535x65535 and a naive decoder would
                # allocate gigabytes inside the executor's Python
                # worker before any entropy data is even read
                raise ValueError(
                    f"image {width}x{height} exceeds MAX_IMAGE_PIXELS "
                    f"({MAX_IMAGE_PIXELS}) decode-bomb guard"
                )
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + ci * 3:9 + ci * 3]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
            if ncomp == 1:
                # T.81 A.2.2: a single-component scan is non-interleaved
                # — one data unit per MCU, sampling factors ignored. Some
                # encoders still write 2x2 factors in SOF; honoring them
                # would desynchronize the entropy stream.
                comps[0]["h"] = comps[0]["v"] = 1
            frame = {
                "h": height, "w": width, "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{marker & 15} JPEG unsupported "
                "(baseline + progressive only)"
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_comps = []
            for si in range(ns):
                cs, tdta = seg[1 + si * 2], seg[2 + si * 2]
                scan_comps.append((cs, tdta >> 4, tdta & 15))
            frame["adobe"] = adobe_transform
            if not frame["progressive"]:
                if ns != len(frame["comps"]):
                    raise ValueError(
                        "non-interleaved multi-scan unsupported"
                    )
                return _decode_scan(
                    payload, pos + seglen, frame,
                    {cs: (td, ta) for cs, td, ta in scan_comps}, qt,
                    huff_dc, huff_ac, restart_interval,
                )
            ss = seg[1 + 2 * ns]
            se = seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if prog is None:
                prog = _ProgState(frame)
            pos = prog.decode_scan(
                payload, pos + seglen, scan_comps,
                ss, se, ahal >> 4, ahal & 15,
                huff_dc, huff_ac, restart_interval,
            )
            continue  # pos already sits at the next marker
        elif marker == 0xEE and seg[:5] == b"Adobe" and len(seg) >= 12:
            # APP14: 'Adobe' + version(2) + flags0(2) + flags1(2) +
            # ColorTransform(1) — the byte that declares CMYK vs YCCK
            # (and RGB-vs-YCbCr for 3-component streams)
            adobe_transform = seg[11]
        # APPn / COM / others: skip
        pos += seglen
    if prog is not None:
        return prog.reconstruct(qt)
    raise ValueError("no scan data found")


def _decode_scan(data, pos, frame, scan_tables, qt, huff_dc, huff_ac,
                 restart_interval):
    comps = frame["comps"]
    h_img, w_img = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w_img + mcu_w - 1) // mcu_w
    mcus_y = (h_img + mcu_h - 1) // mcu_h

    chunks, _end = _split_entropy(data, pos)
    reader = _BitReader(chunks[0])
    chunk_i = 0
    dc_pred = [0] * len(comps)
    mcu_count = 0
    # entropy loop fills per-component coefficient stacks (transmission
    # order); dequant + inverse zigzag + IDCT run batched afterwards
    coefs = [
        np.zeros((mcus_y * mcus_x * c["h"] * c["v"], 64)) for c in comps
    ]
    nblk = [0] * len(comps)
    for _my in range(mcus_y):
        for _mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                chunk_i += 1
                if chunk_i >= len(chunks):
                    raise ValueError("missing restart marker")
                reader = _BitReader(chunks[chunk_i])
                dc_pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                td, ta = scan_tables[c["id"]]
                dc_tab = huff_dc[td]
                ac_tab = huff_ac[ta]
                for _blk in range(c["h"] * c["v"]):
                    coef = coefs[ci][nblk[ci]]
                    nblk[ci] += 1
                    s = reader.decode_symbol(dc_tab)
                    diff = _extend(reader.receive(s), s)
                    dc_pred[ci] += diff
                    coef[0] = dc_pred[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(ac_tab)
                        r, size = rs >> 4, rs & 15
                        if size == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run past block end")
                        coef[k] = _extend(reader.receive(size), size)
                        k += 1
            mcu_count += 1

    # batched back half: one fancy-index inverse zigzag, one dequant
    # broadcast, one einsum IDCT per component — no per-block Python
    izz = np.argsort(ZIGZAG)  # natural index -> transmission position
    out = []
    for ci, c in enumerate(comps):
        qflat = qt[c["tq"]].reshape(-1)
        blocks = (coefs[ci][:, izz] * qflat).reshape(-1, 8, 8)
        pix = np.einsum("ki,nkl,lj->nij", _A, blocks, _A) + 128.0
        # scatter 8x8 blocks into the component plane: MCU raster order,
        # h*v blocks per MCU in (by, bx) order — pure reshape/transpose
        ch, cv = c["h"], c["v"]
        plane = (
            pix.reshape(mcus_y, mcus_x, cv, ch, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcus_y * cv * 8, mcus_x * ch * 8)
        )
        plane = np.repeat(
            np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
        )[:h_img, :w_img]
        out.append(plane)
    return _planes_to_image(out, frame.get("adobe"))


def _ycc_to_rgb(y, cb, cr):
    cb = cb - 128.0
    cr = cr - 128.0
    return (
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    )


def _planes_to_image(out: list, adobe=None) -> np.ndarray:
    """Component planes -> uint8 image. 1 plane: gray passthrough.
    3 planes: JFIF full-range YCbCr->RGB — except Adobe APP14
    transform 0, which declares the planes are already RGB. 4 planes
    (print-workflow JPEGs; requires APP14 — without it the CMYK
    polarity is a guess, so those raise): Adobe stores INVERTED CMYK
    (255-C, ...); transform 2 (YCCK) first maps planes 0-2 through the
    YCbCr matrix back to the inverted CMY, then both transforms
    composite R = S_c*S_k/255 per channel — the libjpeg-consumer
    convention browsers/ImageMagick use for display."""
    if len(out) == 1:
        gray = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    if len(out) == 3:
        if adobe == 0:  # Adobe transform 0 on 3 comps = plain RGB
            rgb = np.stack(out, axis=2)
        else:
            rgb = np.stack(_ycc_to_rgb(out[0], out[1], out[2]), axis=2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    if len(out) == 4:
        if adobe is None:
            raise ValueError(
                "4-component JPEG without Adobe APP14 unsupported "
                "(CMYK polarity undeclared)"
            )
        if adobe == 2:  # YCCK: planes 0-2 are YCbCr of the inverted CMY
            sc, sm, sy = _ycc_to_rgb(out[0], out[1], out[2])
        else:  # transform 0: stored (inverted) CMYK planes directly
            sc, sm, sy = out[0], out[1], out[2]
        sk = np.clip(out[3], 0.0, 255.0)
        rgb = np.stack(
            [np.clip(p, 0.0, 255.0) * sk / 255.0 for p in (sc, sm, sy)],
            axis=2,
        )
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise ValueError(f"{len(out)}-component image unsupported")


class _ProgState:
    """Progressive (SOF2) decode state: per-component coefficient grids
    accumulated across scans (T.81 Annex G / the jdphuff algorithms —
    DC first/refine, AC first with EOB runs, AC refinement with
    correction bits), reconstructed once at EOI through the same
    batched dequant + IDCT back half as the baseline path.

    Coefficients live in TRANSMISSION (zigzag) order per block, exactly
    like the baseline decoder, so ``reconstruct`` shares its math."""

    def __init__(self, frame):
        self.frame = frame
        comps = frame["comps"]
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        self.mcus_x = (frame["w"] + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcus_y = (frame["h"] + 8 * self.vmax - 1) // (8 * self.vmax)
        self.coefs = []
        self.true_blocks = []
        for c in comps:
            by_pad = self.mcus_y * c["v"]
            bx_pad = self.mcus_x * c["h"]
            self.coefs.append(
                np.zeros((by_pad, bx_pad, 64), dtype=np.int64)
            )
            cw = (frame["w"] * c["h"] + self.hmax - 1) // self.hmax
            chs = (frame["h"] * c["v"] + self.vmax - 1) // self.vmax
            self.true_blocks.append(
                ((chs + 7) // 8, (cw + 7) // 8)  # (By_true, Bx_true)
            )
        self.eobrun = 0

    def decode_scan(self, data, pos, scan_comps, ss, se, ah, al,
                    huff_dc, huff_ac, restart_interval):
        """Decode one scan's entropy data; returns the offset of the
        marker that follows it."""
        chunks, end = _split_entropy(data, pos)
        comps = self.frame["comps"]
        id_to_ci = {c["id"]: i for i, c in enumerate(comps)}
        members = [
            (id_to_ci[cs], td, ta) for cs, td, ta in scan_comps
        ]
        reader = _BitReader(chunks[0])
        chunk_i = 0
        dc_pred = [0] * len(comps)
        self.eobrun = 0
        unit = 0

        def maybe_restart():
            nonlocal reader, chunk_i, dc_pred
            if restart_interval and unit and unit % restart_interval == 0:
                chunk_i += 1
                if chunk_i >= len(chunks):
                    raise ValueError("missing restart marker")
                reader = _BitReader(chunks[chunk_i])
                dc_pred = [0] * len(comps)
                self.eobrun = 0

        if len(members) > 1:
            # interleaved scan: DC only (T.81 G.1: Ss = Se = 0)
            if ss != 0 or se != 0:
                raise ValueError(
                    "interleaved progressive scan must be DC-only"
                )
            for my in range(self.mcus_y):
                for mx in range(self.mcus_x):
                    maybe_restart()
                    unit += 1
                    for ci, td, _ta in members:
                        c = comps[ci]
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                block = self.coefs[ci][
                                    my * c["v"] + by, mx * c["h"] + bx
                                ]
                                dc_pred[ci] = self._dc_unit(
                                    reader, block, huff_dc.get(td),
                                    dc_pred[ci], ah, al,
                                )
        else:
            ci, td, ta = members[0]
            by_true, bx_true = self.true_blocks[ci]
            for by in range(by_true):
                for bx in range(bx_true):
                    maybe_restart()
                    unit += 1
                    block = self.coefs[ci][by, bx]
                    if ss == 0:
                        dc_pred[ci] = self._dc_unit(
                            reader, block, huff_dc.get(td),
                            dc_pred[ci], ah, al,
                        )
                    elif ah == 0:
                        self._ac_first(
                            reader, block, huff_ac[ta], ss, se, al
                        )
                    else:
                        self._ac_refine(
                            reader, block, huff_ac[ta], ss, se, al
                        )
        return end

    def _dc_unit(self, reader, block, dc_tab, pred, ah, al):
        if ah == 0:  # first DC scan: full diff, scaled by 2^Al
            s = reader.decode_symbol(dc_tab)
            pred += _extend(reader.receive(s), s)
            block[0] = pred << al
        else:  # refinement: one bit, OR into bit Al
            if reader.receive(1):
                block[0] = int(block[0]) | (1 << al)
        return pred

    def _ac_first(self, reader, block, ac_tab, ss, se, al):
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = reader.decode_symbol(ac_tab)
            r, s = rs >> 4, rs & 15
            if s:
                k += r
                if k > se:
                    raise ValueError("AC run past band end")
                block[k] = _extend(reader.receive(s), s) << al
                k += 1
            else:
                if r != 15:
                    self.eobrun = (1 << r) - 1
                    if r:
                        self.eobrun += reader.receive(r)
                    break
                k += 16  # ZRL

    def _ac_refine(self, reader, block, ac_tab, ss, se, al):
        # T.81 G.1.2.3 successive-approximation AC refinement (the
        # jdphuff decode_mcu_AC_refine control flow): newly-nonzero
        # coefficients arrive as ±2^Al; every already-nonzero
        # coefficient crossed on the way reads one correction bit.
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if self.eobrun == 0:
            while k <= se:
                rs = reader.decode_symbol(ac_tab)
                r, s = rs >> 4, rs & 15
                newval = 0
                if s:
                    if s != 1:
                        raise ValueError("bad AC refinement size")
                    newval = p1 if reader.receive(1) else m1
                else:
                    if r != 15:
                        self.eobrun = 1 << r
                        if r:
                            self.eobrun += reader.receive(r)
                        break
                # advance over r zero-history coefficients, correcting
                # nonzero ones passed over
                while k <= se:
                    cur = int(block[k])
                    if cur != 0:
                        if reader.receive(1) and (cur & p1) == 0:
                            block[k] = cur + (p1 if cur >= 0 else m1)
                    else:
                        if r == 0:
                            if newval:
                                block[k] = newval
                            break
                        r -= 1
                    k += 1
                k += 1
        if self.eobrun > 0:
            while k <= se:
                cur = int(block[k])
                if cur != 0:
                    if reader.receive(1) and (cur & p1) == 0:
                        block[k] = cur + (p1 if cur >= 0 else m1)
                k += 1
            self.eobrun -= 1

    def reconstruct(self, qt):
        """All scans consumed: dequant + inverse zigzag + batched IDCT
        per component, natural grid order, upsample + crop."""
        frame = self.frame
        comps = frame["comps"]
        h_img, w_img = frame["h"], frame["w"]
        izz = np.argsort(ZIGZAG)
        out = []
        for ci, c in enumerate(comps):
            by_pad, bx_pad, _ = self.coefs[ci].shape
            qflat = qt[c["tq"]].reshape(-1)
            flat = self.coefs[ci].reshape(-1, 64).astype(np.float64)
            blocks = (flat[:, izz] * qflat).reshape(-1, 8, 8)
            pix = np.einsum("ki,nkl,lj->nij", _A, blocks, _A) + 128.0
            plane = (
                pix.reshape(by_pad, bx_pad, 8, 8)
                .transpose(0, 2, 1, 3)
                .reshape(by_pad * 8, bx_pad * 8)
            )
            plane = np.repeat(
                np.repeat(plane, self.vmax // c["v"], axis=0),
                self.hmax // c["h"], axis=1,
            )[:h_img, :w_img]
            out.append(plane)
        return _planes_to_image(out, self.frame.get("adobe"))


# T.81 Annex K.1 example quantization tables (spec constants).
_K_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
_K_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

# Annex K.3 typical Huffman tables: (BITS counts, HUFFVAL symbols).
_K_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
_K_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    bytes(range(12)),
)
_K_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    bytes([
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)
_K_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    bytes([
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ]),
)


def _encode_table(counts, symbols):
    """(length, code) per symbol for the encoder side."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, value: int, length: int):
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.buf)
                if self.buf == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.buf = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.write(1, 1)  # pad with 1-bits (spec)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(writer, coef_zz, dc_pred, dc_codes, ac_codes):
    diff = int(coef_zz[0]) - dc_pred
    s = _category(diff)
    length, code = dc_codes[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size = _category(v)
        length, code = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if run:
        length, code = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(coef_zz[0])


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table (public libjpeg convention)."""
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((q * scale + 50) / 100), 1, 255)


def encode_jpeg(
    pixels: np.ndarray, quality: int = 90, restart_interval: int = 0,
    adobe_transform: int = None,
) -> bytes:
    """uint8 (h, w) | (h, w, 1|3) -> baseline JFIF bytes (4:4:4).
    ``restart_interval`` > 0 emits DRI + RST0-7 markers every that many
    MCUs (exercises the decoder's restart/resync path).

    (h, w, 4) input writes a print-workflow Adobe stream: the channels
    are the STORED (inverted-CMYK) sample planes, ``adobe_transform``
    must be 0 (CMYK planes as-is) or 2 (YCCK: planes 0-2 pass through
    the forward YCbCr matrix), and an APP14 segment declares it —
    fixture support for the decoder's 4-component path."""
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    if ch not in (1, 3, 4):
        raise ValueError(f"unsupported channel count {ch}")
    if ch == 4:
        if adobe_transform not in (0, 2):
            raise ValueError("4-channel encode needs adobe_transform 0 or 2")
        stored = [px[:, :, i] for i in range(4)]
        if adobe_transform == 2:
            c, m, y2 = stored[0], stored[1], stored[2]
            stored[0:3] = [
                0.299 * c + 0.587 * m + 0.114 * y2,
                -0.168736 * c - 0.331264 * m + 0.5 * y2 + 128.0,
                0.5 * c - 0.418688 * m - 0.081312 * y2 + 128.0,
            ]
            comp_q = [0, 1, 1, 0]
            qtabs = [_quality_scale(_K_LUMA_Q, quality),
                     _quality_scale(_K_CHROMA_Q, quality)]
            dc_tabs = [_encode_table(*_K_DC_LUMA), _encode_table(*_K_DC_CHROMA)]
            ac_tabs = [_encode_table(*_K_AC_LUMA), _encode_table(*_K_AC_CHROMA)]
            comp_t = [0, 1, 1, 0]
        else:
            comp_q = [0, 0, 0, 0]
            qtabs = [_quality_scale(_K_LUMA_Q, quality)]
            dc_tabs = [_encode_table(*_K_DC_LUMA)]
            ac_tabs = [_encode_table(*_K_AC_LUMA)]
            comp_t = [0, 0, 0, 0]
        planes = stored
    elif ch == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        qtabs = [_quality_scale(_K_LUMA_Q, quality),
                 _quality_scale(_K_CHROMA_Q, quality)]
        comp_q = [0, 1, 1]
        dc_tabs = [_encode_table(*_K_DC_LUMA), _encode_table(*_K_DC_CHROMA)]
        ac_tabs = [_encode_table(*_K_AC_LUMA), _encode_table(*_K_AC_CHROMA)]
        comp_t = [0, 1, 1]
    else:
        planes = [px[:, :, 0]]
        qtabs = [_quality_scale(_K_LUMA_Q, quality)]
        comp_q = [0]
        dc_tabs = [_encode_table(*_K_DC_LUMA)]
        ac_tabs = [_encode_table(*_K_AC_LUMA)]
        comp_t = [0]

    out = bytearray(b"\xff\xd8")  # SOI
    if ch == 4:
        # Adobe APP14 declaring the color transform (no JFIF APP0 —
        # JFIF is defined for 1/3-component YCbCr streams only)
        app14 = b"Adobe" + struct.pack(
            ">HHHB", 100, 0, 0, adobe_transform
        )
        out += b"\xff\xee" + struct.pack(">H", len(app14) + 2) + app14
    else:
        # JFIF APP0
        app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    for ti, q in enumerate(qtabs):
        zz = bytes(int(q.reshape(-1)[ZIGZAG[i]]) for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti]) + zz
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci in range(len(planes)):
        sof += bytes([ci + 1, 0x11, comp_q[ci]])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT segments
    for tc, tabs in ((0, [_K_DC_LUMA, _K_DC_CHROMA][:len(qtabs)]),
                     (1, [_K_AC_LUMA, _K_AC_CHROMA][:len(qtabs)])):
        for th, (counts, symbols) in enumerate(tabs):
            seg = bytes([(tc << 4) | th]) + bytes(counts) + symbols
            out += b"\xff\xc4" + struct.pack(">H", len(seg) + 2) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        sos += bytes([ci + 1, (comp_t[ci] << 4) | comp_t[ci]])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    writer = _BitWriter()
    bx_n = (w + 7) // 8
    by_n = (h + 7) // 8
    dc_pred = [0] * len(planes)
    # edge-replicated padding so partial blocks encode cleanly
    padded = [
        np.pad(p, ((0, by_n * 8 - h), (0, bx_n * 8 - w)), mode="edge")
        for p in planes
    ]
    mcu_count = 0
    rst_n = 0
    for by in range(by_n):
        for bx in range(bx_n):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst_n])
                rst_n = (rst_n + 1) & 7
                dc_pred = [0] * len(planes)
            mcu_count += 1
            for ci, plane in enumerate(padded):
                block = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coef = np.round(_fdct2(block) / qtabs[comp_q[ci]])
                zz = np.array(
                    [coef.reshape(-1)[ZIGZAG[i]] for i in range(64)]
                ).astype(int)
                dc_pred[ci] = _encode_block(
                    writer, zz, dc_pred[ci],
                    dc_tabs[comp_t[ci]], ac_tabs[comp_t[ci]],
                )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- EXIF orientation (APP1 TIFF walk; the one metadata field a crawl
# pipeline cannot ignore — phone photos store rotation here, not in the
# pixel data) -----------------------------------------------------------------

def exif_orientation(payload: bytes) -> int:
    """EXIF orientation tag (1-8; 1 = upright, also returned when no
    EXIF/orientation is present or the segment is malformed — the
    never-throw default, matching how browsers treat broken EXIF).
    Parses APP1 'Exif\\x00\\x00' + TIFF header (II/MM byte order) +
    IFD0 entries, tag 0x0112."""
    if payload[:2] != b"\xff\xd8":
        return 1
    pos = 2
    n = len(payload)
    while pos + 4 <= n and payload[pos] == 0xFF:
        marker = payload[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > n:
            break
        seglen = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        if marker == 0xE1 and payload[pos + 4:pos + 10] == b"Exif\x00\x00":
            tiff = payload[pos + 10:pos + 2 + seglen]
            if len(tiff) < 8:
                return 1
            if tiff[:2] == b"II":
                endian = "<"
            elif tiff[:2] == b"MM":
                endian = ">"
            else:
                return 1
            try:
                ifd0 = struct.unpack(endian + "I", tiff[4:8])[0]
                count = struct.unpack(
                    endian + "H", tiff[ifd0:ifd0 + 2]
                )[0]
                for i in range(count):
                    e = ifd0 + 2 + 12 * i
                    tag, typ = struct.unpack(
                        endian + "HH", tiff[e:e + 4]
                    )
                    if tag == 0x0112 and typ == 3:  # SHORT
                        v = struct.unpack(
                            endian + "H", tiff[e + 8:e + 10]
                        )[0]
                        return v if 1 <= v <= 8 else 1
            except struct.error:
                return 1
            return 1
        if marker == 0xDA:
            break  # EXIF precedes scan data by spec
        pos += 2 + seglen
    return 1


def apply_orientation(px: np.ndarray, orientation: int) -> np.ndarray:
    """Rotate/flip decoded pixels to upright per the EXIF orientation
    value (TIFF 6.0 / EXIF 2.3 table)."""
    o = int(orientation)
    if o == 2:
        return px[:, ::-1]
    if o == 3:
        return px[::-1, ::-1]
    if o == 4:
        return px[::-1, :]
    if o == 5:
        return np.rot90(px, -1)[:, ::-1]
    if o == 6:
        return np.rot90(px, -1)
    if o == 7:
        return np.rot90(px, 1)[:, ::-1]
    if o == 8:
        return np.rot90(px, 1)
    return px
