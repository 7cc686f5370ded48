"""Baseline JPEG codec, stdlib + numpy only (no libjpeg / Pillow).

Closes the one decode gap the multimodal pipeline had: JPEG rows used
to pass through ``resize_image`` unchanged because the container ships
no codec library. This module implements the baseline sequential DCT
process from the public JPEG standard (ITU-T T.81):

* ``jpeg_decode``  — SOI/DQT/SOF0/DHT/DRI/SOS marker parse, Huffman
  entropy decode (with byte-stuffing and restart markers), dequantize,
  8x8 IDCT, chroma upsampling for any (h, v) sampling factors, and
  YCbCr→RGB — returns an (h, w, 3) uint8 array.
* ``jpeg_encode``  — the forward path with 4:4:4 sampling, the Annex K
  example quantization tables scaled by a libjpeg-style quality factor,
  and the Annex K typical Huffman tables. Output is a valid baseline
  JFIF file any decoder reads.

Only the baseline process is supported: progressive (SOF2),
arithmetic-coded, hierarchical, and 12-bit streams raise ``ValueError``
— loudly, never a silent passthrough. Pixel fidelity is lossy by
design; the round-trip error bound is asserted in tests
(tests/test_operators.py::test_jpeg_roundtrip*).

Reference parity note: the reference repo has no media handling at all
(its rows are JSON orders); this module serves the SURVEY §2.11
multimodal extension surface.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared tables (public: JPEG standard Annex K)
# ---------------------------------------------------------------------------

# zigzag scan order, generated rather than transcribed: entry i of the
# scan is block position (r, c)
def _zigzag_order() -> list[tuple[int, int]]:
    order = []
    for s in range(15):
        if s % 2 == 0:  # up-right: r decreasing
            for r in range(min(s, 7), max(0, s - 7) - 1, -1):
                order.append((r, s - r))
        else:  # down-left: c decreasing
            for c in range(min(s, 7), max(0, s - 7) - 1, -1):
                order.append((s - c, c))
    return order


_ZIGZAG = _zigzag_order()
_ZZ_FLAT = np.array([r * 8 + c for r, c in _ZIGZAG], dtype=np.int64)

# Annex K example quantization tables (luminance / chrominance)
_QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
_QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)

# Annex K typical Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8x8 DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decode-side view of the same codes."""
    return {
        (length, code): sym for sym, (code, length) in _canonical_codes(bits, values).items()
    }


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _scale_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = np.floor((base * scale + 50) / 100)
    return np.clip(q, 1, 255)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, offset-coded value) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    return s, v if v > 0 else v + (1 << s) - 1


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0].astype(np.float64), rgb[..., 1].astype(np.float64), rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def jpeg_encode(rgb: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF bytes (4:4:4 sampling)."""
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qts = [_scale_qt(_QT_LUMA, quality), _scale_qt(_QT_CHROMA, quality)]
    enc_dc = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    enc_ac = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]

    # pad to 8 multiples by edge replication, center, convert
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    img = np.pad(rgb, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    ycc = rgb_to_ycbcr(img) - 128.0

    bw = _BitWriter()
    pred = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci in range(3):
                ti = 0 if ci == 0 else 1
                block = ycc[by : by + 8, bx : bx + 8, ci]
                coef = _A @ block @ _A.T
                q = np.round(coef / qts[ti]).astype(np.int64)
                zz = q.reshape(64)[_ZZ_FLAT]
                # DC
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s, val = _magnitude(diff)
                code, length = enc_dc[ti][s]
                bw.write(code, length)
                if s:
                    bw.write(val, s)
                # AC with run-lengths
                run = 0
                nz = np.nonzero(zz[1:])[0]
                last = nz[-1] + 1 if len(nz) else 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = enc_ac[ti][0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    s, val = _magnitude(v)
                    code, length = enc_ac[ti][(run << 4) | s]
                    bw.write(code, length)
                    bw.write(val, s)
                    run = 0
                if last < 63:
                    code, length = enc_ac[ti][0x00]  # EOB
                    bw.write(code, length)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    for i, qt in enumerate(qts):
        zz = qt.reshape(64)[_ZZ_FLAT].astype(np.uint8)
        out += seg(0xDB, bytes([i]) + zz.tobytes())
    # SOF0: 8-bit, 3 components, all 1x1 sampling
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for ci in range(3):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    for cls, tid, (bits, vals) in (
        (0, 0, _DC_LUMA),
        (0, 1, _DC_CHROMA),
        (1, 0, _AC_LUMA),
        (1, 1, _AC_CHROMA),
    ):
        out += seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([3])
    for ci in range(3):
        dc_t, ac_t = (0, 0) if ci == 0 else (1, 1)
        sos += bytes([ci + 1, (dc_t << 4) | ac_t])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: un-stuffs FF 00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        b = self.d[self.pos]
        if b == 0xFF:
            nxt = self.d[self.pos + 1]
            if nxt == 0x00:  # stuffed FF
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: caller resyncs
                raise _RestartMarker()
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_skip_restart(self) -> None:
        """Drop partial byte, consume the RSTn marker."""
        self._acc = 0
        self._n = 0
        while self.d[self.pos] == 0xFF and 0xD0 <= self.d[self.pos + 1] <= 0xD7:
            self.pos += 2
            return
        raise ValueError("expected restart marker")


class _RestartMarker(Exception):
    pass


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode(b: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (h, w, 3) uint8 RGB (grayscale replicates
    into 3 channels). Raises ValueError for non-baseline streams."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        data = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(data):
                prec, tid = data[i] >> 4, data[i] & 15
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported (not baseline)")
                zz = np.frombuffer(data, dtype=np.uint8, count=64, offset=i + 1)
                qt = np.zeros(64)
                qt[_ZZ_FLAT] = zz
                qts[tid] = qt.reshape(8, 8).astype(np.float64)
                i += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"SOF{marker - 0xC0}: only baseline sequential (SOF0) supported")
        elif marker == 0xC0:  # SOF0
            depth, h, w, nc = struct.unpack(">BHHB", data[:6])
            if depth != 8:
                raise ValueError("only 8-bit precision supported")
            for ci in range(nc):
                cid, hv, qid = data[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "q": qid})
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(data):
                cls, tid = data[i] >> 4, data[i] & 15
                bits = list(data[i + 1 : i + 17])
                n = sum(bits)
                vals = list(data[i + 17 : i + 17 + n])
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _decode_table(bits, vals)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS
            ns = data[0]
            sel = {}
            for si in range(ns):
                cid, tt = data[1 + 2 * si], data[2 + 2 * si]
                sel[cid] = (tt >> 4, tt & 15)
            scan_pos = pos + 2 + seglen
            return _decode_scan(
                b, scan_pos, h, w, comps, sel, qts, dc_tabs, ac_tabs, restart_interval
            )
        pos += 2 + seglen
    raise ValueError("no SOS marker found")


def _decode_scan(
    b: bytes,
    pos: int,
    h: int,
    w: int,
    comps: list[dict],
    sel: dict[int, tuple[int, int]],
    qts: dict[int, np.ndarray],
    dc_tabs: dict[int, dict],
    ac_tabs: dict[int, dict],
    restart_interval: int,
) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = [
        np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    br = _BitReader(b, pos)
    pred = [0] * len(comps)
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                br.align_and_skip_restart()
                pred = [0] * len(comps)
            try:
                for ci, c in enumerate(comps):
                    dt = dc_tabs[sel[c["id"]][0]]
                    at = ac_tabs[sel[c["id"]][1]]
                    qt = qts[c["q"]]
                    for vy in range(c["v"]):
                        for vx in range(c["h"]):
                            zz = np.zeros(64, dtype=np.float64)
                            s = _huff_decode(br, dt)
                            diff = _extend(br.read_bits(s), s) if s else 0
                            pred[ci] += diff
                            zz[0] = pred[ci]
                            k = 1
                            while k < 64:
                                sym = _huff_decode(br, at)
                                if sym == 0x00:  # EOB
                                    break
                                if sym == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += sym >> 4
                                s = sym & 15
                                if k > 63:
                                    raise ValueError("AC index out of range")
                                zz[k] = _extend(br.read_bits(s), s)
                                k += 1
                            block = np.zeros(64)
                            block[_ZZ_FLAT] = zz
                            coef = block.reshape(8, 8) * qt
                            spatial = _A.T @ coef @ _A + 128.0
                            py = (my * c["v"] + vy) * 8
                            px = (mx * c["h"] + vx) * 8
                            planes[ci][py : py + 8, px : px + 8] = spatial
            except _RestartMarker as exc:  # marker hit mid-MCU: corrupt
                raise ValueError("restart marker inside MCU") from exc
            n_mcu += 1
    # upsample each plane to full MCU-grid resolution, crop, color-convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    ycc = np.stack(full[:3], axis=-1)
    return ycbcr_to_rgb(ycc)


def jpeg_bytes(w: int, h: int, seed: int = 0, quality: int = 90) -> bytes:
    """A VALID deterministic baseline JPEG (same deterministic pattern
    family as multimodal.png_bytes, smooth enough to survive DCT
    quantization for round-trip tests)."""
    ys, xs = np.mgrid[0:h, 0:w]
    r = (128 + 90 * np.sin((xs + seed) / 17.0) * np.cos(ys / 23.0)).astype(np.uint8)
    g = (128 + 90 * np.cos((xs + 2 * seed) / 29.0)).astype(np.uint8)
    bch = (128 + 90 * np.sin((ys + seed) / 13.0)).astype(np.uint8)
    return jpeg_encode(np.stack([r, g, bch], axis=-1), quality)
