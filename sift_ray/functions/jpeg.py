"""Baseline JPEG (JFIF) codec from the public spec (ITU-T T.81) —
stdlib + numpy only, no imaging libraries in this environment.

Decoder: SOI/APP/DQT/SOF0/DHT/SOS marker walk, canonical Huffman
entropy decode with byte unstuffing and restart markers, dequantize +
zigzag, 8x8 IDCT as two matrix multiplies (numpy), chroma upsampling
for 4:2:0 / 4:2:2, BT.601 YCbCr->RGB. Returns image metadata + channel
means (the feature-extraction contract shared by the BMP/PNG/GIF
stages). Truncated / non-baseline / corrupt inputs quarantine via
status, never raise.

Encoder (`make_jpeg`): the fixture/round-trip writer — standard Annex K
quantization + Huffman tables, quality scaling per the libjpeg
convention, optional 2x2 chroma subsampling. Exists so the decoder can
be tested against known pixel content without any external codec.

Scale note: JPEG entropy decoding is inherently sequential per image
(bit-serial Huffman); the distributed shape is one image per row in an
actor-pool/task map (`decode_jpegs`), identical to the other decoders.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa

# ---- constants from ITU-T T.81 Annex K (public spec) ----------------------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99], dtype=np.int64)

_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64)

# standard Huffman tables: (BITS[1..16], HUFFVAL)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# orthonormal 8-point DCT-II matrix
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * \
            (np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8))


def _scale_qt(qt: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling convention."""
    q = max(1, min(100, quality))
    s = 5000 // q if q < 50 else 200 - q * 2
    out = (qt * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int64)


def _canonical_codes(bits: List[int], vals: List[int]):
    """(value -> (code, length)) and (length, code) -> value maps from the
    spec's BITS/HUFFVAL canonical construction."""
    enc, dec = {}, {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            v = vals[k]
            enc[v] = (code, length)
            dec[(length, code)] = v
            code += 1
            k += 1
        code <<= 1
    return enc, dec


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _fdct_quant(block: np.ndarray, qt8: np.ndarray) -> np.ndarray:
    f = _D @ (block - 128.0) @ _D.T
    return np.round(f / qt8).astype(np.int64)


def _encode_block(zz: np.ndarray, prev_dc: int, dc_enc, ac_enc,
                  w: _BitWriter) -> int:
    dc = int(zz[0])
    diff = dc - prev_dc
    size = _category(diff)
    code, ln = dc_enc[size]
    w.write(code, ln)
    if size:
        w.write(_amplitude(diff, size), size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        if i > last_nz:
            code, ln = ac_enc[0x00]  # EOB
            w.write(code, ln)
            break
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = ac_enc[run * 16 + size]
        w.write(code, ln)
        w.write(_amplitude(v, size), size)
        run = 0
    return dc


def make_jpeg(rgb: np.ndarray, quality: int = 85,
              subsample: bool = False) -> bytes:
    """Encode an (h, w, 3) uint8 array as baseline JFIF. 4:4:4 by
    default; ``subsample=True`` writes 4:2:0 (2x2 chroma averaging)."""
    import struct

    h, w = rgb.shape[:2]
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    qly = _scale_qt(_QT_LUMA, quality)
    qlc = _scale_qt(_QT_CHROMA, quality)
    qy8 = qly.reshape(8, 8).astype(np.float64)
    qc8 = qlc.reshape(8, 8).astype(np.float64)

    dc_l_enc, _ = _canonical_codes(*_DC_LUMA)
    ac_l_enc, _ = _canonical_codes(*_AC_LUMA)
    dc_c_enc, _ = _canonical_codes(*_DC_CHROMA)
    ac_c_enc, _ = _canonical_codes(*_AC_CHROMA)

    def pad_to(img, mh, mw):
        ph = (mh - img.shape[0] % mh) % mh
        pw = (mw - img.shape[1] % mw) % mw
        return np.pad(img, ((0, ph), (0, pw)), mode="edge")

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + \
        bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    for tid, qt in ((0, qly), (1, qlc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + \
            bytes(int(qt[z]) for z in _ZIGZAG)
    hs, vs = (2, 2) if subsample else (1, 1)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    out += bytes([1, hs * 16 + vs, 0])   # Y
    out += bytes([2, 0x11, 1])           # Cb
    out += bytes([3, 0x11, 1])           # Cr
    for tc_th, (bits, vals) in ((0x00, _DC_LUMA), (0x10, _AC_LUMA),
                                (0x01, _DC_CHROMA), (0x11, _AC_CHROMA)):
        out += b"\xff\xc4" + \
            struct.pack(">H", 19 + len(vals)) + bytes([tc_th]) + \
            bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">H", 12) + bytes([3]) + \
        bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])

    wtr = _BitWriter()
    if subsample:
        ye = pad_to(y, 16, 16)
        cbs = pad_to(cb, 16, 16)
        crs = pad_to(cr, 16, 16)
        # 2x2 average chroma
        cbs = cbs.reshape(cbs.shape[0] // 2, 2, cbs.shape[1] // 2, 2) \
            .mean(axis=(1, 3))
        crs = crs.reshape(crs.shape[0] // 2, 2, crs.shape[1] // 2, 2) \
            .mean(axis=(1, 3))
        mcus_y = ye.shape[0] // 16
        mcus_x = ye.shape[1] // 16
        pdc = [0, 0, 0]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(2):
                    for bx in range(2):
                        blk = ye[my * 16 + by * 8: my * 16 + by * 8 + 8,
                                 mx * 16 + bx * 8: mx * 16 + bx * 8 + 8]
                        zz = _fdct_quant(blk, qy8).flatten()[_ZIGZAG]
                        pdc[0] = _encode_block(zz, pdc[0], dc_l_enc,
                                               ac_l_enc, wtr)
                for ci, comp in ((1, cbs), (2, crs)):
                    blk = comp[my * 8: my * 8 + 8, mx * 8: mx * 8 + 8]
                    zz = _fdct_quant(blk, qc8).flatten()[_ZIGZAG]
                    pdc[ci] = _encode_block(zz, pdc[ci], dc_c_enc,
                                            ac_c_enc, wtr)
    else:
        ye = pad_to(y, 8, 8)
        cbs = pad_to(cb, 8, 8)
        crs = pad_to(cr, 8, 8)
        pdc = [0, 0, 0]
        for my in range(ye.shape[0] // 8):
            for mx in range(ye.shape[1] // 8):
                sl = np.s_[my * 8: my * 8 + 8, mx * 8: mx * 8 + 8]
                zz = _fdct_quant(ye[sl], qy8).flatten()[_ZIGZAG]
                pdc[0] = _encode_block(zz, pdc[0], dc_l_enc, ac_l_enc, wtr)
                zz = _fdct_quant(cbs[sl], qc8).flatten()[_ZIGZAG]
                pdc[1] = _encode_block(zz, pdc[1], dc_c_enc, ac_c_enc, wtr)
                zz = _fdct_quant(crs[sl], qc8).flatten()[_ZIGZAG]
                pdc[2] = _encode_block(zz, pdc[2], dc_c_enc, ac_c_enc, wtr)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder ---------------------------------------------------------------

class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; RSTn markers
    reset DC predictors (handled by the caller via marker())."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker_hit: Optional[int] = None

    def _fill(self, need: int):
        # fill ONLY to the needed bit count: eager prefetch would trip
        # over the EOI/restart marker while the final block's bits are
        # already buffered
        d = self.data
        while self.nbits < need:
            if self.pos >= len(d):
                raise EOFError
            b = d[self.pos]
            if b == 0xFF:
                if self.pos + 1 >= len(d):
                    raise EOFError
                nxt = d[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # restart marker
                    self.marker_hit = nxt
                    raise StopIteration
                else:
                    self.marker_hit = nxt
                    raise StopIteration
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill(n)
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def bit(self) -> int:
        return self.bits(1)

    def resync(self):
        """Skip to just after a restart marker; clear the bit buffer."""
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                self.acc = 0
                self.nbits = 0
                self.marker_hit = None
                return True
            self.pos += 1
        return False


def _decode_huff(rd: _BitReader, dec: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.bit()
        v = dec.get((length, code))
        if v is not None:
            return v
    raise ValueError("bad huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> Dict[str, object]:
    """Decode baseline JFIF bytes -> metadata + channel means. Statuses:
    ok / not_jpeg / unsupported (progressive, >2x sampling, 12-bit) /
    truncated / corrupt."""
    import struct

    meta = {"status": "ok", "width": 0, "height": 0, "components": 0,
            "mean_r": 0.0, "mean_g": 0.0, "mean_b": 0.0,
            "subsampling": ""}
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        meta["status"] = "not_jpeg"
        return meta
    qts: Dict[int, np.ndarray] = {}
    dcs: Dict[int, dict] = {}
    acs: Dict[int, dict] = {}
    comps: List[Tuple[int, int, int, int]] = []  # id, h, v, tq
    scan: List[Tuple[int, int, int]] = []        # id, dc_tbl, ac_tbl
    w = h = 0
    restart_interval = 0
    pos = 2
    try:
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                pos += 1
                continue
            m = data[pos + 1]
            if m == 0xD9:
                meta["status"] = "truncated"  # EOI before SOS
                return meta
            seglen = struct.unpack(">H", data[pos + 2:pos + 4])[0]
            seg = data[pos + 4:pos + 2 + seglen]
            if m == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 15
                    n = 128 if pq else 64
                    raw = seg[i + 1:i + 1 + n]
                    vals = (np.frombuffer(raw, dtype=">u2").astype(np.int64)
                            if pq else np.frombuffer(
                                raw, dtype=np.uint8).astype(np.int64))
                    qt = np.zeros(64, dtype=np.int64)
                    qt[_ZIGZAG] = vals
                    qts[tq] = qt
                    i += 1 + n
            elif m == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 15
                    bits = list(seg[i + 1:i + 17])
                    nv = sum(bits)
                    vals = list(seg[i + 17:i + 17 + nv])
                    _, dec = _canonical_codes(bits, vals)
                    (acs if tc else dcs)[th] = dec
                    i += 17 + nv
            elif m == 0xC0:  # SOF0 baseline
                prec, h, w, nc = seg[0], \
                    struct.unpack(">H", seg[1:3])[0], \
                    struct.unpack(">H", seg[3:5])[0], seg[5]
                if prec != 8:
                    meta["status"] = "unsupported"
                    return meta
                for c in range(nc):
                    cid, hv, tq = seg[6 + c * 3], seg[7 + c * 3], \
                        seg[8 + c * 3]
                    comps.append((cid, hv >> 4, hv & 15, tq))
                meta["width"], meta["height"] = int(w), int(h)
                meta["components"] = int(nc)
            elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                       0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                meta["status"] = "unsupported"  # progressive/extended
                return meta
            elif m == 0xDD:  # DRI
                restart_interval = struct.unpack(">H", seg[:2])[0]
            elif m == 0xDA:  # SOS
                ns = seg[0]
                for c in range(ns):
                    scan.append((seg[1 + c * 2], seg[2 + c * 2] >> 4,
                                 seg[2 + c * 2] & 15))
                pos = pos + 2 + seglen
                break
            pos = pos + 2 + seglen
        else:
            meta["status"] = "truncated"
            return meta
        if not comps or not scan or w == 0 or h == 0:
            meta["status"] = "corrupt"
            return meta
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        if hmax > 2 or vmax > 2:
            meta["status"] = "unsupported"
            return meta
        meta["subsampling"] = f"{hmax}x{vmax}"
        mcu_w, mcu_h = 8 * hmax, 8 * vmax
        mcus_x = -(-w // mcu_w)
        mcus_y = -(-h // mcu_h)

        planes = {}
        for cid, ch, cv, tq in comps:
            planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8),
                                   dtype=np.float64)
        rd = _BitReader(data, pos)
        pred = {cid: 0 for cid, *_ in comps}
        cinfo = {cid: (ch, cv, tq) for cid, ch, cv, tq in comps}
        n_mcu = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and n_mcu and \
                        n_mcu % restart_interval == 0:
                    if not rd.resync():
                        raise EOFError
                    pred = {cid: 0 for cid, *_ in comps}
                for cid, dct, act in scan:
                    ch, cv, tq = cinfo[cid]
                    for by in range(cv):
                        for bx in range(ch):
                            zz = np.zeros(64, dtype=np.int64)
                            s = _decode_huff(rd, dcs[dct])
                            diff = _extend(rd.bits(s), s) if s else 0
                            pred[cid] += diff
                            zz[0] = pred[cid]
                            k = 1
                            while k < 64:
                                rs = _decode_huff(rd, acs[act])
                                rr, ss = rs >> 4, rs & 15
                                if ss == 0:
                                    if rr == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += rr
                                if k > 63:
                                    raise ValueError("AC overflow")
                                zz[k] = _extend(rd.bits(ss), ss)
                                k += 1
                            blk = np.zeros(64, dtype=np.float64)
                            blk[_ZIGZAG] = (zz * qts[tq][_ZIGZAG])
                            f = blk.reshape(8, 8)
                            px = _D.T @ f @ _D + 128.0
                            yy = (my * cv + by) * 8
                            xx = (mx * ch + bx) * 8
                            planes[cid][yy:yy + 8, xx:xx + 8] = px
                n_mcu += 1
    except (EOFError, StopIteration):
        meta["status"] = "truncated"
        return meta
    except (ValueError, IndexError, KeyError, struct.error):
        meta["status"] = "corrupt"
        return meta

    # upsample chroma to luma grid, crop, convert
    def upsampled(cid):
        ch, cv, _ = cinfo[cid]
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        return p[:h, :w]

    ids = [c[0] for c in comps]
    if len(ids) == 1:
        yv = np.clip(upsampled(ids[0]), 0, 255)
        mean = float(yv.mean()) if yv.size else 0.0
        meta["mean_r"] = meta["mean_g"] = meta["mean_b"] = round(mean, 2)
        return meta
    yv = upsampled(ids[0])
    cbv = upsampled(ids[1]) - 128.0
    crv = upsampled(ids[2]) - 128.0
    r = np.clip(yv + 1.402 * crv, 0, 255)
    g = np.clip(yv - 0.344136 * cbv - 0.714136 * crv, 0, 255)
    b = np.clip(yv + 1.772 * cbv, 0, 255)
    meta["mean_r"] = round(float(r.mean()), 2)
    meta["mean_g"] = round(float(g.mean()), 2)
    meta["mean_b"] = round(float(b.mean()), 2)
    return meta


class JpegDecodeStage:
    """Dataset stage: one JPEG per row in a binary column -> metadata
    row (same contract as the BMP/PNG/GIF/WAV stages)."""

    decode = staticmethod(decode_jpeg)

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "doc_id"):
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.payload_col).to_pylist()
        rows = [decode_jpeg(p or b"") for p in payloads]
        out = {self.id_col: batch.column(self.id_col)}
        for k in ("status", "subsampling"):
            out[k] = pa.array([r[k] for r in rows], pa.string())
        for k in ("width", "height", "components"):
            out[k] = pa.array([r[k] for r in rows], pa.int64())
        for k in ("mean_r", "mean_g", "mean_b"):
            out[k] = pa.array([r[k] for r in rows], pa.float64())
        return pa.table(out)


def decode_jpegs(ds, payload_col: str = "payload", id_col: str = "doc_id"):
    from .shuffle import TaskStage
    return ds.map_batches(
        TaskStage(JpegDecodeStage, payload_col=payload_col, id_col=id_col),
        batch_format="pyarrow")
