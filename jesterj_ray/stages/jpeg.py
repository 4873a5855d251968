"""Baseline JPEG codec, pure Python/numpy — closes the last image-
format gap in the Tika slot (``TikaProcessor.java:50-84``): no codec
libraries exist in this sandbox, so both ends are implemented from
the public JPEG spec (ITU-T T.81), like the GIF LZW and PNG codecs
before it (r02/r03).

Decoder (:func:`decode_jpeg`) — REAL baseline coverage:

- marker stream parse: SOI, APPn/COM skipped, DQT (8- and 16-bit
  precision, multiple tables per segment), DHT (multiple tables),
  SOF0/SOF1, DRI, SOS, EOI,
- canonical Huffman decode from the DHT (bits, huffval) spec build,
- entropy-coded segment with 0xFF00 byte unstuffing and RSTn restart
  handling (bit realign + DC predictor reset),
- DC differential + magnitude EXTEND, AC run/size with ZRL and EOB,
- dequantize, inverse zigzag, float IDCT (T.81 A.3.3 scaling),
  level shift, clip,
- 1-component grayscale -> (h, w, 1) uint8; 3-component YCbCr
  (JFIF) -> (h, w, 3) RGB uint8.

Honest subset (documented, raises ``NotImplementedError``):
progressive (SOF2) / arithmetic coding / 12-bit precision and
subsampled chroma (sampling factors must be uniform — 4:4:4).

Encoder (:func:`encode_jpeg_gray` / :func:`encode_jpeg_ycbcr`) —
spec-valid baseline fixture encoder: float DCT, quantization (default
all-ones table so block-constant images round-trip BIT-EXACTLY — the
DC-only path has no quantization loss), standard-shape canonical
Huffman tables, byte stuffing, optional restart intervals.

The ``jpeg_decode_stats`` driver pipeline synthesizes block-constant
gray images (exact through the lossy transform), encodes them with
this encoder, and runs the REAL decoder in the ``ImageDecoder`` actor
pool; DuckDB recomputes the resized-pixel sums from the block formula
— any marker / Huffman / bitstream / IDCT-scaling bug breaks the
hash.  pytest covers the AC path (tolerance-bounded), restart
markers, color, and an independent double-loop IDCT cross-check.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------- tables


def _zigzag_order() -> np.ndarray:
    """Raster indices in zigzag scan sequence (T.81 Figure 5)."""
    idx = []
    x = y = 0
    for _ in range(64):
        idx.append(y * 8 + x)
        if (x + y) % 2 == 0:            # moving up-right
            if x == 7:
                y += 1
            elif y == 0:
                x += 1
            else:
                x += 1
                y -= 1
        else:                           # moving down-left
            if y == 7:
                x += 1
            elif x == 0:
                y += 1
            else:
                x -= 1
                y += 1
    return np.array(idx, dtype=np.int64)


_ZZ = _zigzag_order()
_UNZZ = np.argsort(_ZZ)

# standard-shape canonical Huffman specs (T.81 Annex K layout: 16
# length counts + symbol values).  DC: categories 0..11.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# AC: all 162 run/size symbols, K.3.3.2 ordering.
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

_ONES_Q = np.ones(64, dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        cu = 1.0 / math.sqrt(2.0) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return m


_M = _dct_matrix()


def build_huffman(bits: List[int], vals: List[int]) \
        -> Dict[int, Tuple[int, int]]:
    """Canonical JPEG Huffman build (T.81 C.2): symbol -> (code, len)."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: List[int], vals: List[int]) \
        -> Dict[Tuple[int, int], int]:
    return {(ln, code): sym
            for sym, (code, ln) in build_huffman(bits, vals).items()}


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)   # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self):
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _magnitude(v: int) -> Tuple[int, int]:
    """(size, bits) for a DC diff / AC coefficient (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc_tab, ac_tab) -> int:
    s, bits = _magnitude(int(zz[0]) - pred)
    code, ln = dc_tab[s]
    w.write(code, ln)
    if s:
        w.write(bits, s)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]         # ZRL
            w.write(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_tab[(run << 4) | s]
        w.write(code, ln)
        w.write(bits, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]             # EOB
        w.write(code, ln)
    return int(zz[0])


def _forward_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(by, bx, 64) quantized zigzag coefficients for one padded plane."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane.astype(np.float64) - 128.0,
                    ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
    coefs = np.einsum("ux,byxz,vz->byuv", _M, blocks, _M)
    zz = coefs.reshape(ph // 8, pw // 8, 64)[..., _ZZ]
    return np.rint(zz / q.reshape(1, 1, 64)).astype(np.int64)


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
        + payload


def _headers(h: int, w: int, ncomp: int, q: np.ndarray) -> bytes:
    out = bytearray(b"\xff\xd8")                       # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(x) for x in q))   # DQT tq=0
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for c in range(1, ncomp + 1):
        sof += bytes([c, 0x11, 0])                     # 1x1 sampling, tq 0
    out += _seg(0xC0, bytes(sof))                      # SOF0 baseline
    out += _seg(0xC4, bytes([0x00] + _DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xC4, bytes([0x10] + _AC_BITS) + bytes(_AC_VALS))
    return bytes(out)


def _encode_planes(planes: List[np.ndarray], *,
                   q: Optional[np.ndarray] = None,
                   restart_interval: int = 0) -> bytes:
    q = _ONES_Q if q is None else np.asarray(q, dtype=np.int64).ravel()
    h, w = planes[0].shape
    out = bytearray(_headers(h, w, len(planes), q))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([len(planes)])
    for c in range(1, len(planes) + 1):
        sos += bytes([c, 0x00])                        # DC 0 / AC 0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, bytes(sos))
    dc_tab = build_huffman(_DC_BITS, _DC_VALS)
    ac_tab = build_huffman(_AC_BITS, _AC_VALS)
    zzs = [_forward_blocks(p, q) for p in planes]
    by, bx = zzs[0].shape[:2]
    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu = 0
    for yy in range(by):
        for xx in range(bx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.align()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1)
                                            % 8)])
                preds = [0] * len(planes)
            for ci, zz in enumerate(zzs):
                preds[ci] = _encode_block(bw, zz[yy, xx], preds[ci],
                                          dc_tab, ac_tab)
            mcu += 1
    bw.align()
    out += bw.out
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)


def encode_jpeg_gray(img: np.ndarray, *, q: Optional[np.ndarray] = None,
                     restart_interval: int = 0) -> bytes:
    """Spec-valid baseline grayscale JPEG.  With the default all-ones
    quant table, block-constant images round-trip exactly."""
    return _encode_planes([np.asarray(img)], q=q,
                          restart_interval=restart_interval)


def encode_jpeg_ycbcr(ycbcr: np.ndarray, *,
                      q: Optional[np.ndarray] = None) -> bytes:
    """Spec-valid baseline 4:4:4 color JPEG from (h, w, 3) YCbCr."""
    a = np.asarray(ycbcr)
    return _encode_planes([a[:, :, 0], a[:, :, 1], a[:, :, 2]], q=q)


# ---------------------------------------------------------------- decoder


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1           # unstuff
                else:
                    raise ValueError("marker inside entropy data")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def restart(self, expect: int):
        """Byte-align and consume an RSTn marker."""
        self.n = 0
        if self.data[self.pos] != 0xFF or \
                self.data[self.pos + 1] != 0xD0 + (expect % 8):
            raise ValueError("missing restart marker")
        self.pos += 2


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _huff_decode(r: _BitReader, table: Dict[Tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _decode_block(r: _BitReader, dc, ac, pred: int) \
        -> Tuple[np.ndarray, int]:
    zz = np.zeros(64, dtype=np.float64)
    s = _huff_decode(r, dc)
    pred += _extend(r.bits(s), s)
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(r, ac)
        run, s = rs >> 4, rs & 15
        if s == 0:
            if run == 15:                    # ZRL
                k += 16
                continue
            break                            # EOB
        k += run
        zz[k] = _extend(r.bits(s), s)
        k += 1
    return zz, pred


def is_jpeg(data: bytes) -> bool:
    return len(data) > 3 and data[:2] == b"\xff\xd8"


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG -> (h, w, c) uint8 (c=1 gray, c=3 RGB)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG stream")
    qtables: Dict[int, np.ndarray] = {}
    htables: Dict[Tuple[int, int], Dict[Tuple[int, int], int]] = {}
    comps: List[Tuple[int, int, int]] = []   # (id, sampling, tq)
    h = w = 0
    dri = 0
    pos = 2
    scan_at = None
    scan_spec: List[Tuple[int, int, int]] = []  # (comp idx, td, ta)
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        length = int.from_bytes(data[pos:pos + 2], "big")
        seg = data[pos + 2:pos + length]
        if marker == 0xDB:                   # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    vals = np.frombuffer(seg[i:i + 128],
                                         dtype=">u2").astype(np.int64)
                    i += 128
                else:
                    vals = np.frombuffer(seg[i:i + 64],
                                         dtype=np.uint8).astype(np.int64)
                    i += 64
                qtables[tq] = vals
        elif marker == 0xC4:                 # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                bits = list(seg[i + 1:i + 17])
                nvals = sum(bits)
                vals = list(seg[i + 17:i + 17 + nvals])
                htables[(tc, th)] = _decode_table(bits, vals)
                i += 17 + nvals
        elif marker in (0xC0, 0xC1):         # SOF0 / SOF1
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit precision")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = [(seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c])
                     for c in range(ncomp)]
            if len({s for _, s, _ in comps}) > 1:
                raise NotImplementedError(
                    "subsampled chroma not supported (uniform "
                    "sampling factors only)")
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential Huffman JPEG (SOF0/SOF1)")
        elif marker == 0xDD:                 # DRI
            dri = int.from_bytes(seg[:2], "big")
        elif marker == 0xDA:                 # SOS
            ns = seg[0]
            ids = [cid for cid, _, _ in comps]
            for c in range(ns):
                cs = seg[1 + 2 * c]
                tt = seg[2 + 2 * c]
                scan_spec.append((ids.index(cs), tt >> 4, tt & 15))
            scan_at = pos + length
            break
        pos += length
    if scan_at is None or not comps:
        raise ValueError("no scan found")
    mcux, mcuy = -(-w // 8), -(-h // 8)
    planes = [np.zeros((mcuy * 8, mcux * 8), dtype=np.float64)
              for _ in comps]
    r = _BitReader(data, scan_at)
    preds = [0] * len(comps)
    mcu = 0
    for yy in range(mcuy):
        for xx in range(mcux):
            if dri and mcu and mcu % dri == 0:
                r.restart(mcu // dri - 1)
                preds = [0] * len(comps)
            for ci, td, ta in scan_spec:
                zz, preds[ci] = _decode_block(
                    r, htables[(0, td)], htables[(1, ta)], preds[ci])
                deq = zz * qtables[comps[ci][2]]
                block = deq[_UNZZ].reshape(8, 8)
                pix = _M.T @ block @ _M + 128.0
                planes[ci][yy * 8:yy * 8 + 8, xx * 8:xx * 8 + 8] = pix
            mcu += 1
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        gray = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    if len(planes) == 3:                     # JFIF YCbCr -> RGB
        y, cb, cr = planes
        rch = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([rch, g, b], axis=2)
        return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    raise NotImplementedError("1- or 3-component scans only")
