"""Pure-Python PNG codec (stdlib zlib only) — the one image format the
sandbox can decode for real (r02 VERDICT #10: a non-fake decode path for
:class:`.multimodal.ImageDecoder` strict mode).

Supports the common web subset: 8-bit depth, color types 0 (grayscale),
2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); non-interlaced; all five
scanline filters.  The encoder (filter 0 only) exists so tests can build
real fixtures without an image library.

Reference analog: ``TikaProcessor.java:50-84`` parses real binary formats
into typed fields; this is the binary-ingest slot done natively.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bool(data) and data[:8] == _SIG


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to (H, W, C) uint8 (palette expands to RGB)."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = []
    palette = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"unsupported PNG: depth={depth} interlace={interlace}")
    if color not in _CHANNELS:
        raise NotImplementedError(f"unsupported color type {color}")
    ch = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = raw[:, 0]
    scan = raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        line = scan[y].astype(np.int64)
        f = int(filters[y])
        if f == 0:
            rec = line
        elif f == 2:  # Up — fully vectorized
            rec = (line + prev) & 0xFF
        elif f in (1, 3, 4):
            rec = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = rec[i - ch] if i >= ch else 0
                b = prev[i]
                if f == 1:
                    rec[i] = (line[i] + a) & 0xFF
                elif f == 3:
                    rec[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                else:  # Paeth
                    c = prev[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb and pa_ <= pc) else \
                        (b if pb <= pc else c)
                    rec[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    img = out.reshape(h, w, ch)
    if color == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        img = palette[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """Encode (H, W) or (H, W, C) uint8 (C in 1/2/3/4) as a PNG
    (filter 0, one IDAT)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + \
            struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return _SIG + chunk(b"IHDR", ihdr) + \
        chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
