"""Pure-Python BMP codec (stdlib struct only) — second REAL image
decode path beside :mod:`.png` (r03 VERDICT #8: GIF/BMP are the two
remaining stdlib-decodable formats; this closes BMP).

Supports the common uncompressed subset: BITMAPINFOHEADER (40-byte)
DIBs, 24-bit BGR and 8-bit palette, BI_RGB (no compression), bottom-up
and top-down row order, 4-byte row padding.  The encoder (24-bit
BI_RGB) exists so tests can build real fixtures without an image
library.

Reference analog: ``TikaProcessor.java:50-84`` parses real binary
formats into typed fields; this is the binary-ingest slot done
natively.
"""

from __future__ import annotations

import struct

import numpy as np


def is_bmp(data: bytes) -> bool:
    return len(data) >= 2 and data[:2] == b"BM"


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a BMP to (H, W, 3) uint8 RGB."""
    if not is_bmp(data):
        raise ValueError("not a BMP (bad signature)")
    if len(data) < 54:
        raise ValueError("BMP truncated before headers")
    pix_off = struct.unpack_from("<I", data, 10)[0]
    (hdr_size, w, h, planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", data, 14)
    if hdr_size < 40:
        raise NotImplementedError(
            f"unsupported BMP: BITMAPCOREHEADER (size {hdr_size})")
    if comp != 0:
        raise NotImplementedError(f"unsupported BMP compression {comp}")
    if bpp not in (8, 24):
        raise NotImplementedError(f"unsupported BMP bpp {bpp}")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError("BMP has empty dimensions")
    palette = None
    if bpp == 8:
        n_colors = struct.unpack_from("<I", data, 46)[0] or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            data[pal_off:pal_off + 4 * n_colors], dtype=np.uint8)
        if pal.size < 4 * n_colors:
            raise ValueError("BMP palette truncated")
        palette = pal.reshape(-1, 4)[:, [2, 1, 0]]  # BGRA -> RGB
    stride = ((w * bpp // 8) + 3) & ~3  # rows pad to 4 bytes
    need = pix_off + stride * h
    if len(data) < need:
        raise ValueError("BMP pixel data truncated")
    rows = np.frombuffer(data[pix_off:need], dtype=np.uint8) \
        .reshape(h, stride)
    if not top_down:
        rows = rows[::-1]
    if bpp == 24:
        px = rows[:, :w * 3].reshape(h, w, 3)
        return px[:, :, ::-1].copy()  # BGR -> RGB
    return palette[rows[:, :w]]


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode (H, W) gray or (H, W, 3) RGB uint8 as 24-bit BI_RGB
    (bottom-up, the canonical layout) — deterministic bytes."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_bmp wants (H, W) or (H, W, 3) uint8")
    h, w, _ = a.shape
    stride = ((w * 3) + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    body = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return header + dib + body
