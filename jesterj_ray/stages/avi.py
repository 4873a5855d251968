"""Pure-Python AVI (RIFF) container codec for UNCOMPRESSED video —
the video analog of :mod:`.wav`: real frame extraction for the one
video container that needs no codec library (DIB frames are raw
bottom-up BGR rows), killing the video-sampling stub.

Supported: 'RIFF..AVI ' with an 'hdrl' LIST carrying the main header
('avih') and one video stream ('strl' -> 'strf' BITMAPINFOHEADER,
24-bit BI_RGB), frames as '00db'/'00dc' chunks inside the 'movi'
LIST.  Compressed fourccs, palettized DIBs and audio streams raise
``NotImplementedError`` honestly.

The encoder writes canonical single-stream files so tests and the
oracle pipeline synthesize real multi-frame fixtures from a pure
formula.
"""

from __future__ import annotations

import struct

import numpy as np


def is_avi(data: bytes) -> bool:
    return (len(data) >= 12 and data[:4] == b"RIFF"
            and data[8:12] == b"AVI ")


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, size, list_type) chunks."""
    pos = start
    while pos + 8 <= end:
        cid, csz = struct.unpack_from("<4sI", data, pos)
        if cid in (b"LIST", b"RIFF"):
            ltype = data[pos + 8:pos + 12]
            yield cid, pos + 12, csz - 4, ltype
        else:
            yield cid, pos + 8, csz, None
        pos += 8 + csz + (csz & 1)


def decode_avi(data: bytes) -> np.ndarray:
    """-> (n_frames, H, W, 3) uint8 RGB."""
    if not is_avi(data):
        raise ValueError("not an AVI (bad RIFF/AVI header)")
    w = h = None
    top_down = False
    frames = []
    # FIFO: lists visit in FILE order, so the strh immediately before
    # each strf is that stream's header — the strf is accepted only
    # for the 'vids' stream (a canonical video+audio AVI has the
    # audio WAVEFORMATEX in a LATER strl; binding to "first strf"
    # under LIFO picked that one and misparsed it, r05 self-review)
    queue = [(12, len(data))]
    last_fcc = None
    while queue:
        s, e = queue.pop(0)
        for cid, ps, sz, ltype in _walk(data, s, e):
            if cid in (b"LIST", b"RIFF"):
                queue.append((ps, ps + sz))
            elif cid == b"strh":
                last_fcc = data[ps:ps + 4]
            elif cid == b"strf" and last_fcc == b"vids" and w is None:
                try:
                    (hsz, bw, bh, planes, bpp, comp) = \
                        struct.unpack_from("<IiiHHI", data, ps)
                except struct.error as exc:
                    raise ValueError(
                        f"AVI truncated strf: {exc}") from exc
                if comp != 0 or bpp != 24:
                    raise NotImplementedError(
                        f"AVI stream bpp={bpp} compression={comp} "
                        "(only 24-bit BI_RGB)")
                w, h = bw, abs(bh)
                top_down = bh < 0
            elif cid in (b"00db", b"00dc"):
                frames.append((ps, sz))
    if w is None:
        raise ValueError("AVI missing strf stream format")
    if not frames:
        raise ValueError("AVI has no video frames")
    stride = ((w * 3) + 3) & ~3
    out = np.empty((len(frames), h, w, 3), dtype=np.uint8)
    for fi, (ps, sz) in enumerate(frames):
        if sz < stride * h:
            raise ValueError(f"AVI frame {fi} truncated")
        rows = np.frombuffer(data, dtype=np.uint8, count=stride * h,
                             offset=ps).reshape(h, stride)
        bgr = rows[:, :w * 3].reshape(h, w, 3)
        if not top_down:
            bgr = bgr[::-1]
        out[fi] = bgr[:, :, ::-1]
    return out


def encode_avi(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n, H, W, 3) RGB or (n, H, W) gray uint8 -> uncompressed AVI."""
    a = np.asarray(frames, dtype=np.uint8)
    if a.ndim == 3:
        a = np.repeat(a[:, :, :, None], 3, axis=3)
    n, h, w, _ = a.shape
    stride = ((w * 3) + 3) & ~3
    frame_bytes = stride * h

    def chunk(cid: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    avih = struct.pack("<IIIIIIIIIIIIII", 10 ** 6 // fps,
                       frame_bytes * fps, 0, 0, n, 0, 1, frame_bytes,
                       w, h, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"DIB ", 0, 0,
                       0, 0, 1, fps, 0, n, frame_bytes, 0, 0,
                       0, 0, w, h)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_bytes,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh)
                     + chunk(b"strf", strf)))
    movi_frames = []
    for f in a:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)
        movi_frames.append(chunk(b"00db", rows.tobytes()))
    movi = lst(b"movi", b"".join(movi_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
