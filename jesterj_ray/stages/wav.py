"""Pure-Python WAV (RIFF PCM) codec — the audio analog of the image
codecs: real decode for the one audio container that needs no codec
library (PCM is just samples), killing the AudioFrameSampler's
blanket env-blocked stub.

Supported: RIFF/WAVE with a PCM (format 1) ``fmt `` chunk, 8-bit
unsigned and 16-bit signed samples, any channel count (decoded to
(n_frames, channels) int32), arbitrary chunk order with unknown
chunks skipped (LIST/fact etc.).  Compressed formats (ADPCM, float,
MP3-in-WAV) raise ``NotImplementedError`` honestly.

The encoder writes canonical PCM16 little-endian files so tests and
the oracle pipeline synthesize real fixtures from a pure formula.
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(data: bytes) -> bool:
    return (len(data) >= 12 and data[:4] == b"RIFF"
            and data[8:12] == b"WAVE")


def decode_wav(data: bytes):
    """-> (samples int32 (n, channels), sample_rate)."""
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos, n = 12, len(data)
    fmt = None
    body = None
    while pos + 8 <= n:
        cid, csz = struct.unpack_from("<4sI", data, pos)
        pos += 8
        chunk = data[pos:pos + csz]
        if cid == b"fmt ":
            try:
                (audio_fmt, channels, rate, _br, _ba, bits) = \
                    struct.unpack_from("<HHIIHH", chunk, 0)
            except struct.error as exc:
                # torn streams raise the codecs' honest ValueError,
                # never a raw struct.error (the TIFF convention)
                raise ValueError(f"WAV truncated fmt chunk: {exc}") \
                    from exc
            if audio_fmt != 1:
                raise NotImplementedError(
                    f"WAV format {audio_fmt} (only PCM=1)")
            if bits not in (8, 16):
                raise NotImplementedError(f"WAV {bits}-bit PCM")
            fmt = (channels, rate, bits)
        elif cid == b"data":
            body = chunk
        pos += csz + (csz & 1)            # chunks are word-aligned
    if fmt is None or body is None:
        raise ValueError("WAV missing fmt or data chunk")
    channels, rate, bits = fmt
    if bits == 16:
        s = np.frombuffer(body[:len(body) & ~1], dtype="<i2") \
            .astype(np.int32)
    else:
        s = (np.frombuffer(body, dtype=np.uint8).astype(np.int32)
             - 128) * 256                 # center + scale to ~16-bit
    usable = (s.size // channels) * channels
    return s[:usable].reshape(-1, channels), rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16-range samples -> PCM16 WAV bytes."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    a = a.astype("<i2")
    channels = a.shape[1]
    body = a.tobytes()
    block = channels * 2
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(body),
                      b"WAVE", b"fmt ", 16, 1, channels, rate,
                      rate * block, block, 16, b"data", len(body))
    return hdr + body
