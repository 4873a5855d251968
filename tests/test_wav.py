"""WAV codec: PCM16 round trips (mono/stereo), 8-bit decode, unknown
chunk skipping, honest unsupported formats, sampler integration."""
import struct

import numpy as np
import pyarrow as pa
import pytest

from jesterj_ray.stages.wav import decode_wav, encode_wav, is_wav


def test_pcm16_round_trips():
    rng = np.random.RandomState(0)
    for shape in [(1000,), (777, 2), (256, 3), (1,)]:
        s = rng.randint(-32768, 32768, shape).astype(np.int16)
        data = encode_wav(s, rate=8000)
        assert is_wav(data)
        out, rate = decode_wav(data)
        assert rate == 8000
        exp = s[:, None] if s.ndim == 1 else s
        assert np.array_equal(out, exp.astype(np.int32))


def test_8bit_and_unknown_chunks():
    # hand-build: LIST chunk before fmt, 8-bit unsigned mono
    samples = bytes([0, 128, 255, 200])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"LIST" + struct.pack("<I", 4) + b"INFO"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(samples)) + samples)
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out, rate = decode_wav(data)
    assert rate == 8000
    assert out.ravel().tolist() == [(0 - 128) * 256, 0,
                                    (255 - 128) * 256, (200 - 128) * 256]


def test_unsupported_honest():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not a wav at all")
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000, 4, 32)  # float PCM
    body = (b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 0))
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(NotImplementedError, match="format 3"):
        decode_wav(data)


def test_sampler_real_frames_and_honest_refusal():
    from jesterj_ray.stages.multimodal import AudioFrameSampler
    s = np.arange(-300, 340, dtype=np.int16)          # 640 samples
    tab = pa.table({"media_id": pa.array([5], pa.int64()),
                    "payload": pa.array([encode_wav(s)], pa.binary())})
    out = AudioFrameSampler(fake=False, frame_len=256)(tab)
    assert out["frame_idx"].to_pylist() == [0, 1]     # 640 // 256
    e0 = int((s[:256].astype(np.int64) ** 2).sum())
    e1 = int((s[256:512].astype(np.int64) ** 2).sum())
    assert out["energy"].to_pylist() == [e0, e1]
    bad = pa.table({"media_id": pa.array([1], pa.int64()),
                    "payload": pa.array([b"ID3mp3data"], pa.binary())})
    with pytest.raises(NotImplementedError, match="PCM WAV"):
        AudioFrameSampler(fake=False)(bad)
