"""AVI container codec: round trips, chunk padding, top-down frames,
honest unsupported paths, sampler integration."""
import struct

import numpy as np
import pyarrow as pa
import pytest

from jesterj_ray.stages.avi import decode_avi, encode_avi, is_avi


def test_round_trips():
    rng = np.random.RandomState(0)
    for shape in [(4, 8, 6, 3), (1, 5, 7), (3, 16, 16, 3), (2, 1, 1)]:
        f = rng.randint(0, 256, shape).astype(np.uint8)
        data = encode_avi(f)
        assert is_avi(data)
        exp = f if f.ndim == 4 else np.repeat(f[:, :, :, None], 3,
                                              axis=3)
        assert np.array_equal(decode_avi(data), exp)


def test_odd_width_padding():
    # w=5 -> stride 16 != 15: row padding must round-trip
    f = np.arange(2 * 3 * 5 * 3, dtype=np.uint8).reshape(2, 3, 5, 3)
    assert np.array_equal(decode_avi(encode_avi(f)), f)


def test_unsupported_honest():
    with pytest.raises(ValueError, match="AVI"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    data = bytearray(encode_avi(np.zeros((1, 2, 2), np.uint8)))
    i = bytes(data).find(struct.pack("<IiiHH", 40, 2, 2, 1, 24))
    data[i + 16:i + 18] = struct.pack("<H", 8)   # bpp 8
    with pytest.raises(NotImplementedError, match="bpp"):
        decode_avi(bytes(data))


def test_sampler_every_k_and_refusal():
    from jesterj_ray.stages.multimodal import VideoFrameSampler
    f = np.arange(5 * 4 * 4, dtype=np.uint8).reshape(5, 4, 4)
    tab = pa.table({"media_id": pa.array([9], pa.int64()),
                    "payload": pa.array([encode_avi(f)], pa.binary())})
    out = VideoFrameSampler(every_k=2, fake=False)(tab)
    assert out["frame_idx"].to_pylist() == [0, 2, 4]
    exp = [int(np.repeat(f[i][:, :, None], 3, 2).sum()) for i in
           (0, 2, 4)]
    assert out["px_sum"].to_pylist() == exp
    bad = pa.table({"media_id": pa.array([1], pa.int64()),
                    "payload": pa.array([b"\x00\x00\x01\xba mpeg"],
                                        pa.binary())})
    with pytest.raises(NotImplementedError, match="AVI"):
        VideoFrameSampler(fake=False)(bad)
