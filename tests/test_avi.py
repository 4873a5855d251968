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


def test_video_plus_audio_stream_order():
    """Self-review: a canonical video-first/audio-second AVI must bind
    strf to the VIDS stream, not whichever strl is visited last —
    decode ignores the PCM WAVEFORMATEX and extracts the frames."""
    f = np.arange(2 * 4 * 4, dtype=np.uint8).reshape(2, 4, 4)
    data = encode_avi(f)
    # splice an audio strl (strh 'auds' + WAVEFORMATEX strf) AFTER the
    # video strl inside hdrl
    strh_a = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"auds", b"\x00" * 4,
                         0, 0, 0, 0, 1, 8000, 0, 100, 2, 0, 0, 0, 0,
                         0, 0)
    strf_a = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)

    def chunk(cid, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad
    strl_a = chunk(b"LIST", b"strl" + chunk(b"strh", strh_a)
                   + chunk(b"strf", strf_a))
    movi_at = data.find(b"LIST", 12)
    # find the movi LIST (the second top-level LIST)
    pos = 12
    tops = []
    while pos + 8 <= len(data):
        cid, csz = struct.unpack_from("<4sI", data, pos)
        tops.append((cid, pos, csz))
        pos += 8 + csz + (csz & 1)
    (h_cid, h_pos, h_csz), (m_cid, m_pos, m_csz) = tops[0], tops[1]
    assert data[h_pos + 8:h_pos + 12] == b"hdrl"
    new_hdrl_payload = data[h_pos + 8:h_pos + 8 + h_csz] + strl_a
    rebuilt = (data[:h_pos]
               + b"LIST" + struct.pack("<I", len(new_hdrl_payload))
               + new_hdrl_payload + data[h_pos + 8 + h_csz:])
    rebuilt = (b"RIFF" + struct.pack("<I", len(rebuilt) - 8)
               + rebuilt[8:])
    out = decode_avi(rebuilt)
    assert np.array_equal(out, np.repeat(f[:, :, :, None], 3, axis=3))
