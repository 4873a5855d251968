"""Baseline TIFF codec: round trips (none/PackBits, gray/RGB, strip
boundaries), big-endian + white-is-zero decode, honest unsupported
paths, and decoder-dispatch integration."""
import struct

import numpy as np
import pytest

from jesterj_ray.stages.tiff import (_packbits, _unpackbits, decode_tiff,
                                     encode_tiff, is_tiff)


def _expect(img):
    return img if img.ndim == 3 else np.repeat(img[:, :, None], 3, axis=2)


def test_round_trips_all_shapes():
    rng = np.random.RandomState(0)
    for shape in [(24, 16), (20, 28, 3), (7, 5), (1, 1), (33, 17, 3),
                  (8, 8), (9, 1, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        for pb in (False, True):
            for rps in (3, 8, 64):
                data = encode_tiff(img, packbits=pb, rows_per_strip=rps)
                assert is_tiff(data)
                assert np.array_equal(decode_tiff(data), _expect(img))


def test_packbits_primitives():
    rng = np.random.RandomState(1)
    for _ in range(50):
        n = int(rng.randint(1, 400))
        # runs + literals mix
        row = np.repeat(rng.randint(0, 4, n), rng.randint(1, 6, n)) \
            .astype(np.uint8).tobytes()[:512]
        assert _unpackbits(_packbits(row), len(row)) == row
    long = bytes([9] * 300)              # >128 run splits
    assert _unpackbits(_packbits(long), 300) == long
    with pytest.raises(ValueError, match="PackBits"):
        _unpackbits(b"\x05ab", 6)        # truncated literal


def test_big_endian_and_white_is_zero():
    rng = np.random.RandomState(2)
    g = rng.randint(0, 256, (4, 6)).astype(np.uint8)
    body = g.tobytes()
    ifd_off = 8 + len(body)

    def e(tag, typ, cnt, val):
        if typ == 3 and cnt == 1:
            return struct.pack(">HHIHH", tag, typ, cnt, val, 0)
        return struct.pack(">HHII", tag, typ, cnt, val)
    ents = [e(256, 3, 1, 6), e(257, 3, 1, 4), e(258, 3, 1, 8),
            e(259, 3, 1, 1), e(262, 3, 1, 0), e(273, 4, 1, 8),
            e(277, 3, 1, 1), e(278, 3, 1, 4), e(279, 4, 1, len(body))]
    data = b"MM\x00*" + struct.pack(">I", ifd_off) + body + \
        struct.pack(">H", len(ents)) + b"".join(ents) + \
        struct.pack(">I", 0)
    assert np.array_equal(decode_tiff(data), _expect(255 - g))


def test_unsupported_paths_raise_honestly():
    img = np.zeros((4, 4), np.uint8)
    data = bytearray(encode_tiff(img))
    assert not is_tiff(b"II+\x00")
    with pytest.raises(ValueError, match="signature"):
        decode_tiff(b"nope")
    # flip compression tag to LZW(5) in place
    i = data.find(struct.pack("<HHI", 259, 3, 1))
    data[i + 8:i + 10] = struct.pack("<H", 5)
    with pytest.raises(NotImplementedError, match="compression"):
        decode_tiff(bytes(data))


def test_decoder_dispatch_includes_tiff():
    from jesterj_ray.stages.multimodal import ImageDecoder
    import pyarrow as pa
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    dec = ImageDecoder(out_size=8, fake=False)
    out = dec(pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([encode_tiff(img, packbits=True)],
                            pa.binary())}))
    feat = np.asarray(out["feature"][0].as_py()).reshape(8, 8)
    ys = (np.arange(8) * 16) // 8
    exp = img[np.ix_(ys, ys)].astype(np.float32) / 255.0
    assert np.allclose(feat, exp)
