"""Baseline JPEG codec (stages/jpeg.py): behaviors the formula oracle
never exercises — AC coefficients, restart markers, color, escapes in
the bitstream, independent IDCT cross-check, honest-subset guards."""
import numpy as np
import pytest

from jesterj_ray.stages.jpeg import (_AC_BITS, _AC_VALS, _DC_BITS,
                                     _DC_VALS, _M, _UNZZ, _ZZ,
                                     build_huffman, decode_jpeg,
                                     encode_jpeg_gray,
                                     encode_jpeg_ycbcr, is_jpeg)


def _grid(h, w):
    return np.mgrid[0:h, 0:w]


def test_zigzag_is_the_standard_order():
    assert _ZZ[:16].tolist() == [0, 1, 8, 16, 9, 2, 3, 10,
                                 17, 24, 32, 25, 18, 11, 4, 5]
    assert _ZZ[-4:].tolist() == [47, 55, 62, 63]
    assert sorted(_ZZ.tolist()) == list(range(64))
    assert np.array_equal(_ZZ[_UNZZ], np.arange(64))


def test_huffman_build_is_prefix_free_and_complete():
    for bits, vals in ((_DC_BITS, _DC_VALS), (_AC_BITS, _AC_VALS)):
        tab = build_huffman(bits, vals)
        assert len(tab) == len(vals)
        codes = sorted((ln, code) for code, ln in tab.values())
        seen = set()
        for ln, code in codes:
            pad = format(code, f"0{ln}b")
            assert not any(pad.startswith(p) for p in seen)
            seen.add(pad)
    assert len(build_huffman(_AC_BITS, _AC_VALS)) == 162


def test_block_constant_roundtrip_exact():
    yy, xx = _grid(24, 16)
    img = ((5 * 29 + (yy // 8) * 13 + (xx // 8) * 9) % 256) \
        .astype(np.uint8)
    raw = encode_jpeg_gray(img)
    assert is_jpeg(raw)
    dec = decode_jpeg(raw)
    assert dec.shape == (24, 16, 1)
    assert np.array_equal(dec[:, :, 0], img)


def test_ac_path_error_bounded():
    # textured image exercises run/size, ZRL and EOB codes; with the
    # all-ones quant table reconstruction error is tiny
    rng = np.random.default_rng(42)
    yy, xx = _grid(40, 40)
    img = np.clip((yy * 3 + xx * 5) % 256
                  + rng.integers(-40, 40, (40, 40)), 0, 255) \
        .astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_gray(img))[:, :, 0]
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_restart_markers_roundtrip():
    yy, xx = _grid(16, 32)
    img = (((yy // 8) * 31 + (xx // 8) * 17) % 256).astype(np.uint8)
    raw = encode_jpeg_gray(img, restart_interval=2)
    assert b"\xff\xd0" in raw or b"\xff\xd1" in raw
    assert np.array_equal(decode_jpeg(raw)[:, :, 0], img)


def test_odd_dimensions_pad_and_crop():
    yy, xx = _grid(13, 11)
    img = ((yy * 2 + xx * 3) % 200).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_gray(img))[:, :, 0]
    assert dec.shape == (13, 11)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2


def test_color_constant_exact_jfif_conversion():
    ycc = np.zeros((8, 8, 3), np.uint8)
    ycc[..., 0], ycc[..., 1], ycc[..., 2] = 120, 90, 200
    rgb = decode_jpeg(encode_jpeg_ycbcr(ycc))
    assert rgb.shape == (8, 8, 3)
    y, cb, cr = 120.0, 90.0, 200.0
    exp = [round(y + 1.402 * (cr - 128)),
           round(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
           round(y + 1.772 * (cb - 128))]
    assert rgb[0, 0].tolist() == exp
    assert (rgb == rgb[0, 0]).all()


def test_idct_matches_independent_double_loop():
    # the vectorized M.T @ S @ M against a literal T.81 A.3.3 sum
    rng = np.random.default_rng(7)
    S = rng.integers(-50, 50, (8, 8)).astype(np.float64)
    fast = _M.T @ S @ _M
    slow = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            acc = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    acc += 0.25 * cu * cv * S[u, v] \
                        * np.cos((2 * x + 1) * u * np.pi / 16) \
                        * np.cos((2 * y + 1) * v * np.pi / 16)
            slow[x, y] = acc
    assert np.abs(fast - slow).max() < 1e-9


def test_byte_stuffing_occurs_and_decodes():
    # search a seed whose entropy stream contains a stuffed FF00
    yy, xx = _grid(32, 32)
    for seed in range(20):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
        raw = encode_jpeg_gray(img)
        scan_at = raw.find(b"\xff\xda")
        if b"\xff\x00" in raw[scan_at:]:
            dec = decode_jpeg(raw)[:, :, 0]
            assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2
            return
    pytest.fail("no stuffed byte produced in 20 seeds")


def test_progressive_rejected_honestly():
    raw = bytearray(encode_jpeg_gray(np.zeros((8, 8), np.uint8)))
    at = raw.find(b"\xff\xc0")
    raw[at + 1] = 0xC2                     # rewrite SOF0 -> SOF2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(raw))


def test_sixteen_bit_dqt_parses():
    raw = encode_jpeg_gray(np.full((8, 8), 77, np.uint8))
    at = raw.find(b"\xff\xdb")
    # rebuild the DQT segment with pq=1 (16-bit values, same table)
    seg16 = b"\xff\xdb" + (2 + 1 + 128).to_bytes(2, "big") + b"\x10" \
        + b"".join(int(1).to_bytes(2, "big") for _ in range(64))
    old_len = int.from_bytes(raw[at + 2:at + 4], "big")
    patched = raw[:at] + seg16 + raw[at + 2 + old_len:]
    dec = decode_jpeg(patched)[:, :, 0]
    assert (dec == 77).all()


def test_is_jpeg_sniff():
    assert not is_jpeg(b"")
    assert not is_jpeg(b"\x89PNG\r\n")
    assert is_jpeg(encode_jpeg_gray(np.zeros((8, 8), np.uint8)))


def test_image_decoder_actor_routes_jpeg():
    from jesterj_ray.stages.multimodal import ImageDecoder
    yy, xx = _grid(24, 16)
    img = (((yy // 8) * 13 + (xx // 8) * 9) % 256).astype(np.uint8)
    import pyarrow as pa
    t = pa.table({"media_id": pa.array([1], pa.int64()),
                  "payload": pa.array([encode_jpeg_gray(img)],
                                      pa.binary())})
    out = ImageDecoder(out_size=8, fake=False)(t)
    feats = np.asarray(out["feature"].to_pylist()[0])
    ys, xs = (np.arange(8) * 24) // 8, (np.arange(8) * 16) // 8
    exp = img[np.ix_(ys, xs)].astype(np.float32) / 255.0
    assert np.allclose(feats, exp.ravel())
