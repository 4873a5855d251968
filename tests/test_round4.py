"""Round-4 additions: BMP + GIF real codecs (r03 VERDICT #8) and the
multi-format strict ImageDecoder dispatch.

The GIF decoder is additionally validated against a COMPRESSING LZW
encoder written here in the test (standard GIF LZW: growing dictionary,
variable code width up to 12 bits, KwKwK self-reference case) — the
shipping fixture encoder only emits literal codes, so this is what
proves the decoder handles real-world compressed streams.
"""
import struct

import numpy as np
import pyarrow as pa
import pytest

from jesterj_ray.stages.bmp import decode_bmp, encode_bmp, is_bmp
from jesterj_ray.stages.gif import (decode_gif, encode_gif_gray, is_gif,
                                    _lzw_decode)


def test_bmp_round_trip_shapes():
    rng = np.random.default_rng(3)
    for shape in [(24, 16, 3), (7, 5, 3), (1, 1, 3), (13, 9), (3, 31)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        enc = encode_bmp(img)
        assert is_bmp(enc) and not is_gif(enc)
        want = img if img.ndim == 3 else \
            np.repeat(img[:, :, None], 3, axis=2)
        assert np.array_equal(decode_bmp(enc), want), shape


def test_bmp_top_down_and_palette():
    """Hand-built top-down 24-bit and bottom-up 8-bit-palette BMPs (the
    two layout variants the encoder never produces)."""
    # top-down: negative height, no padding needed at w=4
    px = np.arange(4 * 3 * 2, dtype=np.uint8).reshape(2, 4, 3)
    body = px[:, :, ::-1].tobytes()          # rows already top-down, BGR
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 4, -2, 1, 24, 0, len(body),
                      0, 0, 0, 0)
    assert np.array_equal(decode_bmp(hdr + dib + body), px)
    # 8-bit palette, 2 colors declared, w=3 (stride pads to 4)
    pal = bytes([10, 20, 30, 0,    # color 0: B G R A
                 200, 150, 100, 0])
    rows = bytes([0, 1, 0, 0,      # bottom row + 1 pad byte
                  1, 1, 1, 0])     # top row + pad
    hdr = struct.pack("<2sIHHI", b"BM", 54 + 8 + len(rows), 0, 0, 62)
    dib = struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 8, 0, len(rows),
                      0, 0, 2, 0)
    out = decode_bmp(hdr + dib + pal + rows)
    c0, c1 = [30, 20, 10], [100, 150, 200]   # RGB
    assert out.tolist() == [[c1, c1, c1], [c0, c1, c0]]


def test_bmp_rejects():
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + b"\0" * 60)
    rle = bytearray(encode_bmp(np.zeros((2, 2), np.uint8)))
    struct.pack_into("<I", rle, 30, 1)       # compression = BI_RLE8
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(rle))


def test_gif_round_trip_shapes():
    rng = np.random.default_rng(4)
    for shape in [(24, 16), (1, 1), (13, 254), (3, 255), (16, 64)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        enc = encode_gif_gray(img)
        assert is_gif(enc) and not is_bmp(enc)
        assert np.array_equal(decode_gif(enc),
                              np.repeat(img[:, :, None], 3, axis=2)), shape


def _lzw_compress(px: bytes, min_code_size: int = 8) -> bytes:
    """Reference GIF LZW COMPRESSOR (test-only): growing dictionary,
    variable width, CLEAR on table-full — produces the real compressed
    streams (incl. KwKwK codes) the fixture encoder never emits."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out_codes, widths = [clear], [min_code_size + 1]

    def fresh():
        return ({bytes([i]): i for i in range(clear)}, eoi + 1,
                min_code_size + 1)

    table, next_code, width = fresh()

    def emit(code):
        out_codes.append(code)
        widths.append(width)

    cur = b""
    for ch in px:
        nxt = cur + bytes([ch])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        if next_code == 4096:                 # table full: restart
            emit(clear)
            table, next_code, width = fresh()
        else:
            table[nxt] = next_code
            next_code += 1
            if next_code >= (1 << width) and width < 12:
                width += 1                    # next emit needs more bits
        cur = bytes([ch])
    if cur:
        emit(table[cur])
    emit(eoi)
    bits = []
    for c, wd in zip(out_codes, widths):
        for b in range(wd):
            bits.append((c >> b) & 1)
    return np.packbits(np.array(bits, np.uint8),
                       bitorder="little").tobytes()


def test_gif_lzw_decoder_handles_compressed_streams():
    """The decoder against REAL compression: repetitive pixels force
    dictionary growth, width escalation, and the KwKwK case."""
    rng = np.random.default_rng(9)
    cases = [
        bytes([7] * 500),                               # pure KwKwK runs
        bytes([1, 2] * 300),                            # alternating
        rng.integers(0, 4, size=5000, dtype=np.uint8).tobytes(),
        rng.integers(0, 256, size=20000, dtype=np.uint8).tobytes(),
        (b"abcabcabd" * 700),                           # width growth
    ]
    for px in cases:
        blob = _lzw_compress(px)
        got = _lzw_decode(blob, 8, len(px))
        assert got.tobytes() == px, len(px)


def test_gif_full_frame_with_compressed_stream():
    """A hand-assembled GIF whose pixel stream comes from the real
    compressor decodes identically to the fixture-encoder frame."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(40, 37), dtype=np.uint8)
    ref = encode_gif_gray(img)                # known-good container
    blob = _lzw_compress(img.ravel().tobytes())
    out = [b"GIF89a", struct.pack("<HHBBB", 37, 40, 0xF7, 0, 0),
           np.repeat(np.arange(256, dtype=np.uint8), 3).tobytes(),
           struct.pack("<BHHHHB", 0x2C, 0, 0, 37, 40, 0), bytes([8])]
    for i in range(0, len(blob), 255):
        chunk = blob[i:i + 255]
        out.append(bytes([len(chunk)]) + chunk)
    out.append(b"\x00\x3b")
    assert np.array_equal(decode_gif(b"".join(out)), decode_gif(ref))


def test_gif_rejects():
    with pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + b"\0" * 20)
    # interlaced flag set on the image descriptor
    enc = bytearray(encode_gif_gray(np.zeros((2, 2), np.uint8)))
    idesc = enc.index(0x2C, 13 + 768)
    enc[idesc + 9] |= 0x40
    with pytest.raises(NotImplementedError):
        decode_gif(bytes(enc))


def test_image_decoder_dispatches_all_four_formats(ray_session):
    """Strict-mode ImageDecoder over one mixed PNG/GIF/BMP/JPEG
    dataset: each lossless payload decodes via its codec to the SAME
    grayscale feature (one source image, three encodings); baseline
    JPEG (lossless with the all-ones quant table) matches within DCT
    rounding; unknown bytes raise."""
    import ray.data as rd

    from jesterj_ray.stages.jpeg import encode_jpeg_gray
    from jesterj_ray.stages.multimodal import ImageDecoder
    from jesterj_ray.stages.png import encode_png
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(48, 40), dtype=np.uint8)
    rows = [{"media_id": 0, "payload": encode_png(img)},
            {"media_id": 1, "payload": encode_gif_gray(img)},
            {"media_id": 2, "payload": encode_bmp(img)},
            {"media_id": 3, "payload": encode_jpeg_gray(img)}]
    ds = rd.from_items(rows, override_num_blocks=1)
    out = ds.map_batches(ImageDecoder, batch_format="pyarrow",
                         fn_constructor_kwargs={"out_size": 16,
                                                "fake": False},
                         concurrency=1).to_pandas()
    feats = {int(r["media_id"]): np.asarray(r["feature"])
             for _, r in out.iterrows()}
    assert len(feats) == 4
    assert np.array_equal(feats[0], feats[1])
    assert np.array_equal(feats[0], feats[2])
    # q=ones JPEG is exact up to IDCT integer rounding (<= 1/255 per px)
    assert np.max(np.abs(feats[0] - feats[3])) <= 1.5 / 255.0
    dec = ImageDecoder(out_size=8, fake=False)
    # real JPEG decoder engages on the magic and rejects a torn stream
    with pytest.raises(ValueError):
        dec._decode_one(b"\xff\xd8\xffJPEGISH")
    # TIFF decodes for real since r05: the codec engages on the magic
    # and rejects a torn stream (mirrors the JPEG line above)
    with pytest.raises(ValueError):
        dec._decode_one(b"II*\x00notatiff")
    # a genuinely-unknown magic still routes to the honest refusal
    with pytest.raises(NotImplementedError):
        dec._decode_one(b"RIFF\x00\x00\x00\x00WEBPVP8 ")


def test_repetition_signals_reference():
    """dup-bigram fraction vs a transparent per-doc reference."""
    from jesterj_ray.stages.textstats import repetition_signals
    from jesterj_ray.tokenize.tokenizer import simple_tokenize
    texts = ["a b a b a", "x y z", "", "solo", "t t t t t t",
             "one two one two three one two", "A A a-a! a?"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = repetition_signals(t, field="text").to_pandas()
    rows = []
    for did, txt in enumerate(texts):
        tk = simple_tokenize(txt)
        bgs = [f"{a} {b}" for a, b in zip(tk, tk[1:])]
        if not bgs:
            continue
        frac = 1 - len(set(bgs)) / len(bgs)
        rows.append((did, len(bgs), len(set(bgs)),
                     np.floor(frac * 1e6 + 0.5) / 1e6))
    assert list(map(tuple, got.itertuples(index=False))) == rows


def test_compression_ratio_reference():
    import zlib

    from jesterj_ray.stages.textstats import compression_ratio
    texts = ["hello hello hello hello", "x", "", "entropy? 8f3k1!"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = compression_ratio(t, field="text").to_pandas()
    want = [(i, np.floor(len(zlib.compress(s.encode(), 6))
                         / len(s.encode()) * 1e6 + 0.5) / 1e6)
            for i, s in enumerate(texts) if s]
    assert list(map(tuple, got.itertuples(index=False))) == want


def test_repeated_ngram_spans_layout_invariant(ray_session):
    """Block-distinct doc partials sum to the exact global distinct
    count at any block layout (each doc lives in exactly one block)."""
    from jesterj_ray.stages.dedup import repeated_ngram_spans
    sf = "/root/testdata/sf0.001"
    base = repeated_ngram_spans(sf, span=10, num_blocks=1)
    for nb in (3, 8):
        got = repeated_ngram_spans(sf, span=10, num_blocks=nb)
        assert got.equals(base), nb
    assert (base["n_docs"] >= 2).all()
    assert (base["n_occ"] >= base["n_docs"]).all()


def test_phrase_pos_range(ray_session, tmp_path):
    """phrase_topk(pos_range=...): the whole span must fit the window —
    band-edge matches included/excluded exactly; single-token phrases
    take the positional path when scoped."""
    import pandas as pd
    import pyarrow.parquet as pq

    from jesterj_ray.index.build_rows import build_index_rows
    from jesterj_ray.index.query import IndexReader
    df = pd.DataFrame({
        "rid": np.arange(4, dtype=np.int64),
        "text": ["alpha beta w1 w2 w3 w4 w5 w6 body stuff",  # start 0
                 "w0 w1 w2 w3 w4 w5 alpha beta tail",        # start 6
                 "w0 w1 w2 w3 w4 w5 w6 alpha beta",          # start 7
                 "x alpha y beta z"]})                       # no phrase
    src = str(tmp_path / "p.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src)
    out = str(tmp_path / "pidx")
    build_index_rows(src, out, text_col="text", key_col="rid",
                     tokenizer="simple", docs_per_partition=4,
                     num_shards=2, positions=True)
    r = IndexReader(out)

    def ids(hits):
        return sorted(int(k) for k in r.doc_keys(
            np.array([h[0] for h in hits], dtype=np.int64)))

    assert ids(r.phrase_topk("alpha beta", 10)) == [0, 1, 2]
    # title band [0, 8): doc 2's phrase (start 7, end 9) sticks out
    assert ids(r.phrase_topk("alpha beta", 10,
                             pos_range=(0, 8))) == [0, 1]
    # body band [8, inf): none start at >= 8
    assert ids(r.phrase_topk("alpha beta", 10,
                             pos_range=(8, 1 << 30))) == []
    # single token scoped: 'beta' at pos 1, 7, 8, 3
    assert ids(r.phrase_topk("beta", 10, pos_range=(0, 8))) == [0, 1, 3]
    assert ids(r.phrase_topk("beta", 10,
                             pos_range=(8, 1 << 30))) == [2]


def test_explain_sums_to_topk_score(ray_session, tmp_path):
    """IndexReader.explain (Solr debugQuery analog): per-term
    contributions sum exactly to the doc's topk score; absent terms
    contribute 0; unknown keys raise."""
    import pandas as pd
    import pyarrow.parquet as pq

    from jesterj_ray.index.build_rows import build_index_rows
    from jesterj_ray.index.query import IndexReader
    rng = np.random.default_rng(8)
    vocab = ["alpha", "beta", "gamma", "omega"] + \
        [f"w{i}" for i in range(30)]
    df = pd.DataFrame({
        "rid": np.arange(120, dtype=np.int64),
        "text": [" ".join(rng.choice(vocab, size=int(n)))
                 for n in rng.integers(3, 25, size=120)]})
    src = str(tmp_path / "e.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), src)
    out = str(tmp_path / "eidx")
    build_index_rows(src, out, text_col="text", key_col="rid",
                     tokenizer="simple", docs_per_partition=64,
                     num_shards=2)
    r = IndexReader(out)
    hits = r.topk("alpha omega zzznope", 120)
    keys = r.doc_keys(np.array([h[0] for h in hits], dtype=np.int64))
    assert hits
    for (did, score), key in list(zip(hits, keys))[:20]:
        ex = r.explain("alpha omega zzznope", key)
        assert ex["doc_id"] == did
        assert ex["score"] == pytest.approx(score, abs=1e-12)
        assert ex["score"] == pytest.approx(
            sum(t["contribution"] for t in ex["terms"]), abs=1e-15)
        absent = [t for t in ex["terms"] if t["term"] == "zzznope"][0]
        assert absent["tf"] == 0 and absent["contribution"] == 0.0
    with pytest.raises(KeyError):
        r.explain("alpha", "nosuchkey")
