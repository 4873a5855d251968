"""Property-based tests (hypothesis): codec round-trips and vectorized
kernels hold for arbitrary inputs, not just the fixtures."""
import numpy as np
from hypothesis import given, settings, strategies as st

from jesterj_ray.index.codec import (BLOCK_SIZE, decode_postings,
                                     encode_postings, varbyte_decode,
                                     varbyte_encode, varbyte_lengths)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
def test_varbyte_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    blob = varbyte_encode(v)
    assert len(blob) == int(varbyte_lengths(v).sum())
    out = varbyte_decode(blob, v.size)
    assert np.array_equal(out, v)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 2**40), st.integers(1, 1000)),
                min_size=1, max_size=400))
def test_postings_roundtrip_and_blocks(pairs):
    # strictly ascending doc ids from positive gaps
    gaps = np.array([p[0] + 1 for p in pairs], dtype=np.int64)
    docs = np.cumsum(gaps)
    tfs = np.array([p[1] for p in pairs], dtype=np.int64)
    doc_blob, tf_blob, bl, bm, doff, toff = encode_postings(docs, tfs)
    d2, t2 = decode_postings(doc_blob, tf_blob, docs.size)
    assert np.array_equal(d2, docs) and np.array_equal(t2, tfs)
    # block metadata invariants
    nb = (docs.size + BLOCK_SIZE - 1) // BLOCK_SIZE
    assert bl.size == bm.size == nb
    assert bl[-1] == docs[-1]
    assert int(doff[-1]) == len(doc_blob) and int(toff[-1]) == len(tf_blob)
    for b in range(nb):
        lo, hi = b * BLOCK_SIZE, min(docs.size, (b + 1) * BLOCK_SIZE)
        assert bl[b] == docs[hi - 1]
        assert bm[b] == tfs[lo:hi].max()
        # per-block byte slice decodes exactly that block's values
        deltas = varbyte_decode(doc_blob[doff[b]:doff[b + 1]], hi - lo)
        base = docs[lo - 1] if lo else 0
        assert np.array_equal(np.cumsum(deltas.astype(np.int64)) + base,
                              docs[lo:hi])


@settings(max_examples=30, deadline=None)
@given(st.lists(st.lists(st.sampled_from(
    ["ant", "bee", "cat", "dog", "elk", "fox"]), max_size=30), max_size=12))
def test_batch_simhash_equals_scalar_property(docs):
    from jesterj_ray.stages.dedup import batch_simhash64, simhash64
    got = batch_simhash64(docs)
    want = np.array([simhash64(d) for d in docs], dtype=np.uint64)
    assert np.array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="abc XYZ09 ", max_size=60), min_size=1,
                max_size=10),
       st.integers(1, 5))
def test_fingerprint_batch_split_invariance(texts, split):
    """Fingerprints are identical whether computed in one batch or any
    split of it (batch boundaries must never leak into values)."""
    import pyarrow as pa
    from jesterj_ray.stages.textstats import fingerprint

    def fp(ts):
        t = pa.table({"text": pa.array(ts, pa.string())})
        return fingerprint(t, field="text")["fingerprint"].to_pylist()

    whole = fp(texts)
    split = max(1, min(split, len(texts)))
    parts = []
    for i in range(0, len(texts), split):
        parts.extend(fp(texts[i:i + split]))
    assert parts == whole


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="abcd ", min_size=1, max_size=40),
                min_size=2, max_size=8))
def test_minhash_identical_docs_estimate_one(texts):
    from jesterj_ray.stages.dedup import minhash_signature
    for t in texts:
        a = minhash_signature(t)
        b = minhash_signature(t)
        assert np.array_equal(a, b)
