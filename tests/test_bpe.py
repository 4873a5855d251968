"""BPE trainer pins: brute-force reference identity, parallelism
invariance, and merge-table structural laws."""
import collections
import os
import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from jesterj_ray.stages.bpe import (END, train_bpe, train_bpe_documents,
                                    word_histogram)

SF = "/root/testdata/sf0.001"


def _brute(hdf: pd.DataFrame, m: int) -> pd.DataFrame:
    vocab = {w: list(w) + [END] for w in hdf["word"]}
    cnt = dict(zip(hdf["word"], hdf["n"]))
    merges = []
    for rank in range(1, m + 1):
        pairs = collections.Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt[w]
        if not pairs:
            break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l \
                        and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return pd.DataFrame(merges,
                        columns=["rank", "left", "right", "pair_count"])


def test_train_bpe_equals_brute_reference():
    texts = pq.read_table(os.path.join(SF, "documents.parquet"),
                          columns=["text"]).column(0).to_pylist()[:80]
    hist = collections.Counter(
        w for t in texts for w in re.findall(r"[a-z0-9]+",
                                             (t or "").lower()))
    hdf = pd.DataFrame(sorted(hist.items()), columns=["word", "n"])
    got = train_bpe(hdf, 12)
    want = _brute(hdf, 12)
    pd.testing.assert_frame_equal(
        got.astype({"rank": np.int64, "pair_count": np.int64}),
        want.astype({"rank": np.int64, "pair_count": np.int64}))


def test_train_bpe_documents_parallelism_invariant(ray_session):
    import ray.data as rd
    a = train_bpe_documents(SF, num_merges=10)
    ds = rd.read_parquet(os.path.join(SF, "documents.parquet"),
                         columns=["text"], override_num_blocks=64)
    hist = word_histogram(ds).sort_values("word").reset_index(drop=True)
    b = train_bpe(hist, 10)
    pd.testing.assert_frame_equal(a, b)


def test_merge_table_laws(ray_session):
    out = train_bpe_documents(SF, num_merges=16)
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    # pair counts never increase as merges consume mass... not strictly
    # monotone in general, but each merged pair count must be positive
    assert (out["pair_count"] > 0).all()
    # a merged symbol can only reference chars, END, or EARLIER merges
    known = set("abcdefghijklmnopqrstuvwxyz0123456789") | {END}
    for _, row in out.iterrows():
        assert row["left"] in known and row["right"] in known
        known.add(row["left"] + row["right"])


def test_bpe_encode_roundtrip_properties(ray_session):
    """Encoding laws: 0 merges -> chars+1 per word; more merges never
    increase a doc's token count; the encoder matches a direct
    per-doc re-encode."""
    from jesterj_ray.stages.bpe import (_encode_word, _WORD_RE,
                                        bpe_encode_documents,
                                        train_bpe_documents)
    zero = bpe_encode_documents(SF, num_merges=0)
    texts = pq.read_table(os.path.join(SF, "documents.parquet"),
                          columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    want0 = texts["text"].map(
        lambda x: sum(len(w) + 1 for w in
                      _WORD_RE.findall((x or "").lower())))
    assert (zero["n_bpe_tokens"].to_numpy()
            == want0.to_numpy()).all()

    some = bpe_encode_documents(SF, num_merges=12)
    assert (some["n_bpe_tokens"].to_numpy()
            <= zero["n_bpe_tokens"].to_numpy()).all()
    assert (some["n_bpe_tokens"].to_numpy()
            < zero["n_bpe_tokens"].to_numpy()).any()

    merges = train_bpe_documents(SF, num_merges=12)
    ranks = {(l, r): int(k) for k, l, r in zip(
        merges["rank"], merges["left"], merges["right"])}
    for i in [0, 7, 33]:
        txt = texts["text"].iloc[i] or ""
        want = sum(len(_encode_word(w, ranks))
                   for w in _WORD_RE.findall(txt.lower()))
        assert int(some["n_bpe_tokens"].iloc[i]) == want


from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(st.text(alphabet="abc", min_size=1, max_size=6),
              st.integers(min_value=1, max_value=9)),
    min_size=1, max_size=12),
    st.integers(min_value=1, max_value=8))
def test_train_bpe_property_vs_brute(pairs, m):
    """Property: on ANY small word histogram the vectorized trainer
    equals the brute-force reference exactly (counts, tie-breaks,
    early stop)."""
    hist = {}
    for w, n in pairs:
        hist[w] = hist.get(w, 0) + n
    hdf = pd.DataFrame(sorted(hist.items()), columns=["word", "n"])
    got = train_bpe(hdf, m)
    want = _brute(hdf, m)
    pd.testing.assert_frame_equal(
        got.astype({"rank": np.int64, "pair_count": np.int64}),
        want.astype({"rank": np.int64, "pair_count": np.int64}))
