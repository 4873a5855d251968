"""LLM-prep document chunking (stages/chunking.py): window math,
boundary tokens, char mass, and edge cases — all against a transparent
per-doc reference implementation."""
import numpy as np
import pyarrow as pa
import pytest

from jesterj_ray.stages.chunking import chunk_table
from jesterj_ray.tokenize.tokenizer import simple_tokenize


def ref_chunks(texts, chunk, stride):
    rows = []
    for did, txt in enumerate(texts):
        tk = simple_tokenize(txt or "")
        s = 0
        ci = 0
        while s < len(tk):
            w = tk[s:s + chunk]
            rows.append((did, ci, len(w), w[0], w[-1],
                         sum(len(x) for x in w)))
            s += stride
            ci += 1
    return rows


@pytest.mark.parametrize("chunk,stride", [(64, 48), (8, 8), (5, 2),
                                          (1, 1), (3, 3)])
def test_chunk_table_matches_reference(chunk, stride):
    rng = np.random.default_rng(7)
    vocab = ["alpha", "be", "gamma9", "x", "delta", "ee", "zz7"]
    texts = [" ".join(rng.choice(vocab, size=int(n)))
             for n in rng.integers(0, 40, size=30)]
    texts += ["", "   ", "...!!!", "one", "Tab\there  spaces",
              " ".join(["tok"] * 64),        # exactly one window
              " ".join(["tok"] * 65)]        # one full + tail
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = chunk_table(t, chunk_size=chunk, stride=stride)
    want = ref_chunks(texts, chunk, stride)
    rows = list(zip(got["doc_id"].to_pylist(),
                    got["chunk_idx"].to_pylist(),
                    got["n_tokens"].to_pylist(),
                    got["first_tok"].to_pylist(),
                    got["last_tok"].to_pylist(),
                    got["n_chars"].to_pylist()))
    assert rows == want


def test_chunk_table_empty_and_guards():
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["", "!!!"], pa.string())})
    out = chunk_table(t)
    assert len(out) == 0 and out.column_names == [
        "doc_id", "chunk_idx", "n_tokens", "first_tok", "last_tok",
        "n_chars"]
    with pytest.raises(ValueError):
        chunk_table(t, chunk_size=4, stride=5)
    with pytest.raises(ValueError):
        chunk_table(t, chunk_size=4, stride=0)
