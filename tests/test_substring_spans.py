"""Exact repeated-substring mask regions (dedup.repeated_substring_spans):
variable-length merge semantics vs a brute-force reference, within-doc
repeats, block-layout independence."""
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jesterj_ray.stages.dedup import repeated_substring_spans
from jesterj_ray.tokenize.tokenizer import simple_tokenize


def _brute_spans(texts, span, min_occ):
    """Row-at-a-time reference: count every span-gram, mark covered
    positions, emit maximal runs."""
    toks = {d: simple_tokenize(t) for d, t in texts}
    counts = {}
    for tl in toks.values():
        for i in range(len(tl) - span + 1):
            g = tuple(tl[i:i + span])
            counts[g] = counts.get(g, 0) + 1
    rows = []
    for d, tl in toks.items():
        covered = np.zeros(len(tl), dtype=bool)
        for i in range(len(tl) - span + 1):
            if counts[tuple(tl[i:i + span])] >= min_occ:
                covered[i:i + span] = True
        i = 0
        while i < len(tl):
            if covered[i]:
                j = i
                while j < len(tl) and covered[j]:
                    j += 1
                rows.append((d, i, j, j - i))
                i = j
            else:
                i += 1
    return pd.DataFrame(rows, columns=["doc_id", "span_start",
                                       "span_end", "span_tokens"])


def _write(tmp_path, texts):
    sf = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([d for d, _ in texts], pa.int64()),
        "text": pa.array([t for _, t in texts], pa.string())}),
        os.path.join(sf, "documents.parquet"))
    return sf


WORDS = ("alpha beta gamma delta eps zeta eta theta iota kappa "
         "lam mu nu xi omi pi rho sigma tau ups").split()


def _mk(words):
    return " ".join(words)


def test_variable_length_merge(ray_session, tmp_path):
    # a 12-token block shared by docs 0/1 must come back as ONE
    # 12-token span (not separate 8-gram windows); doc 2 is clean
    shared = WORDS[:12]
    texts = [
        (0, _mk(["zero0", "zero1"] + shared + ["zero2"])),
        (1, _mk(["one0"] + shared + ["one1", "one2", "one3"])),
        (2, _mk([f"u{i}" for i in range(15)])),
    ]
    sf = _write(tmp_path, texts)
    out = repeated_substring_spans(sf, span=8, min_occ=2, num_blocks=2,
                                  num_groups=3)
    ref = _brute_spans(texts, 8, 2).sort_values(
        ["doc_id", "span_start"]).reset_index(drop=True)
    assert out.equals(ref)
    byid = out.set_index("doc_id")
    assert byid.loc[0, "span_start"] == 2
    assert byid.loc[0, "span_tokens"] == 12
    assert byid.loc[1, "span_start"] == 1
    assert 2 not in byid.index


def test_within_doc_repeat_counts(ray_session, tmp_path):
    # the repeat lives INSIDE one doc: occurrences, not distinct docs
    block = WORDS[:8]
    texts = [(5, _mk(block + ["mid1", "mid2"] + block)),
             (6, _mk([f"v{i}" for i in range(20)]))]
    sf = _write(tmp_path, texts)
    out = repeated_substring_spans(sf, span=8, min_occ=2, num_blocks=1)
    assert list(out["doc_id"]) == [5, 5]
    assert list(out["span_start"]) == [0, 10]
    assert list(out["span_tokens"]) == [8, 8]


def test_adjacent_spans_merge_when_touching(ray_session, tmp_path):
    # two repeated 8-gram regions separated by < span gap of repeated
    # coverage merge; here the whole 16-token run repeats -> one span
    run = WORDS[:16]
    texts = [(0, _mk(run)), (1, _mk(["x0"] + run + ["x1"]))]
    sf = _write(tmp_path, texts)
    out = repeated_substring_spans(sf, span=8, min_occ=2, num_blocks=1)
    ref = _brute_spans(texts, 8, 2).sort_values(
        ["doc_id", "span_start"]).reset_index(drop=True)
    assert out.equals(ref)
    assert list(out["span_tokens"]) == [16, 16]


def test_block_layout_independence(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    texts = []
    for d in range(30):
        ws = [WORDS[i] for i in rng.integers(0, len(WORDS), size=40)]
        if d % 4 == 0:
            ws[10:22] = WORDS[:12]          # planted shared block
        texts.append((d, _mk(ws)))
    sf = _write(tmp_path, texts)
    a = repeated_substring_spans(sf, span=10, min_occ=2,
                                 num_blocks=1, num_groups=2)
    b = repeated_substring_spans(sf, span=10, min_occ=2,
                                 num_blocks=7, num_groups=5)
    assert a.equals(b)
    ref = _brute_spans(texts, 10, 2).sort_values(
        ["doc_id", "span_start"]).reset_index(drop=True)
    assert a.equals(ref)


def test_removal_applies_masks(ray_session, tmp_path):
    from jesterj_ray.stages.dedup import (repeated_substring_removal,
                                          repeated_substring_spans)
    shared = WORDS[:12]
    texts = [
        (0, _mk(["zero0", "zero1"] + shared + ["zero2"])),
        (1, _mk(["one0"] + shared + ["one1", "one2"])),
        (2, _mk([f"u{i}" for i in range(15)])),
        (3, _mk(shared)),                 # fully masked doc
        (4, _mk(shared)),
    ]
    sf = _write(tmp_path, texts)
    out = repeated_substring_removal(sf, span=8, min_occ=2,
                                     num_blocks=2).set_index("doc_id")
    spans = repeated_substring_spans(sf, span=8, min_occ=2,
                                     num_blocks=2)
    # masked counts agree with the span table
    per_doc = spans.groupby("doc_id")["span_tokens"].sum()
    for d in out.index:
        assert out.loc[d, "n_masked"] == per_doc.get(d, 0)
    assert out.loc[0, "text_deduped"] == "zero0 zero1 zero2"
    assert out.loc[1, "text_deduped"] == "one0 one1 one2"
    assert out.loc[2, "n_masked"] == 0
    assert out.loc[3, "text_deduped"] is None     # everything masked
    assert out.loc[3, "n_masked"] == out.loc[3, "n_tokens"]
