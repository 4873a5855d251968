"""C4 line-level cleaning (Raffel et al. 2020, §2.2) — the canonical
web-corpus cleanup: per-LINE rules (keep lines ending in terminal
punctuation, with >= ``min_words`` words, without "javascript"),
then per-PAGE rules (drop pages containing "lorem ipsum" or a curly
brace, or with fewer than ``min_lines`` surviving lines).

Fully doc-local: the line explode happens inside ``map_batches`` and
every rule + the page fold evaluates on flat arrays with segmented
``np.bincount`` reductions — NO shuffle at any scale (each page's
lines never leave the batch that read it).  Rule kernels are one
Arrow regex/count pass per rule over the whole batch's lines.

The test corpus is flat single-line text, so the driver pipeline
synthesizes line structure deterministically (6-word lines, terminal
'.' withheld on every (doc_id + lidx) % 4 == 0 line, a "lorem ipsum
dolor." line injected on doc_id % 41 == 0 pages and a "function() {"
line on doc_id % 37 == 0 pages) — mirrored verbatim in the
``c4_line_filter`` oracle.  The quote character is omitted from the
terminal-punctuation set ([.!?] not [.!?"]) purely to keep the frozen
rule identical and readable on both sides; documented divergence from
C4's full set.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..tokenize.tokenizer import lower_column

_WS_RE = re.compile(r"[\t\n\v\f\r ]+")

# frozen rule constants (oracle mirrors)
MIN_WORDS = 5
MIN_LINES = 3
TERMINAL_RE = r"[.!?]$"
SYNTH_WORDS_PER_LINE = 6
SYNTH_LOREM = "lorem ipsum dolor."
SYNTH_BRACE = "function() {"


def c4_filter_lines(batch: pa.Table, *, min_words: int = MIN_WORDS,
                    min_lines: int = MIN_LINES,
                    sep: str = "\n") -> pa.Table:
    """(doc_id, lidx, line) rows -> per-doc verdicts.

    Output: (doc_id, n_lines, n_kept, page_kept, text_clean) — one row
    per doc present in the batch; ``text_clean`` is NULL for dropped
    pages.  Requires each doc's lines complete within the batch (the
    explode-in-same-batch contract).
    """
    lines = batch["line"]
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    doc_raw = batch["doc_id"].to_numpy(zero_copy_only=False)
    docs, doc_of = np.unique(doc_raw, return_inverse=True)
    n_docs = docs.size
    low = lower_column(lines)
    term = pc.match_substring_regex(lines, pattern=TERMINAL_RE) \
        .to_numpy(zero_copy_only=False)
    words = pc.count_substring_regex(lines, pattern="[^ ]+") \
        .to_numpy(zero_copy_only=False)
    js = pc.match_substring(low, pattern="javascript") \
        .to_numpy(zero_copy_only=False)
    lorem = pc.match_substring(low, pattern="lorem ipsum") \
        .to_numpy(zero_copy_only=False)
    brace = pc.match_substring(lines, pattern="{") \
        .to_numpy(zero_copy_only=False)
    keep_line = term & (words >= min_words) & ~js
    n_lines = np.bincount(doc_of, minlength=n_docs)
    n_kept = np.bincount(doc_of, weights=keep_line,
                         minlength=n_docs).astype(np.int64)
    bad_page = (np.bincount(doc_of, weights=lorem,
                            minlength=n_docs) > 0) | \
               (np.bincount(doc_of, weights=brace,
                            minlength=n_docs) > 0)
    page_kept = ~bad_page & (n_kept >= min_lines)
    # reassemble kept pages' surviving lines in (doc, lidx) order
    lidx = batch["lidx"].to_numpy(zero_copy_only=False)
    texts = [None] * n_docs
    sel = np.flatnonzero(keep_line & page_kept[doc_of])
    if sel.size:
        order = sel[np.lexsort((lidx[sel], doc_of[sel]))]
        # only SURVIVING lines of kept pages convert to Python (r05
        # self-review #9 — most lines are discarded on real corpora)
        kept_lines = lines.take(pa.array(order, pa.int64())).to_pylist()
        odoc = doc_of[order]
        bounds = np.flatnonzero(np.diff(odoc) != 0) + 1
        starts = np.concatenate([[0], bounds])
        for s, seg in zip(starts, np.split(np.arange(order.size),
                                           bounds)):
            texts[odoc[s]] = sep.join(kept_lines[i] for i in seg)
    return pa.table({
        "doc_id": pa.array(docs, pa.int64()),
        "n_lines": pa.array(n_lines.astype(np.int64), pa.int64()),
        "n_kept": pa.array(n_kept, pa.int64()),
        "page_kept": pa.array(page_kept, pa.bool_()),
        "text_clean": pa.array(texts, pa.string())})


def _synth_lines(batch: pa.Table, *, field: str = "text",
                 id_col: str = "doc_id") -> pa.Table:
    """Deterministic line synthesis (frozen; oracle mirrors)."""
    ids = batch[id_col].to_pylist()
    texts = batch[field].to_pylist()
    out_id, out_lidx, out_l = [], [], []
    for d, t in zip(ids, texts):
        if d % 41 == 0:
            out_id.append(d)
            out_lidx.append(0)
            out_l.append(SYNTH_LOREM)
        ws = [w for w in _WS_RE.split(t or "") if w]
        for i in range(0, len(ws), SYNTH_WORDS_PER_LINE):
            lidx = i // SYNTH_WORDS_PER_LINE + 1
            line = " ".join(ws[i:i + SYNTH_WORDS_PER_LINE])
            if (d + lidx) % 4 != 0:
                line += "."
            out_id.append(d)
            out_lidx.append(lidx)
            out_l.append(line)
        if d % 37 == 0:
            out_id.append(d)
            out_lidx.append(999_999)
            out_l.append(SYNTH_BRACE)
    return pa.table({
        "doc_id": pa.array(out_id, pa.int64()),
        "lidx": pa.array(out_lidx, pa.int64()),
        "line": pa.array(out_l, pa.string())})


def c4_line_filter_pipeline(sf_dir: str, *, num_blocks: int = 16):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"],
                               override_num_blocks=num_blocks)

    def synth_and_filter(t: pa.Table) -> pa.Table:
        # ONE fused stage: a doc's lines must stay within the batch
        # that exploded them (re-batching between two map_batches
        # could split a page), so synth + rules run back to back
        return c4_filter_lines(_synth_lines(t))

    return ds.map_batches(synth_and_filter,
                          batch_format="pyarrow").sort("doc_id")
