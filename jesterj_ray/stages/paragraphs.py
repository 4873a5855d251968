"""Paragraph-level exact dedup — the Dolma/RefinedWeb boilerplate pass.

Web-scale training pipelines dedupe at PARAGRAPH granularity as well as
document granularity: repeated boilerplate ("subscribe to our
newsletter") is removed from every document after its first occurrence
while the surrounding document survives.  Keep-first here means the
globally minimal ``(doc_id, paragraph_index)`` — input-derived, so the
result is identical at any parallelism (the repo's docID rule).

Distributed shape: explode documents into paragraph rows inside
``map_batches`` (doc-local, no shuffle — each row also carries its
doc's total paragraph count, so no separate count aggregation or
driver fold exists), then reuse ``dedup.exact_dedup`` — local
keep-first shrink, ONE coarse-sha-gkey exchange, vectorized global
keep-min — and reassemble survivors per document with a second coarse
``doc_id``-gkey exchange.  Two key-partitioned exchanges of surviving
paragraphs total; dropped boilerplate never re-shuffles.  ``num_groups``
scales with the cluster exactly as in ``exact_dedup``.

The test corpus is flat single-line text, so the ``paragraph_dedup``
pipeline synthesizes paragraph structure deterministically (8-word
groups + injected boilerplate, mirrored verbatim in the DuckDB oracle):
that exercises the real machinery on genuinely repeated cross-document
paragraphs.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .dedup import exact_dedup

# pidx packs into okey = doc_id * PMAX + pidx; paragraphs per doc must
# stay below this (enforced at explode time)
PMAX = 1 << 20

_WS_RE = re.compile(r"[\t\n\v\f\r ]+")

# frozen synthesis constants (mirrored in the paragraph_dedup oracle)
SYNTH_WORDS_PER_PARA = 8
SYNTH_PREPEND = "breaking update follow this channel now"
SYNTH_APPEND = "subscribe to the newsletter for weekly updates"
SYNTH_APPEND_PIDX = 999_999


def _rows_table(out_id, out_pidx, out_p) -> pa.Table:
    """(doc_id, pidx, ptext) rows + per-doc n_paras carried on each row
    (doc-local knowledge — avoids any later count aggregation)."""
    ids = np.asarray(out_id, dtype=np.int64)
    if ids.size:
        # rows for one doc are contiguous by construction
        change = np.flatnonzero(np.diff(ids) != 0) + 1
        starts = np.concatenate([[0], change, [ids.size]])
        lens = np.diff(starts)
        npar = np.repeat(lens, lens)
    else:
        npar = ids
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "pidx": pa.array(out_pidx, pa.int64()),
        "n_paras": pa.array(npar, pa.int64()),
        "ptext": pa.array(out_p, pa.string())})


def split_paragraphs(batch: pa.Table, *, field: str,
                     id_col: str = "doc_id") -> pa.Table:
    """Real-corpus explode: blank-line-separated paragraphs → rows;
    empty paragraphs dropped."""
    ids = batch[id_col].to_pylist()
    texts = batch[field].to_pylist()
    out_id, out_pidx, out_p = [], [], []
    for d, t in zip(ids, texts):
        paras = [p.strip() for p in re.split(r"\n\s*\n", t or "")]
        paras = [p for p in paras if p]
        if len(paras) >= PMAX:
            raise ValueError(f"doc {d}: {len(paras)} paragraphs >= PMAX")
        out_id.extend([d] * len(paras))
        out_pidx.extend(range(len(paras)))
        out_p.extend(paras)
    return _rows_table(out_id, out_pidx, out_p)


def dedup_paragraphs(paras: "ray.data.Dataset", *,
                     num_groups: int = 64,
                     sep: str = "\n\n") -> "ray.data.Dataset":
    """(doc_id, pidx, n_paras, ptext) rows → per-doc reassembly.

    Output: (doc_id, n_paras, n_kept, text_clean) sorted by doc_id;
    documents whose every paragraph was dropped do not appear (no text
    remains).
    """
    def add_okey(t: pa.Table) -> pa.Table:
        ok = (t["doc_id"].to_numpy(zero_copy_only=False) * PMAX
              + t["pidx"].to_numpy(zero_copy_only=False))
        return t.append_column("okey", pa.array(ok, pa.int64()))

    keyed = paras.map_batches(add_okey, batch_format="pyarrow")
    winners = exact_dedup(
        keyed, field="ptext", order_col="okey",
        keep_cols=["doc_id", "pidx", "n_paras", "ptext"],
        num_groups=num_groups)

    def add_gkey(t: pa.Table) -> pa.Table:
        g = t["doc_id"].to_numpy(zero_copy_only=False) % num_groups
        return t.append_column("__gkey", pa.array(g, pa.int64()))

    def reassemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "pidx"])
        agg = g.groupby("doc_id").agg(
            n_paras=("n_paras", "first"),
            n_kept=("ptext", "size"),
            text_clean=("ptext", sep.join)).reset_index()
        return agg

    return winners.map_batches(add_gkey, batch_format="pyarrow") \
        .groupby("__gkey") \
        .map_groups(reassemble, batch_format="pandas") \
        .sort("doc_id")


def _synth_paragraphs(batch: pa.Table, *, field: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """Deterministic paragraph synthesis (frozen; oracle mirrors):
    8-word groups at pidx 1.., a shared prepend at pidx 0 for
    doc_id%3==0, a shared append at pidx 999999 for every doc."""
    ids = batch[id_col].to_pylist()
    texts = batch[field].to_pylist()
    out_id, out_pidx, out_p = [], [], []
    for d, t in zip(ids, texts):
        if d % 3 == 0:
            out_id.append(d)
            out_pidx.append(0)
            out_p.append(SYNTH_PREPEND)
        ws = [w for w in _WS_RE.split(t or "") if w]
        for i in range(0, len(ws), SYNTH_WORDS_PER_PARA):
            out_id.append(d)
            out_pidx.append(i // SYNTH_WORDS_PER_PARA + 1)
            out_p.append(" ".join(ws[i:i + SYNTH_WORDS_PER_PARA]))
        out_id.append(d)
        out_pidx.append(SYNTH_APPEND_PIDX)
        out_p.append(SYNTH_APPEND)
    return _rows_table(out_id, out_pidx, out_p)


def paragraph_dedup_pipeline(sf_dir: str, *, num_groups: int = 16):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"],
                               override_num_blocks=16)
    paras = ds.map_batches(_synth_paragraphs, batch_format="pyarrow")
    return dedup_paragraphs(paras, num_groups=num_groups)
