"""Document chunking for LLM training-data prep: fixed-size token
windows with overlap — the standard pre-training / RAG corpus shaping
step (each document becomes ceil(n/stride) chunks of ``chunk_size``
tokens, consecutive chunks sharing ``chunk_size - stride`` tokens).

Fully vectorized: one Arrow ``split_pattern_regex`` per batch gives the
token lists; empties drop and chunk enumeration / boundary-token /
char-count math run as numpy index arithmetic over the FLATTENED token
array (no per-doc Python).  The emitted columns are chunk METADATA
(boundary tokens + exact char mass), not chunk text — at 100 TB you
join chunks back to text lazily by (doc_id, token range) instead of
re-materializing the corpus ~1.3x (overlap) through every exchange.

Tokenization is frozen to the repo rule (== DuckDB
``regexp_extract_all(lower(text), '[a-z0-9]+')``), so the whole
operator is SQL-oracle-checkable (`chunk_documents` query).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_table(t: pa.Table, *, field: str = "text",
                id_col: str = "doc_id", chunk_size: int = 64,
                stride: int = 48) -> pa.Table:
    """(doc_id, chunk_idx, n_tokens, first_tok, last_tok, n_chars) per
    token window; docs with zero tokens emit no rows."""
    if not 0 < stride <= chunk_size:
        raise ValueError("need 0 < stride <= chunk_size")
    n_docs = len(t)
    col = t[field]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    low = pc.utf8_lower(col)
    lists = pc.split_pattern_regex(low, pattern="[^a-z0-9]+")
    flat = pc.list_flatten(lists)
    raw_lens = pc.list_value_length(lists).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    doc_of_raw = np.repeat(np.arange(n_docs, dtype=np.int64), raw_lens)
    n = np.bincount(doc_of_raw[keep_np], minlength=n_docs) \
        .astype(np.int64)                      # kept tokens per doc
    toks = flat.filter(keep)                   # doc-order token stream
    tok_start = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n, out=tok_start[1:])
    n_chunks = np.where(n > 0, (n - 1) // stride + 1, 0)
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table({
            "doc_id": pa.array([], t[id_col].type),
            "chunk_idx": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "first_tok": pa.array([], pa.string()),
            "last_tok": pa.array([], pa.string()),
            "n_chars": pa.array([], pa.int64())})
    doc_rep = np.repeat(np.arange(n_docs, dtype=np.int64), n_chunks)
    chunk_base = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=chunk_base[1:])
    ci = np.arange(total, dtype=np.int64) - chunk_base[doc_rep]
    s = ci * stride
    ntok = np.minimum(chunk_size, n[doc_rep] - s)
    first_idx = tok_start[doc_rep] + s
    last_idx = first_idx + ntok - 1
    tl = pc.utf8_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    cs = np.zeros(tl.size + 1, dtype=np.int64)
    np.cumsum(tl, out=cs[1:])
    return pa.table({
        "doc_id": t[id_col].take(pa.array(doc_rep)),
        "chunk_idx": pa.array(ci, pa.int64()),
        "n_tokens": pa.array(ntok, pa.int64()),
        "first_tok": toks.take(pa.array(first_idx)),
        "last_tok": toks.take(pa.array(last_idx)),
        "n_chars": pa.array(cs[last_idx + 1] - cs[first_idx],
                            pa.int64())})


def chunk_documents(sf_dir: str, chunk_size: int = 64,
                    stride: int = 48):
    """Chunk the documents table; returns the sorted pandas frame the
    driver hashes (sorted only because the result is oracle-compared;
    the production path is the unsorted streaming Dataset)."""
    import ray.data as rd
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"],
                         override_num_blocks=8)
    out = ds.map_batches(
        chunk_table, batch_format="pyarrow",
        fn_kwargs={"chunk_size": chunk_size, "stride": stride}) \
        .to_pandas()
    return out.sort_values(["doc_id", "chunk_idx"]) \
        .reset_index(drop=True)
