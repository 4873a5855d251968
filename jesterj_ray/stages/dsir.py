"""DSIR-style data selection: hashed-bigram importance weights.

Data Selection with Importance Resampling (Xie et al., 2023): score
every raw-pool document by the log-likelihood ratio of a TARGET
distribution vs the RAW distribution over hashed n-gram features, so
resampling by the score tilts the pool toward the target domain.

Distributed shape (three streamed passes, nothing corpus-sized ever
gathers):
  1. vocab — per-block DISTINCT terms (vocab-bounded partial rows, the
     tfidf df shape), driver sorts; term id = rank in the sorted
     vocabulary, so ids are INPUT-DERIVED and the SQL oracle recreates
     them with ``dense_rank() OVER (ORDER BY term)``.  The vocab map
     broadcasts once (``ray.put``) — the documented-small side.
  2. feature counts — per-block bigram keys ``id1 * V + id2`` (exact
     int64: V^2 << 2^63), bucketed by the FROZEN ``mix_rank`` hash
     mod NB; per-block (bucket, target?, count) partials collapse via
     one tiny ``groupby(bucket).sum`` (NB rows total).  The driver
     turns counts into add-one-smoothed log-ratio weights
     ``ln((ct+1)/(T+NB)) - ln((cr+1)/(R+NB))`` and broadcasts the
     NB-float vector.
  3. score — each block re-derives its docs' buckets and emits
     ``doc_id, score = sum(w[bucket])`` per bigram occurrence (one
     bincount-matmul, no Python per row).

Docs with < 2 tokens have no features and do not appear (no evidence
either way) — the oracle mirrors.  Scores are irrational log sums:
6dp rounding cannot straddle engine-vs-DuckDB association differences
(the BM25 argument).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .sampling import mix_rank

NB = 1024                      # frozen feature-bucket count


def _doc_bigram_buckets(texts, vocab_sorted: np.ndarray,
                        v: int) -> tuple:
    """Per doc: bucket ids of its consecutive-token bigrams.
    Returns (lens, flat_buckets) — lens[i] = #bigrams of doc i."""
    from ..tokenize.tokenizer import simple_tokenize
    toks_per_doc = [simple_tokenize(x or "") for x in texts]
    lens = np.fromiter((max(len(t) - 1, 0) for t in toks_per_doc),
                       dtype=np.int64, count=len(toks_per_doc))
    flat = [t for doc in toks_per_doc for t in doc]
    if not flat:
        return lens, np.empty(0, np.int64)
    tid = np.searchsorted(vocab_sorted, np.asarray(flat, dtype=object))
    # consecutive pairs within each doc (drop the seam between docs)
    dlens = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64,
                        count=len(toks_per_doc))
    ends = np.cumsum(dlens)
    first = tid[:-1]
    second = tid[1:]
    keep = np.ones(first.size, dtype=bool)
    # kill the seam pair (last token of doc i -> first of doc i+1);
    # a zero-token doc has ends[i] == ends[i-1] (duplicate index,
    # harmless) and a zero-token FIRST doc has ends[0] == 0, whose
    # -1 would wrap to the block's last bigram — exclude negatives
    cut = ends[:-1] - 1
    keep[cut[cut >= 0]] = False
    keys = first[keep] * np.int64(v) + second[keep]
    return lens, mix_rank(keys) % NB


def corpus_vocab(ds: "rd.Dataset", text_col: str = "text") -> np.ndarray:
    """Sorted distinct terms (vocab-bounded partials, driver unique)."""
    from ..tokenize.tokenizer import simple_tokenize

    def distinct(t: pa.Table) -> pa.Table:
        seen = set()
        for x in t[text_col].to_pylist():
            seen.update(simple_tokenize(x or ""))
        return pa.table({"term": pa.array(sorted(seen), pa.string())})

    parts = ds.map_batches(distinct, batch_format="pyarrow").to_pandas()
    return np.unique(parts["term"].to_numpy())


def dsir_scores(sf_dir: str, *, target_lang: str = "en",
                num_blocks: int = 8) -> pd.DataFrame:
    """(doc_id, score) for every doc with >= 1 bigram, sorted by
    doc_id; score rounded 6dp."""
    path = os.path.join(sf_dir, "documents.parquet")
    ds = rd.read_parquet(path, columns=["doc_id", "lang", "text"],
                         override_num_blocks=num_blocks)
    vocab = corpus_vocab(ds)
    v = int(vocab.size)
    vref = ray.put(vocab)

    def count_partials(t: pa.Table) -> pa.Table:
        vs = ray.get(vref)
        lens, buckets = _doc_bigram_buckets(
            t["text"].to_pylist(), vs, v)
        is_t = np.repeat(
            pc.equal(t["lang"], target_lang)
            .to_numpy(zero_copy_only=False).astype(bool), lens)
        ct = np.bincount(buckets[is_t], minlength=NB)
        cr = np.bincount(buckets, minlength=NB)
        nz = np.flatnonzero(cr)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "ct": pa.array(ct[nz], pa.int64()),
                         "cr": pa.array(cr[nz], pa.int64())})

    counts = ds.map_batches(count_partials, batch_format="pyarrow") \
        .groupby("bucket").aggregate(Sum("ct", alias_name="ct"),
                                     Sum("cr", alias_name="cr")) \
        .to_pandas()
    ct = np.zeros(NB, np.int64)
    cr = np.zeros(NB, np.int64)
    ct[counts["bucket"].to_numpy()] = counts["ct"].to_numpy()
    cr[counts["bucket"].to_numpy()] = counts["cr"].to_numpy()
    t_tot, r_tot = int(ct.sum()), int(cr.sum())
    w = (np.log((ct + 1.0) / (t_tot + NB))
         - np.log((cr + 1.0) / (r_tot + NB)))
    wref = ray.put(w)

    def score(t: pa.Table) -> pa.Table:
        vs = ray.get(vref)
        ww = ray.get(wref)
        lens, buckets = _doc_bigram_buckets(
            t["text"].to_pylist(), vs, v)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(ids.size), lens)
        s = np.bincount(doc_of, weights=ww[buckets],
                        minlength=ids.size)
        has = lens > 0
        return pa.table({
            "doc_id": pa.array(ids[has], pa.int64()),
            "score": pa.array(np.floor(s[has] * 1e6 + 0.5) / 1e6,
                              pa.float64())})

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)
