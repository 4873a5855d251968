"""Benchmark decontamination: n-gram overlap of a corpus against a
benchmark document set — the standard training-data hygiene check (flag
or drop training docs that leak evaluation data).

Scale shape: the benchmark side is SMALL relative to the corpus (eval
suites are MBs, corpora are TBs) — its distinct token n-grams broadcast
ONCE via ``ray.put`` and every corpus block probes the shared set with
C-level set intersections inside ``map_batches``; the corpus side
streams, nothing shuffles.  At a benchmark too big for one object,
hash-partition grams and probe per partition (or swap the set for a
Bloom filter and accept false positives; both noted, not needed here).

The per-doc metric is the contaminated fraction of the doc's DISTINCT
n-grams — exactly expressible in SQL (token-list slicing + anti-join),
so the driver's DuckDB oracle verifies the whole pipeline."""

from __future__ import annotations

import os
from typing import List, Set

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..tokenize.tokenizer import simple_tokenize


def _doc_grams(text: str, n: int) -> Set[str]:
    toks = simple_tokenize(text or "")
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def ngram_contamination(corpus: "rd.Dataset", benchmark: "rd.Dataset", *,
                        text_col: str, id_col: str, n: int = 5
                        ) -> pd.DataFrame:
    """Per-corpus-doc contamination vs the benchmark's n-gram set.

    Returns (id, n_grams, n_hit, ratio) for every corpus doc with at
    least one n-gram (docs shorter than ``n`` tokens carry no signal and
    are omitted, matching the SQL construction)."""
    bench_parts = benchmark.map_batches(
        lambda t: pa.table({"gram": pa.array(
            sorted(set().union(*[_doc_grams(x, n)
                                 for x in t[text_col].to_pylist()]) or set()),
            pa.string())}),
        batch_format="pyarrow")
    bench: Set[str] = set()
    for t in ray.get(bench_parts.to_arrow_refs()):
        bench.update(t["gram"].to_pylist())
    bench_ref = ray.put(bench)

    def probe(t: pa.Table) -> pa.Table:
        bset = ray.get(bench_ref)
        ids, ngr, hit = [], [], []
        for did, text in zip(t[id_col].to_pylist(),
                             t[text_col].to_pylist()):
            grams = _doc_grams(text, n)
            if not grams:
                continue
            ids.append(did)
            ngr.append(len(grams))
            hit.append(len(grams & bset))
        return pa.table({id_col: pa.array(ids, t[id_col].type),
                         "n_grams": pa.array(ngr, pa.int64()),
                         "n_hit": pa.array(hit, pa.int64())})

    out = pa.concat_tables(
        ray.get(corpus.map_batches(probe,
                                   batch_format="pyarrow").to_arrow_refs()))
    df = out.to_pandas()
    df["ratio"] = (df["n_hit"] / df["n_grams"]).round(6)
    return df.sort_values(id_col).reset_index(drop=True)


def contamination_vs_holdout(sf_dir: str, n: int = 5,
                             bench_mod: int = 20) -> pd.DataFrame:
    """Deterministic split of the documents table: every ``bench_mod``-th
    doc_id is the 'benchmark', the rest the training corpus; report each
    training doc's contaminated n-gram fraction."""
    import pyarrow.compute as pc
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"],
                         override_num_blocks=8)

    def side(keep_bench: bool):
        def f(t: pa.Table) -> pa.Table:
            m = bench_mod
            rem = pc.subtract(t["doc_id"], pc.multiply(
                pc.divide(t["doc_id"], m), m))  # doc_id >= 0
            mask = pc.equal(rem, 0) if keep_bench else pc.not_equal(rem, 0)
            return t.filter(mask)
        return f

    bench = ds.map_batches(side(True), batch_format="pyarrow")
    corpus = ds.map_batches(side(False), batch_format="pyarrow")
    out = ngram_contamination(corpus, bench, text_col="text",
                              id_col="doc_id", n=n)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out[["doc_id", "n_grams", "n_hit", "ratio"]]
