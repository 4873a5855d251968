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
    are omitted, matching the SQL construction).  ``benchmark`` may be
    a Dataset or a plain ``pa.Table`` (eval suites are small — reading
    the benchmark locally avoids a second distributed scan)."""
    bench: Set[str] = set()
    if isinstance(benchmark, pa.Table):
        for x in benchmark[text_col].to_pylist():
            bench |= _doc_grams(x, n)
    else:
        bench_parts = benchmark.map_batches(
            lambda t: pa.table({"gram": pa.array(
                sorted(set().union(*[_doc_grams(x, n)
                                     for x in t[text_col].to_pylist()])
                       or set()),
                pa.string())}),
            batch_format="pyarrow")
        for t in ray.get(bench_parts.to_arrow_refs()):
            if t.num_rows == 0 or t.num_columns == 0:
                continue  # empty pass-through block (fn not invoked)
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

    parts = [t for t in ray.get(corpus.map_batches(
        probe, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows > 0 and t.num_columns > 0]
    if not parts:
        return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                             "n_grams": pd.Series([], dtype=np.int64),
                             "n_hit": pd.Series([], dtype=np.int64),
                             "ratio": pd.Series([], dtype=np.float64)})
    df = pa.concat_tables(parts).to_pandas()
    # half-AWAY-from-zero rounding to match SQL round(): numpy/pandas
    # .round() is half-to-even and the ratio is a small-denominator
    # rational where exact halfway cases occur (e.g. 1/128 -> DuckDB
    # 0.007813, banker's 0.007812 — a real oracle hash flip)
    df["ratio"] = np.floor(df["n_hit"] / df["n_grams"] * 1e6 + 0.5) / 1e6
    return df.sort_values(id_col).reset_index(drop=True)


def holdout_split(path: str, ds: "rd.Dataset", *, bench_mod: int = 20,
                  id_col: str = "doc_id", text_col: str = "text"):
    """THE holdout rule, in one place (the curation pipeline reuses it
    verbatim — r05 self-review: two copies silently desynchronize):
    benchmark = rows with ``id % bench_mod == 0``, read locally from
    ``path`` (eval suites are MBs; the corpus scan reads everything
    anyway); pool = ``ds`` minus those rows (ids must be >= 0 — the
    remainder is built with subtract/multiply/divide, Arrow has no
    mod kernel).  Returns (pool_ds, bench_table)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    bt = pq.read_table(path, columns=[id_col, text_col])
    brem = pc.subtract(bt[id_col], pc.multiply(
        pc.divide(bt[id_col], bench_mod), bench_mod))
    bench = bt.filter(pc.equal(brem, 0))

    def drop_bench(t: pa.Table) -> pa.Table:
        rem = pc.subtract(t[id_col], pc.multiply(
            pc.divide(t[id_col], bench_mod), bench_mod))
        return t.filter(pc.not_equal(rem, 0))

    return ds.map_batches(drop_bench, batch_format="pyarrow"), bench


def contamination_vs_holdout(sf_dir: str, n: int = 5,
                             bench_mod: int = 20) -> pd.DataFrame:
    """Deterministic split of the documents table: every ``bench_mod``-th
    doc_id is the 'benchmark', the rest the training corpus; report each
    training doc's contaminated n-gram fraction."""
    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"],
                         override_num_blocks=8)
    corpus, bench = holdout_split(
        os.path.join(sf_dir, "documents.parquet"), ds,
        bench_mod=bench_mod)
    out = ngram_contamination(corpus, bench, text_col="text",
                              id_col="doc_id", n=n)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return out[["doc_id", "n_grams", "n_hit", "ratio"]]
