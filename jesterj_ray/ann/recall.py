"""ANN quality instrumentation: recall@k of every approximate tier
against the exact list, over a fixed multi-query set.

Each approximate path (LSH buckets, IVF with a partial probe, sharded
HNSW, PQ/ADC) answers the same queries as ``brute_force_topk``; recall
= |approx top-k ∩ exact top-k| / k, reported per method with the raw
hit counts (integers — the ratio rounds with the floor form per the
pinned rationals rule).  Inherently non-SQL (the approximate answers
are what's being measured), so this is a rows-only query; pytest pins
per-method floors.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import ray.data as rd

N_QUERIES = 8
K = 10


def _topsets(df: pd.DataFrame, k: int) -> dict:
    out = {}
    for qi, g in df.groupby("qid"):
        out[int(qi)] = set(g.nsmallest(k, "rank")["vec_id"].astype(int))
    return out


def ann_recall_report(sf_dir: str, *, k: int = K,
                      n_queries: int = N_QUERIES) -> pd.DataFrame:
    """(method, hits, total, recall) sorted by method."""
    import pyarrow.parquet as pq

    from .hnsw import build_hnsw, hnsw_topk
    from .knn import IVFIndex, LSHIndexedSearch, brute_force_topk
    from .pq import encode_pq, pq_topk, train_pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.read_table(path, columns=["vec_id", "embedding"]) \
        .to_pandas().sort_values("vec_id")
    qvecs = np.asarray(head["embedding"].head(n_queries).tolist(),
                       dtype=np.float64)

    ds = rd.read_parquet(path, columns=["vec_id", "embedding"],
                         override_num_blocks=8).materialize()
    exact = _topsets(brute_force_topk(ds, qvecs, k=k,
                                      dtype=np.float64), k)

    approx: dict = {}
    # LSH: per-query bucket probe (1-bit multiprobe)
    lsh = LSHIndexedSearch(dim=qvecs.shape[1], n_planes=10)
    lds = ds.map_batches(lsh.add_buckets,
                         batch_format="pyarrow").materialize()
    for mp in (1, 2):
        frames = []
        for qi in range(n_queries):
            f = lsh.topk(lds, qvecs[qi], k=k, multiprobe=mp)
            f["qid"] = qi
            frames.append(f)
        approx[f"lsh_mp{mp}"] = _topsets(pd.concat(frames), k)
    # IVF at nprobe=2 of 8 (the genuinely-approximate setting)
    sample = np.asarray(head["embedding"].head(256).tolist(),
                        dtype=np.float32)
    ivf = IVFIndex(n_centroids=8).fit(sample)
    ids = ds.map_batches(ivf.add_assignments,
                         batch_format="pyarrow").materialize()
    frames = []
    for qi in range(n_queries):
        f = ivf.topk(ids, qvecs[qi], k=k, nprobe=2, dtype=np.float64)
        f["qid"] = qi
        frames.append(f)
    approx["ivf_nprobe2"] = _topsets(pd.concat(frames), k)
    # sharded HNSW
    g = build_hnsw(ds, num_shards=4)
    approx["hnsw"] = _topsets(hnsw_topk(g, qvecs, k=k, ef_search=64), k)
    # PQ/ADC
    books = train_pq(ds, m=8, k=16)
    codes = encode_pq(ds, books)
    approx["pq_adc"] = _topsets(pq_topk(codes, books, qvecs, k=k), k)

    rows = []
    for method in sorted(approx):
        hits = sum(len(approx[method].get(qi, set()) & exact[qi])
                   for qi in exact)
        total = k * len(exact)
        rows.append((method, hits, total,
                     float(np.floor(hits / total * 1e6 + 0.5) / 1e6)))
    return pd.DataFrame(rows, columns=["method", "hits", "total",
                                       "recall"])
