"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk``: exact cosine top-k.  The query matrix is broadcast
  ONCE via ``ray.put``; each ``map_batches`` task computes a numpy matmul
  against its batch and emits only its local top-k candidates (k rows per
  query per batch, not the full score matrix); a final tiny reduce keeps
  the global top-k.  This is the scale pattern: no all-to-all, the only
  driver-side data is (num_queries x k x num_blocks) candidate rows.
- ``LSHIndexedSearch``: random-hyperplane LSH bucketing — each vector is
  signed against H fixed hyperplanes into a bucket id; queries probe their
  own bucket (plus optional multiprobe neighbors at 1-bit flips), turning
  top-k into a per-bucket problem.  Recall < 1 by construction; used as
  the scale path and tested for recall against brute force.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(ds: "ray.data.Dataset", query_vecs: np.ndarray, *,
                     k: int = 10, vec_field: str = "embedding",
                     id_field: str = "vec_id",
                     dtype=np.float32) -> pd.DataFrame:
    """Exact cosine top-k of every query against the dataset.

    Returns DataFrame (qid, rank, vec_id, score), rank 1-based, ties broken
    by ascending id.  ``dtype=np.float32`` is the at-scale default; pass
    float64 when comparing against a double-precision oracle.
    """
    q = _normalize(np.asarray(query_vecs, dtype=dtype))
    q_ref = ray.put(q)

    def partial_topk(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        ids = batch[id_field].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = np.asarray(batch[vec_field].to_pylist(), dtype=qm.dtype)
        if vecs.size == 0:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        sims = _normalize(vecs) @ qm.T                  # (n, Q)
        kk = min(k, ids.size)
        out_q, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            col = sims[:, qi]
            idx = np.argpartition(-col, kk - 1)[:kk]
            order = np.lexsort((ids[idx], -col[idx]))
            sel = idx[order]
            out_q.extend([qi] * sel.size)
            out_id.extend(ids[sel].tolist())
            out_s.extend(col[sel].astype(np.float64).tolist())
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_id, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    partials = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    out = {"qid": [], "rank": [], "vec_id": [], "score": []}
    for qi, g in partials.groupby("qid"):
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        out["qid"].extend([int(qi)] * len(g))
        out["rank"].extend(range(1, len(g) + 1))
        out["vec_id"].extend(g["vec_id"].astype(np.int64))
        out["score"].extend(g["score"])
    return pd.DataFrame(out)


def embedding_near_dup_pairs(ds: "ray.data.Dataset", *, threshold: float = 0.4,
                             vec_field: str = "embedding",
                             id_field: str = "vec_id",
                             dtype=np.float64) -> pd.DataFrame:
    """Exact embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold).

    The normalized matrix is broadcast once (``ray.put``); each batch task
    matmuls its rows against the full matrix and emits only qualifying
    pairs — O(n^2) work split across tasks with O(n·d) broadcast bytes.
    Exact all-pairs is the small/medium path; at 10^8+ vectors switch to
    :class:`LSHIndexedSearch` buckets + within-bucket pairwise (recall<1),
    the standard accuracy/cost trade."""
    import pyarrow.parquet  # noqa: F401  (worker import warm)
    all_df = ds.to_pandas()  # ids + vectors; vectors are the broadcast side
    ids_all = all_df[id_field].to_numpy(dtype=np.int64)
    mat = _normalize(np.asarray(all_df[vec_field].tolist(), dtype=dtype))
    ref = ray.put((ids_all, mat))

    def pairs_of(batch: pa.Table) -> pa.Table:
        ids_a, m = ray.get(ref)
        ids = batch[id_field].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = _normalize(np.asarray(batch[vec_field].to_pylist(), dtype=dtype))
        sims = vecs @ m.T
        out_a, out_b, out_s = [], [], []
        for r in range(ids.size):
            hit = np.flatnonzero((sims[r] >= threshold) & (ids_a > ids[r]))
            out_a.extend([ids[r]] * hit.size)
            out_b.extend(ids_a[hit].tolist())
            out_s.extend(sims[r, hit].tolist())
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})

    out = ds.map_batches(pairs_of, batch_format="pyarrow").to_pandas()
    out["cosine"] = out["cosine"].round(6)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


class IVFIndex:
    """IVF (inverted-file) approximate search: spherical k-means coarse
    quantizer fit once on a sample (driver-side numpy Lloyd's, fixed seed),
    vectors assigned to their nearest centroid in a ``map_batches`` stage,
    queries probing the ``nprobe`` nearest centroid cells.

    The scale path for ANN: assignment is a streaming pass, the centroid
    matrix is tiny and broadcast, and a query touches ~nprobe/n_centroids
    of the corpus.  Recall < 1 by construction; tested against brute force.
    """

    def __init__(self, n_centroids: int = 16, n_iters: int = 15,
                 seed: int = 29):
        self.n_centroids = n_centroids
        self.n_iters = n_iters
        self.seed = seed
        self.centroids: Optional[np.ndarray] = None

    def fit(self, sample: np.ndarray) -> "IVFIndex":
        v = _normalize(np.asarray(sample, dtype=np.float32))
        rng = np.random.default_rng(self.seed)
        idx = rng.choice(v.shape[0], size=min(self.n_centroids, v.shape[0]),
                         replace=False)
        c = v[np.sort(idx)].copy()
        for _ in range(self.n_iters):
            assign = np.argmax(v @ c.T, axis=1)
            for j in range(c.shape[0]):
                members = v[assign == j]
                if members.shape[0]:
                    c[j] = members.mean(axis=0)
            c = _normalize(c)
        self.centroids = c
        return self

    def add_assignments(self, batch: pa.Table, *, vec_field: str = "embedding"
                        ) -> pa.Table:
        vecs = _normalize(np.asarray(batch[vec_field].to_pylist(),
                                     dtype=np.float32))
        cell = np.argmax(vecs @ self.centroids.T, axis=1) if vecs.size else \
            np.empty(0, dtype=np.int64)
        return batch.append_column("ivf_cell",
                                   pa.array(cell.astype(np.int64), pa.int64()))

    def topk(self, ds_with_cells: "ray.data.Dataset", qvec: np.ndarray, *,
             k: int = 10, nprobe: int = 2, vec_field: str = "embedding",
             id_field: str = "vec_id", dtype=np.float32) -> pd.DataFrame:
        q32 = _normalize(np.asarray(qvec, dtype=np.float32)[None, :])[0]
        order = np.argsort(-(self.centroids @ q32))[:nprobe]
        import pyarrow.compute as pc
        probe = pa.array(order.astype(np.int64), pa.int64())
        cand = ds_with_cells.map_batches(
            lambda t: t.filter(pc.is_in(t["ivf_cell"], value_set=probe)),
            batch_format="pyarrow")
        return brute_force_topk(cand, np.asarray(qvec, dtype=dtype)[None, :],
                                k=k, vec_field=vec_field, id_field=id_field,
                                dtype=dtype)


class LSHIndexedSearch:
    """Random-hyperplane LSH bucketing for approximate cosine search."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 13):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim)).astype(np.float32)
        self.n_planes = n_planes

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes.T) > 0
        return (signs.astype(np.uint64) <<
                np.arange(self.n_planes, dtype=np.uint64)).sum(axis=1)

    def add_buckets(self, batch: pa.Table, *, vec_field: str = "embedding"
                    ) -> pa.Table:
        vecs = np.asarray(batch[vec_field].to_pylist(), dtype=np.float32)
        b = self.bucket_of(vecs) if vecs.size else np.empty(0, dtype=np.uint64)
        return batch.append_column("bucket", pa.array(b, pa.uint64()))

    def probe_buckets(self, qvec: np.ndarray, multiprobe: int = 1) -> List[int]:
        base = int(self.bucket_of(qvec[None, :])[0])
        out = [base]
        if multiprobe >= 1:
            out += [base ^ (1 << i) for i in range(self.n_planes)]
        return out

    def topk(self, ds_with_buckets: "ray.data.Dataset", qvec: np.ndarray, *,
             k: int = 10, vec_field: str = "embedding", id_field: str = "vec_id",
             multiprobe: int = 1) -> pd.DataFrame:
        probes = self.probe_buckets(np.asarray(qvec, dtype=np.float32), multiprobe)
        probe_set = pa.array(np.array(probes, dtype=np.uint64), pa.uint64())
        import pyarrow.compute as pc
        cand = ds_with_buckets.map_batches(
            lambda t: t.filter(pc.is_in(t["bucket"], value_set=probe_set)),
            batch_format="pyarrow")
        return brute_force_topk(cand, qvec[None, :], k=k, vec_field=vec_field,
                                id_field=id_field)
