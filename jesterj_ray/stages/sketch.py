"""Mergeable sketches for unbounded-domain aggregates.

The exact grouped aggregates in ``pipelines/relational`` assume a
bounded domain (value counts, distinct pairs).  At 100 TB with an
unbounded domain the mergeable-sketch shape takes over: each block
reduces to a fixed-size summary inside ``map_batches``, summaries merge
associatively on the driver (or in a tree), and the exchange is
O(#blocks x sketch bytes) regardless of data size.

HyperLogLog here (Flajolet et al. 2007, with the standard small-range
linear-counting correction): 2^p registers, blake2b-hashed values so the
estimate is a DETERMINISTIC function of the input multiset — the same
count at any block split or parallelism, which the tests pin alongside
the error bound (sigma ~ 1.04/sqrt(2^p))."""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np
import pyarrow as pa

import ray


def _hash64(values: Iterable) -> np.ndarray:
    """Deterministic 64-bit hashes (blake2b-8) of the values' bytes."""
    out = np.fromiter(
        (int.from_bytes(hashlib.blake2b(str(v).encode(),
                                        digest_size=8).digest(), "big")
         for v in values), dtype=np.uint64)
    return out


def hll_registers(values, p: int = 12) -> np.ndarray:
    """One block's HLL register array (uint8[2^p]) — vectorized: bucket =
    top p hash bits, rank = leading zeros of the remaining 64-p bits + 1
    (computed with a float64 exponent trick, exact for < 2^53 after the
    shift)."""
    if not 11 <= p <= 18:
        # p >= 11 keeps the 64-p bit remainder under 2^53, so the float
        # exponent trick below is exact; >18 is past useful accuracy
        raise ValueError("p must be in [11, 18]")
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    h = _hash64(values)
    if h.size == 0:
        return regs
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) >> np.uint64(p)  # low 64-p bits
    # rank = (64-p) - floor(log2(rest)) for rest>0, else 64-p+1; log2 via
    # the float exponent is exact for the leading-bit position
    nz = rest > 0
    rank = np.full(h.size, 64 - p + 1, dtype=np.uint8)
    if nz.any():
        # exact: rest < 2^(64-p) <= 2^53, so the float64 conversion is
        # lossless and frexp's exponent is floor(log2(v)) + 1
        bits = np.frexp(rest[nz].astype(np.float64))[1]
        rank[nz] = (64 - p - bits + 1).astype(np.uint8)
    np.maximum.at(regs, bucket, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with linear counting below 2.5m."""
    m = regs.size
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds, col: str, p: int = 12) -> int:
    """Approximate COUNT(DISTINCT col) over a Dataset: per-block register
    arrays (map_batches), elementwise-max merge on the driver.  Exchange:
    #blocks x 2^p bytes.  Deterministic for a given input multiset."""
    def block_regs(t: pa.Table) -> pa.Table:
        regs = hll_registers(t[col].to_pylist(), p=p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(block_regs, batch_format="pyarrow",
                           zero_copy_batch=True)
    merged = np.zeros(1 << p, dtype=np.uint8)
    for t in ray.get(parts.to_arrow_refs()):
        for blob in t["regs"].to_pylist():
            np.maximum(merged, np.frombuffer(blob, dtype=np.uint8),
                       out=merged)
    return int(round(hll_estimate(merged)))


def hll_distinct_grouped(ds, key: str, col: str, p: int = 12):
    """Per-group approximate COUNT(DISTINCT): each block emits one
    (key, registers) row per group it contains, the driver max-merges per
    key.  Exchange: #blocks x |groups-in-block| x 2^p bytes — the
    unbounded-domain sibling of
    ``pipelines.relational.distinct_users_per_type``.  Returns
    {key_value: estimate}."""
    import pandas as pd

    def block_regs(t: pa.Table) -> pa.Table:
        df = t.select([key, col]).to_pandas()
        keys, blobs = [], []
        for k, g in df.groupby(key, sort=False):
            keys.append(k)
            blobs.append(hll_registers(g[col].tolist(), p=p).tobytes())
        return pa.table({key: pa.array(keys),
                         "regs": pa.array(blobs, pa.binary())})

    parts = ds.map_batches(block_regs, batch_format="pyarrow",
                           zero_copy_batch=True)
    merged = {}
    for t in ray.get(parts.to_arrow_refs()):
        for k, blob in zip(t[key].to_pylist(), t["regs"].to_pylist()):
            r = np.frombuffer(blob, dtype=np.uint8)
            if k in merged:
                np.maximum(merged[k], r, out=merged[k])
            else:
                merged[k] = r.copy()
    return {k: int(round(hll_estimate(r))) for k, r in merged.items()}
