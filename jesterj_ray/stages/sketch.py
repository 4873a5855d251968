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
        if t.num_rows == 0 or t.num_columns == 0:
            continue  # empty pass-through block (fn not invoked)
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
        if t.num_rows == 0 or t.num_columns == 0:
            continue  # empty pass-through block (fn not invoked)
        for k, blob in zip(t[key].to_pylist(), t["regs"].to_pylist()):
            r = np.frombuffer(blob, dtype=np.uint8)
            if k in merged:
                np.maximum(merged[k], r, out=merged[k])
            else:
                merged[k] = r.copy()
    return {k: int(round(hll_estimate(r))) for k, r in merged.items()}


class TDigest:
    """Merging t-digest (Dunning's merge variant, k1 scale function):
    bounded-size mergeable quantile summary for UNBOUNDED float domains —
    the approximate sibling of the exact counting-sort
    ``pipelines.relational.grouped_quantiles`` (which needs a bounded
    integer domain).  Accuracy concentrates at the tails (the k1 scale
    allots centroid capacity ~ sqrt(q(1-q))).

    Distributed shape: one digest per block inside ``map_batches``
    (a few KB each), associative centroid merges driver- or tree-side.
    NOTE: unlike HLL, the result is NOT block-split invariant (centroid
    boundaries depend on merge order); tests pin rank-error bounds, not
    equality."""

    def __init__(self, delta: int = 100):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.int64)

    @staticmethod
    def _k1(q: float, delta: int) -> float:
        import math
        return delta / (2 * math.pi) * math.asin(
            2 * min(1.0, max(0.0, q)) - 1)

    def _compress(self, means: np.ndarray, weights: np.ndarray):
        order = np.argsort(means, kind="mergesort")
        means, weights = means[order], weights[order]
        total = int(weights.sum())
        out_m, out_w = [], []
        cur_m, cur_w = means[0], int(weights[0])
        w_before = 0  # weight strictly before the current centroid
        for m, w in zip(means[1:].tolist(), weights[1:].tolist()):
            q0 = w_before / total
            q2 = (w_before + cur_w + w) / total
            if self._k1(q2, self.delta) - self._k1(q0, self.delta) <= 1.0:
                # merge keeps the weighted mean; centroids stay sorted
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += int(w)
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_before += cur_w
                cur_m, cur_w = m, int(w)
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.array(out_m, dtype=np.float64)
        self.weights = np.array(out_w, dtype=np.int64)

    def add(self, values: np.ndarray):
        values = np.asarray(values, dtype=np.float64)
        if values.size == 0:
            return self
        self._compress(np.concatenate([self.means, values]),
                       np.concatenate([self.weights,
                                       np.ones(values.size, np.int64)]))
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if other.means.size:
            self._compress(np.concatenate([self.means, other.means]),
                           np.concatenate([self.weights, other.weights]))
        return self

    def quantile(self, q: float) -> float:
        """Interpolated quantile: centroid i covers the weight interval
        centred at cum_i (midpoint rule); linear between midpoints,
        clamped to the extreme means at the tails."""
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * total
        return float(np.interp(target, cum, self.means))

    def to_bytes(self) -> bytes:
        return self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, delta: int = 100) -> "TDigest":
        d = cls(delta)
        n = len(blob) // 16
        d.means = np.frombuffer(blob[:8 * n], dtype=np.float64).copy()
        d.weights = np.frombuffer(blob[8 * n:], dtype=np.int64).copy()
        return d


def tdigest_quantiles(ds, col: str, qs, delta: int = 100):
    """Approximate quantiles of a float column: per-block digests
    (map_batches, ~KBs each), driver merge, interpolated estimates."""
    def block_digest(t: pa.Table) -> pa.Table:
        d = TDigest(delta).add(t[col].to_numpy(zero_copy_only=False))
        return pa.table({"digest": pa.array([d.to_bytes()], pa.binary())})

    parts = ds.map_batches(block_digest, batch_format="pyarrow",
                           zero_copy_batch=True)
    merged = TDigest(delta)
    for t in ray.get(parts.to_arrow_refs()):
        if t.num_rows == 0 or t.num_columns == 0:
            continue  # empty pass-through block (fn not invoked)
        for blob in t["digest"].to_pylist():
            merged.merge(TDigest.from_bytes(blob, delta))
    return [merged.quantile(q) for q in qs]


# ---- Misra-Gries heavy hitters ----

def mg_summary(values, k: int) -> dict:
    """One block's Misra-Gries summary (<= k counters): every item with
    true frequency > n/(k+1) is guaranteed a counter; counts
    underestimate by at most the summary's ``decrement`` total.
    Vectorized per block: exact value counts first (np.unique), then
    the MG reduction applies to the COUNTED distincts."""
    import pandas as pd
    arr = np.asarray(list(values), dtype=object)
    if arr.size == 0:
        return {"counts": {}, "dec": 0, "n": 0}
    codes, uniq = pd.factorize(arr, sort=False)
    # pd.factorize maps null values (None/NaN) to code -1, which would
    # crash np.bincount; count them explicitly as the None item so a
    # null-heavy column still surfaces nulls as a heavy hitter
    null_cnt = int((codes < 0).sum())
    if null_cnt:
        codes = codes[codes >= 0]
    uniq = list(uniq.tolist())
    cnt = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
    if null_cnt:
        uniq.append(None)
        cnt = np.append(cnt, np.int64(null_cnt))
    if len(uniq) <= k:
        return {"counts": dict(zip(uniq, cnt.tolist())),
                "dec": 0, "n": int(arr.size)}
    # keep top-k by (count, value) and charge the k+1-th count as the
    # uniform decrement (the batched form of MG's repeated decrements);
    # ties break in NATIVE value order (None last) — str(v) order would
    # silently flip which of two tied numerics survives ('10' < '9');
    # columns are homogeneously typed so native comparison is total
    skey = np.empty(len(uniq), dtype=object)
    skey[:] = [(v is None, v) for v in uniq]
    order = np.lexsort((skey, -cnt))
    thresh = int(cnt[order[k]])
    kept = order[:k]
    counts = {uniq[i]: int(cnt[i]) - thresh for i in kept
              if int(cnt[i]) > thresh}
    return {"counts": counts, "dec": thresh, "n": int(arr.size)}


def mg_merge(a: dict, b: dict, k: int) -> dict:
    """Associative MG merge (Agarwal et al. 2013: merged summaries keep
    the n/(k+1) guarantee): add counters, then reduce back to k by
    subtracting the (k+1)-largest merged count."""
    counts: dict = dict(a["counts"])
    for v, c in b["counts"].items():
        counts[v] = counts.get(v, 0) + c
    dec = a["dec"] + b["dec"]
    if len(counts) > k:
        vals = sorted(counts.values(), reverse=True)
        thresh = vals[k]
        counts = {v: c - thresh for v, c in counts.items()
                  if c > thresh}
        dec += thresh
    return {"counts": counts, "dec": dec, "n": a["n"] + b["n"]}


def heavy_hitters(ds, col: str, k: int = 16, phi: float = 0.01):
    """Items with frequency >= phi*n (plus count bounds): per-block MG
    summaries merge associatively — the exchange is O(blocks x k),
    never vocabulary-sized.  Returns a pandas frame (value, count_lo,
    count_hi) for candidates whose UPPER bound clears phi*n; MG
    guarantees no true phi-heavy item is missed when k >= 1/phi."""
    import pandas as pd
    if k < int(1.0 / phi):
        raise ValueError("need k >= 1/phi for the no-miss guarantee")
    val_type = ds.schema().base_schema.field(col).type

    def block(t: pa.Table) -> pa.Table:
        # one row per block: typed counter values (never JSON dict keys,
        # which would stringify ints and cannot hold nulls)
        s = mg_summary(t[col].to_pylist(), k)
        vals = list(s["counts"].keys())
        return pa.table({
            "values": pa.array([vals], pa.list_(val_type)),
            "counts": pa.array([[int(c) for c in s["counts"].values()]],
                               pa.list_(pa.int64())),
            "dec": pa.array([s["dec"]], pa.int64()),
            "n": pa.array([s["n"]], pa.int64())})

    acc = {"counts": {}, "dec": 0, "n": 0}
    parts = ds.map_batches(block, batch_format="pyarrow",
                           zero_copy_batch=True)
    for t in ray.get(parts.to_arrow_refs()):
        if t.num_rows == 0 or t.num_columns == 0:
            continue  # empty pass-through block (fn not invoked)
        for i in range(t.num_rows):
            s = {"counts": dict(zip(t["values"][i].as_py(),
                                    t["counts"][i].as_py())),
                 "dec": t["dec"][i].as_py(), "n": t["n"][i].as_py()}
            acc = mg_merge(acc, s, k)
    n = acc["n"]
    rows = [(v, int(c), int(c) + acc["dec"])
            for v, c in acc["counts"].items()
            if int(c) + acc["dec"] >= phi * n]
    rows.sort(key=lambda r: (-r[2], r[0] is None,
                             0 if r[0] is None else r[0]))
    arr = pa.array([r[0] for r in rows], val_type)
    # int64 + nulls would degrade to float64 in pandas and corrupt
    # values >= 2^53 (the CLAUDE.md int64-with-nulls trap): keep exact
    # Python ints as objects when both conditions hold
    if pa.types.is_integer(val_type) and arr.null_count:
        value_series = arr.to_pandas(integer_object_nulls=True)
    else:
        value_series = arr.to_pandas()
    out = pd.DataFrame({
        "value": value_series,
        "count_lo": pd.Series([r[1] for r in rows], dtype=np.int64),
        "count_hi": pd.Series([r[2] for r in rows], dtype=np.int64)})
    return out


# ---- mergeable Bloom filter ----

class BloomFilter:
    """Mergeable Bloom filter (bitwise-OR union) — the bounded-memory
    seenPreviously set for corpus-scale change detection: m bits,
    h double-hashed probes per item (Kirsch-Mitzenmacher), false
    positives only, never false negatives.  Vectorized add/contains."""

    def __init__(self, m_bits: int = 1 << 20, h: int = 7,
                 bits: np.ndarray = None):
        if m_bits & (m_bits - 1):
            raise ValueError("m_bits must be a power of two")
        self.m = m_bits
        self.h = h
        self.bits = bits if bits is not None else \
            np.zeros(m_bits // 8, dtype=np.uint8)

    def _positions(self, values) -> np.ndarray:
        hv = _hash64(values)
        h1 = hv & np.uint64(self.m - 1)
        h2 = ((hv >> np.uint64(32)) | np.uint64(1)) & np.uint64(self.m - 1)
        i = np.arange(self.h, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :])
                & np.uint64(self.m - 1)).ravel()

    def add(self, values) -> None:
        pos = self._positions(values)
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))

    def contains(self, values) -> np.ndarray:
        vals = list(values)
        if not vals:
            return np.zeros(0, dtype=bool)
        pos = self._positions(vals)
        hit = (self.bits[(pos >> np.uint64(3)).astype(np.int64)]
               >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return hit.reshape(self.h, len(vals)).all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m, self.h) != (other.m, other.h):
            raise ValueError("bloom params must match to merge")
        return BloomFilter(self.m, self.h, self.bits | other.bits)


def heavy_hitter_terms(sf_dir: str, phi: float = 0.02, k: int = 64):
    """EXACT phi-heavy tokens over the documents token stream, at
    sketch-shaped cost: pass 1 folds per-block Misra-Gries summaries
    (O(blocks x k) exchange; no phi-heavy item can be missed with
    k >= 1/phi), pass 2 broadcasts the candidate set and sums exact
    per-block counts for candidates only — so the result equals the
    full GROUP BY the SQL oracle runs, while the engine never
    exchanges vocabulary-sized state."""
    import json as _json
    import os

    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    if k < int(1.0 / phi):
        # same no-miss precondition heavy_hitters enforces: with
        # k < 1/phi the MG candidate pass can drop a true phi-heavy
        # term and the "EXACT" promise above silently breaks
        raise ValueError("need k >= 1/phi for the no-miss guarantee")

    def read():
        return rd.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["text"], override_num_blocks=8)

    def block_summary(t: pa.Table) -> pa.Table:
        lists = pc.split_pattern_regex(
            pc.utf8_lower(t["text"].combine_chunks()
                          if isinstance(t["text"], pa.ChunkedArray)
                          else t["text"]), pattern="[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        toks = flat.filter(pc.not_equal(flat, "")).to_pylist()
        return pa.table({"summary": pa.array(
            [_json.dumps(mg_summary(toks, k))], pa.string())})

    acc = {"counts": {}, "dec": 0, "n": 0}
    for r in read().map_batches(block_summary,
                                batch_format="pyarrow").take_all():
        acc = mg_merge(acc, _json.loads(r["summary"]), k)
    n = acc["n"]
    cand = sorted(v for v, c in acc["counts"].items()
                  if c + acc["dec"] >= phi * n)
    if not cand:
        return pd.DataFrame({"term": pd.Series([], dtype=object),
                             "n_occ": pd.Series([], dtype=np.int64)})
    cand_ref = ray.put(pa.array(cand, pa.string()))

    def exact_counts(t: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        lists = pc.split_pattern_regex(
            pc.utf8_lower(t["text"].combine_chunks()
                          if isinstance(t["text"], pa.ChunkedArray)
                          else t["text"]), pattern="[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        flat = flat.filter(pc.is_in(flat, value_set=cands))
        idx = pc.index_in(flat, value_set=cands)
        cnt = np.bincount(idx.to_numpy(zero_copy_only=False),
                          minlength=len(cands)) if len(flat) else \
            np.zeros(len(cands), dtype=np.int64)
        return pa.table({"term": cands,
                         "c_part": pa.array(cnt.astype(np.int64),
                                            pa.int64())})

    parts = read().map_batches(exact_counts,
                               batch_format="pyarrow").to_pandas()
    tot = parts.groupby("term", sort=True)["c_part"].sum().reset_index()
    out = tot[tot["c_part"] >= phi * n].rename(
        columns={"c_part": "n_occ"})
    out["n_occ"] = out["n_occ"].astype(np.int64)
    return out.sort_values("term").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): point-frequency
# estimates over an unbounded domain in W x D counters.  Per block ONE
# (D, W) partial table (np.add.at over the D row hashes), merged by
# elementwise SUM (the mergeable-sketch shape — exchange is
# O(#blocks x W x D) ints regardless of data size); query = min over
# the D rows, an OVERESTIMATE never an under (the CM guarantee:
# err <= e/W * N with prob 1 - e^-D).  Hashes derive from the same
# blake2b row seeds at build and query time, so estimates are a
# deterministic function of the input multiset (block-split
# independent, like HLL).


def cm_rows(values, w: int = 1024, d: int = 4) -> np.ndarray:
    """One block's (d, w) partial counter table."""
    t = np.zeros((d, w), dtype=np.int64)
    if not len(values):
        return t
    h = _hash64(values)
    for r in range(d):
        # row r's hash: mix with an odd per-row constant (blake2b of
        # the row id) — independent-enough rows, no per-value rehash
        seed = int.from_bytes(hashlib.blake2b(
            str(r).encode(), digest_size=8).digest(), "big") | 1
        idx = ((h * np.uint64(seed)) >> np.uint64(40)) % np.uint64(w)
        np.add.at(t[r], idx.astype(np.int64), 1)
    return t


def cm_fold(rows, w: int, d: int) -> np.ndarray:
    """Sum per-block flat-bytes partials (rows with a 'flat' binary
    field) into one (d, w) table — THE fold, shared by every CM entry
    point so dtype/shape/endianness changes happen once."""
    table = np.zeros((d, w), dtype=np.int64)
    for row in rows:
        table += np.frombuffer(row["flat"],
                               dtype=np.int64).reshape(d, w)
    return table


def cm_query(table: np.ndarray, values) -> np.ndarray:
    """Point estimates (int64) for ``values`` — min over the d rows."""
    d, w = table.shape
    h = _hash64(values)
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(d):
        seed = int.from_bytes(hashlib.blake2b(
            str(r).encode(), digest_size=8).digest(), "big") | 1
        idx = ((h * np.uint64(seed)) >> np.uint64(40)) % np.uint64(w)
        est = np.minimum(est, table[r, idx.astype(np.int64)])
    return est


def cm_count_column(ds, col: str, query_values, *, w: int = 1024,
                    d: int = 4):
    """Distributed CM build over ``ds[col]`` + point queries.  Returns
    (value, est) pandas frame; the table is the SUM of per-block
    partials (one groupby-free driver fold of #blocks tiny arrays)."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        vals = [v for v in t[col].to_pylist() if v is not None]
        tab = cm_rows(vals, w=w, d=d)
        return pa.table({"flat": pa.array([tab.ravel().tobytes()],
                                          pa.binary())})

    table = cm_fold(ds.map_batches(partial, batch_format="pyarrow")
                    .take_all(), w, d)
    est = cm_query(table, query_values)
    return pd.DataFrame({"value": [str(v) for v in query_values],
                         "est": est.astype(np.int64)})
