"""Exact distributed per-group quantiles — the t-digest family's exact
twin.

Two passes, counts-only exchange (nothing resembling a value sort ever
shuffles):

  1. histogram — each block emits (group, bucket, count) partials,
     where ``bucket`` is the top ``bucket_bits`` of the value's
     ORDER-PRESERVING float-bit key (IEEE doubles map monotonically to
     uint64 via the sign-flip trick, so integer bucket order == value
     order; no global min/max pass needed).  One small
     ``groupby().sum`` over group-x-bucket rows, cumulated per group,
     locates the single bucket holding each requested quantile index.
  2. fetch — a second pruned scan keeps ONLY rows whose (group,
     bucket) is a target bucket (a 2^-bits slice of each group), and
     the exact order statistic is picked by counting inside it.

The selected value is an ELEMENT of the input, bit-identical in any
engine — so the oracle (DuckDB ``quantile_disc``) compares exactly,
no rounding.  Index rule pinned to DuckDB's: 0-based ``ceil(q*n) - 1``
(verified empirically for n=4,5,10 across q).

At 100 TB: pass-1 ships #blocks x |groups| x #occupied-buckets count
rows; pass-2 ships only the target buckets' values (expected
group_size / 2^bits each — raise ``bucket_bits`` until that fits a
worker).  Skew-safe: a constant column collapses to one bucket, and
the fetch then returns that single repeated value, which is the right
answer anyway.
"""

from __future__ import annotations

import math
import os
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Sum


def _order_key(v: np.ndarray) -> np.ndarray:
    """IEEE-754 order-preserving uint64 key (ascending)."""
    b = v.astype(np.float64).view(np.uint64)
    neg = (b >> np.uint64(63)).astype(bool)
    out = b.copy()
    out[neg] = ~b[neg]
    out[~neg] = b[~neg] | np.uint64(1 << 63)
    return out


def group_quantiles(ds: "rd.Dataset", group_col: str, value_col: str,
                    qs: Sequence[float], *, bucket_bits: int = 16
                    ) -> pd.DataFrame:
    """Exact per-group quantile_disc.  Returns (group, q, value)
    sorted by (group, q); NaN values must be pre-filtered (their
    float-bit order is meaningless)."""
    shift = np.uint64(64 - bucket_bits)

    def hist(t: pa.Table) -> pa.Table:
        g = t[group_col].to_pandas()
        v = t[value_col].to_numpy(zero_copy_only=False)
        bk = (_order_key(v) >> shift).astype(np.int64)
        d = pd.DataFrame({"g": g, "b": bk})
        c = d.groupby(["g", "b"], sort=False).size().reset_index(name="c")
        return pa.table({"g": pa.array(c["g"]),
                         "b": pa.array(c["b"], pa.int64()),
                         "c": pa.array(c["c"], pa.int64())})

    empty = pd.DataFrame({"group": pd.Series([], dtype=object),
                          "q": pd.Series([], dtype=np.float64),
                          "value": pd.Series([], dtype=np.float64)})
    # empty-input guard BEFORE the groupby: a fully-empty dataset's
    # blocks never run hist, so they carry no 'g'/'b' schema to key on
    # (the groupby would KeyError); one count() pass is the price
    if ds.count() == 0:
        return empty
    counts = ds.map_batches(hist, batch_format="pyarrow") \
        .groupby(["g", "b"]).aggregate(Sum("c", alias_name="c")) \
        .to_pandas().sort_values(["g", "b"])
    if counts.empty:
        return empty

    # per group: total n, target 0-based index per q, owning bucket,
    # and the index WITHIN that bucket
    targets = {}                  # (group, bucket) -> [(q, idx_in_bucket)]
    for g, gc in counts.groupby("g", sort=False):
        n = int(gc["c"].sum())
        cum = gc["c"].cumsum().to_numpy()
        bks = gc["b"].to_numpy()
        for q in qs:
            idx = max(0, math.ceil(q * n) - 1)      # DuckDB quantile_disc
            bi = int(np.searchsorted(cum, idx + 1))
            prev = int(cum[bi - 1]) if bi else 0
            targets.setdefault((g, int(bks[bi])), []).append(
                (q, idx - prev))
    t_ref = ray.put(pd.MultiIndex.from_tuples(list(targets)))

    def fetch(t: pa.Table) -> pa.Table:
        want = ray.get(t_ref)
        g = t[group_col].to_pandas().to_numpy()
        v = t[value_col].to_numpy(zero_copy_only=False)
        bk = (_order_key(v) >> shift).astype(np.int64)
        keep = pd.MultiIndex.from_arrays([g, bk]).isin(want)
        return pa.table({"g": pa.array(g[keep]),
                         "b": pa.array(bk[keep], pa.int64()),
                         "v": pa.array(v[keep], pa.float64())})

    vals = ds.map_batches(fetch, batch_format="pyarrow").to_pandas()
    rows = []
    for (g, b), wants in targets.items():
        bucket_vals = np.sort(vals.loc[(vals["g"] == g)
                                       & (vals["b"] == b), "v"].to_numpy())
        for q, j in wants:
            rows.append((g, q, float(bucket_vals[j])))
    out = pd.DataFrame(rows, columns=["group", "q", "value"])
    return out.sort_values(["group", "q"]).reset_index(drop=True)


def events_value_quantiles(sf_dir: str,
                           qs: Sequence[float] = (0.25, 0.5, 0.9, 0.99)
                           ) -> pd.DataFrame:
    """Per-event_type exact quantile_disc of ``value``."""
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["event_type", "value"],
                         override_num_blocks=8)
    out = group_quantiles(ds, "event_type", "value", qs)
    return out.rename(columns={"group": "event_type"})
