"""Relational demo pipelines over the TPC-H-ish test tables.

The reference has NO relational operators (SURVEY.md §2.6) — these
pipelines exist to exercise the Ray Data groupby / broadcast-join /
window patterns that the index engine is built from, with clean DuckDB
oracles for the driver's correctness gate.
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
from ray.data.aggregate import Count, Mean, Sum


def q1_lineitem_agg(sf_dir: str):
    """TPC-H Q1-style grouped aggregate with a vectorized derived column.
    Pre-aggregation happens inside Ray's hash aggregate; input pruned to
    the 7 needed columns at the read."""
    ds = rd.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                         columns=["l_returnflag", "l_linestatus", "l_quantity",
                                  "l_extendedprice", "l_discount"],
                         override_num_blocks=16)

    def derive(t: pa.Table) -> pa.Table:
        disc_price = pc.multiply(t["l_extendedprice"],
                                 pc.subtract(1.0, t["l_discount"]))
        return t.append_column("disc_price", disc_price)

    ds = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_base_price"),
        Sum("disc_price", alias_name="sum_disc_price"),
        Mean("l_quantity", alias_name="avg_qty"),
        Count(alias_name="count_order"),
    ).to_pandas()
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "avg_qty"):
        out[c] = out[c].round(2)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def join_orders_customer(sf_dir: str):
    """Broadcast hash join: customer (small side) is ``ray.put`` once and
    looked up per batch — no shuffle (SURVEY.md guidance: broadcast small
    sides instead of a shuffle join)."""
    import pyarrow.parquet as pq
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    lookup_ref = ray.put(dict(zip(cust["c_custkey"].to_pylist(),
                                  cust["c_mktsegment"].to_pylist())))

    def attach_segment(t: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        segs = pa.array([lk.get(k) for k in t["o_custkey"].to_pylist()],
                        pa.string())
        return t.append_column("c_mktsegment", segs)

    orders = rd.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                             columns=["o_custkey", "o_totalprice"],
                             override_num_blocks=16)
    out = orders.map_batches(attach_segment, batch_format="pyarrow") \
        .groupby("c_mktsegment").aggregate(
            Sum("o_totalprice", alias_name="total_revenue"),
            Count(alias_name="n_orders")).to_pandas()
    out["total_revenue"] = out["total_revenue"].round(2)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def events_tumbling_window(sf_dir: str):
    """Tumbling 1-hour window aggregate (streaming-shaped workload mapped
    to a groupby on the truncated timestamp; Ray Data has no event-time
    windows, SURVEY.md §2.8)."""
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "event_type", "value"],
                         override_num_blocks=16)

    def add_window(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t["ts"], unit="hour")
        return t.append_column("window_start", w)

    out = ds.map_batches(add_window, batch_format="pyarrow") \
        .groupby(["event_type", "window_start"]).aggregate(
            Count(alias_name="n"),
            Sum("value", alias_name="sum_value")).to_pandas()
    out["sum_value"] = out["sum_value"].round(4)
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


def sessionize_events(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user: a new session starts when the gap from the
    previous event exceeds ``gap_minutes``.  Implemented as
    groupby(user).map_groups over ts-sorted groups (the documented Ray
    mapping for session semantics; ordering assumption: within one user's
    group we sort by (ts, event_id))."""
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_id", "ts"],
                         override_num_blocks=16)
    gap = np.timedelta64(gap_minutes * 60, "s")

    def count_sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy()
        if ts.size == 0:
            return pd.DataFrame({"user_id": [], "n_sessions": []})
        new_session = np.empty(ts.size, dtype=bool)
        new_session[0] = True
        new_session[1:] = (ts[1:] - ts[:-1]) > gap
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "n_sessions": [int(new_session.sum())]})

    out = ds.groupby("user_id").map_groups(count_sessions,
                                           batch_format="pandas").to_pandas()
    out["user_id"] = out["user_id"].astype(np.int64)
    out["n_sessions"] = out["n_sessions"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)
