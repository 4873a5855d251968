"""Resumable partitioned parquet sink.

The output discipline every index writer in this repo follows (temp +
``os.replace``, manifest row commits LAST — reference: JesterJ's FTI
checkpointing, ``ScannerImpl.java:453-502``), packaged as a GENERIC
Dataset sink: rows route to a deterministic partition, each partition
writes exactly one file from one task, and a rerun after a crash skips
committed partitions BEFORE any shuffle or write work happens — never
one giant output file, never a re-write of finished work.

At 100 TB this is the difference between "retry the 3 partitions that
died" and "rerun the job": the manifest prune happens map-side on the
partition column, so completed partitions' rows drop out of the
pipeline at the first operator.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..state.manifest import Manifest, atomic_write_bytes, atomic_write_table


def _hash_route(col: "pa.ChunkedArray", num_partitions: int) -> "np.ndarray":
    """Deterministic vectorized key -> partition routing.

    Integers: splitmix64 finalizer over the raw 64-bit pattern — pure
    numpy, run- and parallelism-independent, spreads clustered /
    strided / negative keys.  Strings/binary: the pandas fixed-key
    64-bit siphash (``pd.util.hash_array``, key is a pandas constant —
    deterministic across processes, unlike Python's salted hash())."""
    typ = col.type
    if pa.types.is_integer(typ):
        v = col.cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            v = (v ^ (v >> 30)) * np.uint64(0xBF58476D1CE4E5B9)
            v = (v ^ (v >> 27)) * np.uint64(0x94D049BB133111EB)
            v ^= v >> 31
        return (v % np.uint64(num_partitions)).astype(np.int64)
    if pa.types.is_string(typ) or pa.types.is_large_string(typ) or \
            pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        vals = np.asarray(col.to_pylist(), dtype=object)
        h = pd.util.hash_array(vals, categorize=False)
        return (h % np.uint64(num_partitions)).astype(np.int64)
    raise TypeError(
        f"unsupported partition-key type {typ} — integer or "
        "string/binary keys only")


def write_partitioned_resumable(ds: "rd.Dataset", out_dir: str, *,
                                by: str, num_partitions: int = 64
                                ) -> Dict:
    """Write ``ds`` as ``out_dir/part-XXXXX.parquet`` partitioned by
    ``hash(by) % num_partitions`` with per-partition crash-safe commits.
    The hash is a REAL mix (splitmix64 for integer keys, the pandas
    fixed-key 64-bit hash for string keys — both deterministic across
    runs and parallelism), so clustered / strided / negative integer
    keys and string keys all spread uniformly (ADVICE r03: the old
    ``cast % num_partitions`` mod-routed integers and failed on
    strings); the routing scheme is recorded in ``layout.json`` and a
    resume against a dir written under a different scheme refuses.

    - Committed partitions (from a previous run) are PRUNED map-side
      before the shuffle — their rows never move.
    - Each partition's task sorts its rows by ALL columns, ``by`` first
      (deterministic file bytes at any parallelism even when keys
      repeat), writes temp + ``os.replace``, then commits the manifest
      row LAST.
    - The partition layout (``by``, ``num_partitions``) is recorded in
      ``layout.json`` on the first run; a resume with a DIFFERENT
      layout raises instead of silently pruning rows against the wrong
      pid space.
    - Null ``by`` values raise up front (a null routes nowhere
      deterministically).
    - Returns {written, skipped, rows}.
    """
    man = Manifest(out_dir, "sink")
    done = set(man.completed_partitions())
    layout = {"by": by, "num_partitions": num_partitions,
              "routing": "hash-v1"}
    layout_path = os.path.join(out_dir, "layout.json")
    if os.path.exists(layout_path):
        import json
        with open(layout_path) as f:
            prev = json.load(f)
        if prev != layout:
            raise ValueError(
                f"resume layout mismatch: dir was written with {prev}, "
                f"got {layout} — pruning committed pids against a "
                "different layout would silently drop rows")
    else:
        import json
        os.makedirs(out_dir, exist_ok=True)
        atomic_write_bytes(layout_path, json.dumps(layout).encode())

    def tag_and_prune(t: pa.Table) -> pa.Table:
        col = t[by]
        if col.null_count:
            raise ValueError(f"null values in partition column {by!r}")
        t = t.append_column(
            "__pid", pa.array(_hash_route(col, num_partitions), pa.int64()))
        if done:
            t = t.filter(pc.invert(pc.is_in(
                t["__pid"], value_set=pa.array(sorted(done), pa.int64()))))
        return t

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"pid": [], "rows": []})
        pid = int(g["__pid"].iloc[0])
        g = g.drop(columns="__pid")
        # sort by EVERY column (key first): ties on the key would
        # otherwise keep shuffle-arrival order and break byte identity
        g = g.sort_values([by] + [c for c in g.columns if c != by],
                          kind="mergesort")
        path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
        os.makedirs(out_dir, exist_ok=True)
        nbytes = atomic_write_table(
            path, pa.Table.from_pandas(g, preserve_index=False))
        man2 = Manifest(out_dir, "sink")
        man2.commit(pid, docs_seen=len(g), bytes_written=nbytes,
                    output_files=[os.path.basename(path)])
        return pd.DataFrame({"pid": [pid], "rows": [len(g)]})

    tagged = ds.map_batches(tag_and_prune, batch_format="pyarrow",
                            zero_copy_batch=True)
    out = tagged.groupby("__pid").map_groups(
        write_group, batch_format="pandas").to_pandas()
    return {"written": int(len(out)), "skipped": len(done),
            "rows": int(out["rows"].sum()) if len(out) else 0}


def read_partitioned(out_dir: str) -> pa.Table:
    """Read back every COMMITTED partition (uncommitted stragglers from
    a crashed run are invisible — the manifest is the source of truth,
    not the directory listing)."""
    man = Manifest(out_dir, "sink")
    parts = []
    for pid in sorted(man.completed_partitions()):
        parts.append(pq.read_table(
            os.path.join(out_dir, f"part-{pid:05d}.parquet")))
    return pa.concat_tables(parts) if parts else pa.table({})
