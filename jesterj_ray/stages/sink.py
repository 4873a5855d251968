"""Resumable partitioned Parquet sink — the general-purpose output
shape the index build already uses internally (state/manifest.py),
exposed as a standalone Dataset op.

One output FILE per key-range partition, written task-side via temp +
``os.replace`` with the manifest row committed LAST (the repo's
durability invariant) — so a failed or killed run re-invoked with
``resume=True`` skips every completed partition and rewrites only the
missing ones, and a reader never sees a torn file.  At 100 TB this is
the difference between re-running a day of output and re-running one
partition.

Partitioning is BY KEY RANGE over a sortable int64 column (pid =
key // rows_per_part against the GLOBAL min — input-derived, so the
same rows land in the same file at any parallelism; the docID rule
applied to output layout).  Each partition's rows are sorted by key
inside the file, making the output directory a deterministic function
of the input alone — byte-stable across resumes and CPU counts.

Reference analog: JesterJ's FTI re-feed marks per-scanner-batch status
rows (jj_output_step_status) so a restart does not resend; here the
manifest plays that role for bulk parquet output.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..state.manifest import Manifest, atomic_write_table


def write_partitioned_parquet(ds: "rd.Dataset", out_dir: str, *,
                              key_col: str,
                              rows_per_part: int = 1 << 20,
                              resume: bool = True,
                              fail_pids: Optional[List[int]] = None
                              ) -> dict:
    """Write ``ds`` as part-<pid>.parquet files keyed by
    ``key_col`` range.  Returns {n_rows, n_parts, skipped} —
    ``skipped`` counts partitions resumed from a prior run.
    ``fail_pids`` (tests only) raises inside those partitions' write
    tasks to exercise the resume path."""
    os.makedirs(out_dir, exist_ok=True)
    man = Manifest(out_dir, "sink")
    done = set(man.completed_partitions()) if resume else set()

    lo = ds.min(key_col)

    def add_pid(t: pa.Table) -> pa.Table:
        k = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pid = (k - lo) // rows_per_part
        return t.append_column("__pid", pa.array(pid, pa.int64()))

    keyed = ds.map_batches(add_pid, batch_format="pyarrow")

    def write_part(g: pa.Table) -> pa.Table:
        # ARROW end to end: a pandas group would degrade
        # int64-with-nulls value columns to float64 (corrupting ids
        # >= 2^53) — the exact hazard a durability sink must not have
        pid = int(g["__pid"][0].as_py())
        if pid in done:
            return pa.table({"pid": pa.array([pid], pa.int64()),
                             "rows": pa.array([g.num_rows], pa.int64()),
                             "skipped": pa.array([True])})
        if fail_pids and pid in fail_pids:
            raise RuntimeError(f"injected failure in partition {pid}")
        order = pc.sort_indices(g[key_col])
        t = g.take(order).drop_columns("__pid")
        atomic_write_table(
            os.path.join(out_dir, f"part-{pid:05d}.parquet"), t)
        man.commit(pid, docs_seen=g.num_rows,
                   output_files=[f"part-{pid:05d}.parquet"])
        return pa.table({"pid": pa.array([pid], pa.int64()),
                         "rows": pa.array([g.num_rows], pa.int64()),
                         "skipped": pa.array([False])})

    stats = keyed.groupby("__pid").map_groups(
        write_part, batch_format="pyarrow").to_pandas()
    return {"n_rows": int(stats["rows"].sum()),
            "n_parts": int(len(stats)),
            "skipped": int(stats["skipped"].sum())}


def read_partitioned(out_dir: str) -> "rd.Dataset":
    """Read back the data files only (the manifest's jsonl state lives
    under the same root)."""
    import glob
    return rd.read_parquet(sorted(glob.glob(
        os.path.join(out_dir, "part-*.parquet"))))
