"""Source scanners — JesterJ's scanner layer on Ray Data sources.

- ``scan_files``: SimpleFileScanner analog (reference
  ``ingest/scanners/SimpleFileScanner.java:72-91`` walk, ``:234-256``
  makeDoc): walk a root, read file bytes, doc id = file URI, standard
  attrs ``modified/accessed/created`` (epoch-millis strings, matching the
  reference's string-typed fields, ``FileScanner.java:23-39``) +
  ``file_size`` + ``doc_raw_size``.  Include filter = glob.  Doc-per-line
  mode handled downstream by ``stages.fields.doc_per_line``.
- ``scan_sql``: JdbcScanner analog (``ingest/scanners/JdbcScanner.java:
  123-170`` scan, ``:213-253`` makeDoc): one SQL statement streamed into
  rows; id = ``<url>/<table>/<pk>``; content column -> ``raw_data``;
  timestamps normalized ISO-8601.  Uses ``ray.data.read_sql`` with a
  DuckDB connection factory (the in-container stand-in for a JDBC pool).
- ``make_children``: Document.makeChild analog (``DocumentImpl.java:
  140-152``): 1->N row expansion with child id ``parent⇛child`` (the
  reference's CHILD_SEP, ``DocumentImpl.java:66``).
- ``add_nonce``: ``addNonce`` analog (``DocumentImpl.java:567-572``) —
  a unique value per row; ours is deterministic (row hash) rather than a
  process-global AtomicLong, because tasks re-execute under Ray retry.
"""

from __future__ import annotations

import fnmatch
import hashlib
import os
from typing import List, Optional, Sequence

import pyarrow as pa

import ray.data

CHILD_SEP = "⇛"  # ⇛  (DocumentImpl.CHILD_SEP)


def scan_files(root: str, *, include_glob: Optional[str] = None,
               override_num_blocks: Optional[int] = None) -> "ray.data.Dataset":
    """Full walk of ``root``; one row per file: doc_id (file:// URI),
    raw_data (bytes), file_size, modified/accessed/created (epoch-millis
    strings), doc_raw_size."""
    paths: List[str] = []
    for dirpath, _, files in os.walk(root):
        for name in sorted(files):
            if include_glob is None or fnmatch.fnmatch(name, include_glob):
                paths.append(os.path.join(dirpath, name))
    paths.sort()
    if not paths:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.string()),
            "raw_data": pa.array([], pa.large_binary()),
            "file_size": pa.array([], pa.int64()),
            "modified": pa.array([], pa.string()),
            "accessed": pa.array([], pa.string()),
            "created": pa.array([], pa.string()),
            "doc_raw_size": pa.array([], pa.int64()),
        }))
    ds = ray.data.read_binary_files(
        paths, include_paths=True,
        **({"override_num_blocks": override_num_blocks}
           if override_num_blocks else {}))

    def attach_attrs(batch: pa.Table) -> pa.Table:
        ids, sizes, mods, accs, crts, raws = [], [], [], [], [], []
        for p, b in zip(batch["path"].to_pylist(),
                        batch["bytes"].to_pylist()):
            st = os.stat(p)
            ids.append("file://" + os.path.abspath(p))
            sizes.append(st.st_size)
            mods.append(str(int(st.st_mtime * 1000)))
            accs.append(str(int(st.st_atime * 1000)))
            crts.append(str(int(st.st_ctime * 1000)))
            raws.append(len(b))
        return pa.table({
            "doc_id": pa.array(ids, pa.string()),
            "raw_data": batch["bytes"].cast(pa.large_binary()),
            "file_size": pa.array(sizes, pa.int64()),
            "modified": pa.array(mods, pa.string()),
            "accessed": pa.array(accs, pa.string()),
            "created": pa.array(crts, pa.string()),
            "doc_raw_size": pa.array(raws, pa.int64()),
        })

    return ds.map_batches(attach_attrs, batch_format="pyarrow")


def scan_sql(sql: str, *, db_path: Optional[str] = None,
             table: str = "", pk_column: str = "",
             content_column: Optional[str] = None,
             parallelism: int = 1) -> "ray.data.Dataset":
    """Run one SQL statement via DuckDB and stream rows into a Dataset.

    doc_id = ``duckdb://<db>/<table>/<pk>``; the content column (if named)
    is renamed ``raw_data`` (cast to large_binary), mirroring
    JdbcScanner's contentColumn -> rawData."""
    import duckdb

    def create_conn():
        return duckdb.connect(db_path) if db_path else duckdb.connect()

    ds = ray.data.read_sql(sql, create_conn,
                           override_num_blocks=parallelism)

    def finish(batch: pa.Table) -> pa.Table:
        if pk_column and pk_column in batch.column_names:
            src = db_path or ":memory:"
            ids = pa.array([f"duckdb://{src}/{table}/{v}"
                            for v in batch[pk_column].to_pylist()], pa.string())
            if "doc_id" in batch.column_names:
                batch = batch.set_column(batch.column_names.index("doc_id"),
                                         "doc_id", ids)
            else:
                batch = batch.append_column("doc_id", ids)
        if content_column and content_column in batch.column_names:
            col = batch[content_column].cast(pa.string()) \
                .cast(pa.large_binary())
            batch = batch.drop_columns([content_column]) \
                         .append_column("raw_data", col)
        return batch

    return ds.map_batches(finish, batch_format="pyarrow")


def make_children(batch: pa.Table, *, parent_id_field: str,
                  items_field: str, child_field: str = "raw_data",
                  keep_cols: Sequence[str] = ()) -> pa.Table:
    """Expand a list column into child docs: one row per element, child id
    = ``<parent>⇛<ordinal>``, parent_id / original_parent_id lineage
    columns (DocumentImpl.makeChild + origination bookkeeping)."""
    import numpy as np
    import pyarrow.compute as pc
    items = batch[items_field]
    arr = items.combine_chunks() if isinstance(items, pa.ChunkedArray) else items
    parent_idx = pc.list_parent_indices(arr)
    flat = pc.list_flatten(arr)
    lengths = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    ordinals = np.concatenate([np.arange(n) for n in lengths]) \
        if lengths.size else np.empty(0, dtype=np.int64)
    parents = pc.take(batch[parent_id_field].cast(pa.string()), parent_idx)
    child_ids = pa.array([f"{p}{CHILD_SEP}{o}" for p, o in
                          zip(parents.to_pylist(), ordinals)], pa.string())
    cols = {c: pc.take(batch[c], parent_idx) for c in keep_cols}
    cols["doc_id"] = child_ids
    cols["parent_id"] = parents
    cols["original_parent_id"] = parents
    cols[child_field] = flat
    return pa.table(cols)


def add_nonce(batch: pa.Table, *, fields: Sequence[str],
              out_field: str = "nonce") -> pa.Table:
    """Deterministic per-row nonce: hash of the named fields.  (The
    reference uses a process-global AtomicLong, DocumentImpl.java:567-572;
    under Ray task retry a counter would double-issue, a content hash
    cannot.)"""
    n = batch.num_rows
    cols = [batch[f].to_pylist() for f in fields]
    vals = [hashlib.blake2b("|".join(str(c[i]) for c in cols).encode(),
                            digest_size=12).hexdigest() for i in range(n)]
    return batch.append_column(out_field, pa.array(vals, pa.string()))
