"""Serving repartition: split one global index into N self-contained
doc-range slice indexes.

The mask-based :class:`..serving._SlicedReader` decodes GLOBAL posting
lists and filters them per query — correct for exhaustive topk but wasted
decode, and the pruned / phrase / positions paths cannot be slice-masked
at all (r01 ADVICE).  This module does the split ONCE at rest instead:
each (term, chunk) posting list is decoded, partitioned by
``pid % n_slices``, and re-encoded into a per-slice segment set that keeps
the GLOBAL df/cf columns and global stats.json — so a plain
:class:`..query.IndexReader` opened on a slice dir scores its docs exactly
like the global reader (BM25 weights are corpus-wide) while decoding ONLY
its own postings, with the FULL feature set (block-max pruning, phrase,
positions).  One Ray task per (shard, slice); no shuffle — tasks read only
their shard's segment file.

At 10^12 docs this is the serving deployment step: slices sized to a
node, each node opens its slice dir, a fan-out service merges k-lists
(``ShardedQueryService(slice_dirs=...)``).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..state.manifest import atomic_write_bytes
from .build import DOC_BITS, SEG_ROW_GROUP_ROWS, _segment_schema
from .codec import BLOCK_SIZE, varbyte_decode, varbyte_encode, varbyte_lengths
from .epoch import publish_epoch


def _encode_rows(term, chunk, df, cf, docs, tfs, pos_deltas, has_pos):
    """Re-encode one slice's postings for one (term, chunk) into a
    segment-row dict (same block metadata scheme as the build).

    n == 0 emits a metadata-only row: the reader reconstructs a term's
    GLOBAL df by summing its chunk rows' df, so every slice must carry a
    row for EVERY source chunk (a slice holding no docs of some chunk
    would otherwise under-count df for multi-chunk hot terms and
    mis-weight BM25)."""
    n = docs.size
    if n == 0:
        row = {"term": term, "chunk": chunk, "df": df, "cf": cf,
               "count": 0, "doc_blob": b"", "tf_blob": b"",
               "block_last": [], "block_max_tf": [], "block_counts": [],
               "block_doc_off": [0], "block_tf_off": [0]}
        if has_pos:
            row["pos_blob"] = b""
        return row
    deltas = np.empty_like(docs)
    deltas[0] = docs[0]
    np.subtract(docs[1:], docs[:-1], out=deltas[1:])
    nb = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    bounds = np.minimum(np.arange(1, nb + 1) * BLOCK_SIZE, n)
    obounds = np.concatenate([[0], bounds])
    dlen = np.concatenate([[0], np.cumsum(
        varbyte_lengths(deltas.astype(np.uint64)))])
    tlen = np.concatenate([[0], np.cumsum(
        varbyte_lengths(tfs.astype(np.uint64)))])
    row = {
        "term": term, "chunk": chunk, "df": df, "cf": cf, "count": n,
        "doc_blob": varbyte_encode(deltas.astype(np.uint64)),
        "tf_blob": varbyte_encode(tfs.astype(np.uint64)),
        "block_last": docs[bounds - 1].tolist(),
        "block_max_tf": np.maximum.reduceat(
            tfs, np.arange(0, n, BLOCK_SIZE)).tolist(),
        "block_counts": np.diff(obounds).tolist(),
        "block_doc_off": dlen[obounds].tolist(),
        "block_tf_off": tlen[obounds].tolist(),
    }
    if has_pos:
        row["pos_blob"] = varbyte_encode(pos_deltas.astype(np.uint64))
    return row


REPART_FLUSH_ROWS = 1024  # per-slice buffered rows before a writer flush


def _plan_slices(docs_dir: str, n_slices: int) -> Dict[int, int]:
    """pid -> slice assignment balanced by DOC COUNT (r02 VERDICT #8:
    ``pid % n_slices`` skews when partition sizes vary).  Greedy
    largest-first into the lightest slice — deterministic (ties by pid),
    planned from parquet METADATA only (no data read), max/min slice load
    <= ~1 + largest_partition/avg_slice."""
    counts: Dict[int, int] = {}
    for name in sorted(os.listdir(docs_dir)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(docs_dir, name)).metadata
        if md.num_rows == 0:
            continue
        counts[int(name.split("-")[1].split(".")[0])] = md.num_rows
    loads = [0] * n_slices
    assign: Dict[int, int] = {}
    for pid, c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0])):
        s = min(range(n_slices), key=lambda i: (loads[i], i))
        assign[pid] = s
        loads[s] += c
    return assign


def _slice_lookup(assign: Dict[int, int]):
    """Vectorized pid-array -> slice-array mapper over the (small,
    broadcastable) assignment dict."""
    keys = np.array(sorted(assign), dtype=np.int64)
    vals = np.array([assign[k] for k in keys], dtype=np.int64)

    def lookup(pids: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(keys, pids)
        bad = (idx >= keys.size) | \
            (keys[np.minimum(idx, keys.size - 1)] != pids)
        if bad.any():
            missing = np.unique(pids[bad])
            raise KeyError(f"postings reference pids with no doc table: "
                           f"{missing[:5].tolist()}")
        return vals[idx]

    return lookup


def _split_shard(index_dir: str, out_root: str, shard: int,
                 n_slices: int, assign: Dict[int, int]) -> Dict:
    """Split one shard's segment file into n_slices per-slice segment
    files (df/cf stay GLOBAL).  Streams: reads one row-group slab at a
    time and flushes each slice's rows to an incremental parquet writer,
    so task memory is bounded regardless of shard size."""
    import uuid

    path = os.path.join(index_dir, "segments", f"shard-{shard:04d}.parquet")
    if not os.path.exists(path):
        return {"shard": shard, "rows": 0}
    pf = pq.ParquetFile(path)
    has_pos = "pos_blob" in pf.schema_arrow.names
    schema = _segment_schema(has_pos)
    outs: List[Dict[str, list]] = [
        {name: [] for name in schema.names} for _ in range(n_slices)]
    writers: List = [None] * n_slices
    finals: List[str] = []
    tmps: List[str] = []
    for s in range(n_slices):
        seg_dir = os.path.join(out_root, f"slice-{s:03d}", "segments")
        os.makedirs(seg_dir, exist_ok=True)
        finals.append(os.path.join(seg_dir, f"shard-{shard:04d}.parquet"))
        tmps.append(os.path.join(
            seg_dir, f".tmp-{uuid.uuid4().hex[:8]}.parquet"))

    def flush(s: int, force: bool = False):
        if not outs[s]["term"] and (writers[s] or not force):
            return
        if writers[s] is None:
            writers[s] = pq.ParquetWriter(tmps[s], schema)
        t = pa.table({nm: pa.array(outs[s][nm], schema.field(nm).type)
                      for nm in schema.names})
        writers[s].write_table(t, row_group_size=SEG_ROW_GROUP_ROWS)
        for nm in schema.names:
            outs[s][nm].clear()

    lookup = _slice_lookup(assign)
    total = 0
    for batch in pf.iter_batches(batch_size=256):
        rows = batch.to_pylist()
        for r in rows:
            n = r["count"]
            docs = np.cumsum(varbyte_decode(r["doc_blob"], n)
                             .astype(np.int64))
            tfs = varbyte_decode(r["tf_blob"], n).astype(np.int64)
            if has_pos:
                npos = int(tfs.sum())
                pos = varbyte_decode(r["pos_blob"], npos).astype(np.int64)
                starts = np.cumsum(tfs) - tfs
            sl = lookup(docs >> DOC_BITS)
            for s in range(n_slices):
                m = sl == s
                if has_pos and m.any():
                    # gather each kept doc's contiguous delta run (deltas
                    # restart per doc, so runs concatenate verbatim)
                    keep_idx = np.flatnonzero(m)
                    lens = tfs[keep_idx]
                    tot = int(lens.sum())
                    cum = np.cumsum(lens) - lens
                    flat = np.arange(tot, dtype=np.int64) - \
                        np.repeat(cum, lens) + np.repeat(starts[keep_idx],
                                                         lens)
                    pd_slice = pos[flat]
                else:
                    pd_slice = None
                row = _encode_rows(r["term"], r["chunk"], r["df"], r["cf"],
                                   docs[m], tfs[m], pd_slice, has_pos)
                for k, v in row.items():
                    outs[s][k].append(v)
                total += 1
                if len(outs[s]["term"]) >= REPART_FLUSH_ROWS:
                    flush(s)
    for s in range(n_slices):
        flush(s, force=True)
        if writers[s] is not None:
            writers[s].close()
        os.replace(tmps[s], finals[s])
    return {"shard": shard, "rows": total}


def repartition_for_serving(index_dir: str, out_root: str, *,
                            n_slices: int = 4) -> List[str]:
    """Split ``index_dir`` into ``n_slices`` self-contained slice indexes
    under ``out_root/slice-XXX``; returns the slice dirs.  Each slice is
    a fully-featured index over its doc range whose df/cf/stats are
    GLOBAL, so per-slice scores equal the global reader's exactly."""
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    if stats.get("exact_stats"):
        # an exact-stats (delta-built) index computes alive-only n/avgdl/df
        # over the WHOLE corpus at query time; a slice reader would compute
        # them over its slice and silently mis-weight.  Compact first.
        raise ValueError(
            "cannot repartition an exact_stats (delta-built) index: run a "
            "full rebuild to compact tombstones, then repartition")
    # _split_shard reads only the base shard files; generation segments
    # would be silently dropped.  Today every gen-producing path also sets
    # exact_stats (refused above), but that is a cross-module coupling —
    # guard locally so a future gen-producing path cannot lose postings
    # (ADVICE r02).
    import glob as _glob
    gens = _glob.glob(os.path.join(index_dir, "segments", "*-gen-*.parquet"))
    if gens:
        raise ValueError(
            f"cannot repartition an index with generation segments "
            f"({len(gens)} found): run a full rebuild to compact first")
    num_shards = stats["num_shards"]

    # doc tables + tombstones per slice, routed by the doc-count-balanced
    # pid -> slice plan (r02 VERDICT #8)
    docs_dir = os.path.join(index_dir, "docs")
    assign = _plan_slices(docs_dir, n_slices)
    slice_tombs: List[List[int]] = [[] for _ in range(n_slices)]
    tomb_path = os.path.join(index_dir, "tombstones.json")
    if os.path.exists(tomb_path):
        with open(tomb_path) as f:
            for did in json.load(f).get("doc_ids", []):
                pid = int(did) >> DOC_BITS
                if pid not in assign:
                    # stale tombstone of a dropped/empty partition: no
                    # postings reference it, nothing to mask (mirrors
                    # compact_index's stale-tombstone handling; ADVICE r03)
                    continue
                slice_tombs[assign[pid]].append(did)
    for s in range(n_slices):
        sdir = os.path.join(out_root, f"slice-{s:03d}")
        os.makedirs(os.path.join(sdir, "docs"), exist_ok=True)
        atomic_write_bytes(
            os.path.join(sdir, "stats.json"),
            json.dumps(stats | {"slice_id": s,
                                "n_slices": n_slices}).encode())
        if slice_tombs[s]:
            atomic_write_bytes(
                os.path.join(sdir, "tombstones.json"),
                json.dumps({"doc_ids": sorted(slice_tombs[s])}).encode())
    for name in sorted(os.listdir(docs_dir)):
        if not name.endswith(".parquet"):
            continue
        pid = int(name.split("-")[1].split(".")[0])
        if pid not in assign:
            continue  # empty doc table: no postings reference it
        shutil.copy2(os.path.join(docs_dir, name),
                     os.path.join(out_root, f"slice-{assign[pid]:03d}",
                                  "docs", name))

    # segment split: one Ray task per shard (reads only its shard file)
    tasks = ray.data.from_items(
        [{"shard": sh} for sh in range(num_shards)],
        override_num_blocks=num_shards)

    def split(batch: pd.DataFrame) -> pd.DataFrame:
        pa.set_cpu_count(1)
        return pd.DataFrame([
            _split_shard(index_dir, out_root, int(sh), n_slices, assign)
            for sh in batch["shard"]])

    tasks.map_batches(split, batch_format="pandas",
                      batch_size=1).materialize()
    slices = [os.path.join(out_root, f"slice-{s:03d}")
              for s in range(n_slices)]
    for sdir in slices:
        publish_epoch(sdir)
    return slices


def repartition_bm25f_for_serving(field_dirs, out_root: str, *,
                                  n_slices: int = 4):
    """Split every field index of a BM25F family into aligned serving
    slices: ``repartition_for_serving`` per field under
    ``out_root/<field>``.  The pid -> slice plan derives only from
    per-pid DOC COUNTS (identical across fields — same corpus, same
    doc_key partitioning), so slice s of every field covers the same
    doc range; ``BM25FReader``'s doc-space guard re-verifies that at
    open, so a divergence is an error, never a wrong score.

    Returns a list over slices of {field: slice_dir}."""
    per_field = {f: repartition_for_serving(d, os.path.join(out_root, f),
                                            n_slices=n_slices)
                 for f, d in field_dirs.items()}
    return [{f: per_field[f][s] for f in field_dirs}
            for s in range(n_slices)]
