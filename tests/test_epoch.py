"""Epoch manifests (index/epoch.py): atomic point-in-time reader views.

Writers publish epoch.json LAST; readers pin its file list at open —
post-epoch generations are invisible (consistent old view through a
whole delta cycle), replaced pinned files raise IndexChangedError."""
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jesterj_ray.index.build_rows import build_index_rows, delta_reindex
from jesterj_ray.index.epoch import (IndexChangedError, publish_epoch,
                                     read_epoch)
from jesterj_ray.index.query import IndexReader


def _docs(n=200, seed=3):
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "omega"] + \
        [f"w{i}" for i in range(60)]
    texts = [" ".join(rng.choice(vocab, size=int(L)))
             for L in rng.integers(5, 40, size=n)]
    return pd.DataFrame({"rid": np.arange(n, dtype=np.int64),
                         "text": texts})


def _write(df, path):
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path,
                   row_group_size=64)


KW = dict(text_col="text", key_col="rid", tokenizer="simple",
          docs_per_partition=64, num_shards=2)


def test_epoch_published_bumped_and_stable(tmp_path):
    df = _docs()
    src = str(tmp_path / "c.parquet")
    _write(df, src)
    out = str(tmp_path / "idx")
    build_index_rows(src, out, **KW)
    e1 = read_epoch(out)
    assert e1 is not None and e1["epoch"] == 1
    assert "stats.json" in e1["files"]
    assert any(r.startswith("segments/") for r in e1["files"])
    assert any(r.startswith("docs/") for r in e1["files"])
    # unchanged resume: epoch id stays stable
    build_index_rows(src, out, **KW)
    assert read_epoch(out)["epoch"] == 1
    # a delta cycle publishes a new epoch
    df.loc[5, "text"] = "changed omega alpha"
    _write(df, src)
    delta_reindex(src, out, **KW)
    e2 = read_epoch(out)
    assert e2["epoch"] == 2
    assert any("-gen-" in r for r in e2["files"])


def test_reader_pins_epoch_across_delta_cycle(tmp_path):
    """A reader opened before a delta cycle serves the OLD epoch for its
    whole lifetime: the cycle's generation segments, tombstone rewrite
    and stats rewrite are invisible (no torn view), while a reader opened
    after the publish sees the new state."""
    df = _docs()
    src = str(tmp_path / "c.parquet")
    _write(df, src)
    out = str(tmp_path / "idx")
    build_index_rows(src, out, **KW)
    old = IndexReader(out)
    before = old.topk("omega", 50)
    df.loc[7, "text"] = "omega omega omega omega"
    _write(df, src)
    delta_reindex(src, out, **KW)
    # old reader: identical pre-delta results (gen files + new tombstones
    # exist on disk but are outside its pinned epoch)
    assert old.topk("omega", 50) == before
    new = IndexReader(out)
    assert new.topk("omega", 50) != before
    assert new._epoch["epoch"] == old._epoch["epoch"] + 1


def test_reader_detects_replaced_pinned_file(tmp_path):
    """A concurrent full re-merge os.replace()s base segments; a reader
    still on the old epoch must fail HONESTLY (IndexChangedError) on its
    next cold shard load instead of silently mixing views — and a fresh
    reader works once the writer publishes."""
    from jesterj_ray.index.build import merge_runs
    df = _docs()
    src = str(tmp_path / "c.parquet")
    _write(df, src)
    out = str(tmp_path / "idx")
    build_index_rows(src, out, **KW)
    old = IndexReader(out)  # no queries yet: shard loads are lazy
    # simulate a mid-flight writer: re-merge (different chunking) without
    # publishing yet
    for f in os.listdir(os.path.join(out, "manifest", "merge")):
        os.unlink(os.path.join(out, "manifest", "merge", f))
    merge_runs(out, 2, chunk_target=50)
    with pytest.raises(IndexChangedError):
        old.topk("omega", 10)
    publish_epoch(out)
    fresh = IndexReader(out)
    assert fresh.topk("omega", 10)


def test_reader_without_epoch_keeps_listing_behavior(tmp_path):
    """Pre-epoch layouts (no epoch.json) keep the directory-listing
    behavior: the reader works and applies whatever files exist."""
    df = _docs()
    src = str(tmp_path / "c.parquet")
    _write(df, src)
    out = str(tmp_path / "idx")
    build_index_rows(src, out, **KW)
    with_epoch = IndexReader(out).topk("omega", 20)
    os.unlink(os.path.join(out, "epoch.json"))
    r = IndexReader(out)
    assert r._epoch is None
    assert r.topk("omega", 20) == with_epoch


def test_compaction_vs_pinned_reader(tmp_path):
    """The epoch docstring's compaction claim: a reader pinned to the
    pre-compaction epoch either keeps serving (already-loaded state) or
    fails HONESTLY with IndexChangedError on a cold file load — never a
    raw FileNotFoundError, never a silently mixed view — and a reader
    opened after compaction serves the compacted index."""
    from jesterj_ray.index.compact import compact_index
    from jesterj_ray.index.query import delete_docs
    df = _docs(300)
    src = str(tmp_path / "c.parquet")
    _write(df, src)
    out = str(tmp_path / "idx")
    build_index_rows(src, out, **KW)
    warm = IndexReader(out)
    warm_hits = warm.topk("omega", 20)     # shard 'omega' now cached
    cold = IndexReader(out)                # no shard loads yet
    victims = warm.doc_keys(
        np.array([h[0] for h in warm_hits[:3]], dtype=np.int64))
    assert delete_docs(out, victims) == 3
    assert compact_index(out)["compacted_partitions"] > 0
    # cold reader: pinned files were replaced -> honest error on use
    with pytest.raises(IndexChangedError):
        cold.topk("omega", 20)
    # fresh reader: compacted view, victims gone
    fresh = IndexReader(out)
    fresh_keys = fresh.doc_keys(np.array(
        [h[0] for h in fresh.topk("omega", 50)], dtype=np.int64))
    assert not set(victims) & set(fresh_keys)
    assert read_epoch(out)["epoch"] > warm._epoch["epoch"]
