"""Status-transition history + DIRTY/FORCE external marking (r01 VERDICT
#7; reference ``Status.java:30-183``, ``ScannerImpl.java:614-713``)."""
import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jesterj_ray.index.build_rows import build_index_rows, delta_reindex
from jesterj_ray.index.query import IndexReader
from jesterj_ray.state.manifest import (Manifest, STATUS_DEAD, STATUS_DIRTY,
                                        STATUS_ERROR, STATUS_FORCE,
                                        STATUS_INDEXED, STATUS_SEARCHABLE)


def make_src(tmp_path, n=200):
    rng = np.random.default_rng(4)
    vocab = [f"tok{i}" for i in range(60)]
    texts = [" ".join(rng.choice(vocab, size=20)) for _ in range(n)]
    src = str(tmp_path / "c.parquet")
    pq.write_table(pa.table({"rid": pa.array(range(n), pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   src, row_group_size=64)
    return src


def build(src, out, **kw):
    return build_index_rows(src, out, text_col="text", key_col="rid",
                            tokenizer="simple", docs_per_partition=64,
                            num_shards=2, **kw)


def test_error_error_dead_history(tmp_path):
    """Three failing runs drive ERROR -> ERROR -> DEAD, recorded in the
    append-only history with history-derived attempt counting."""
    src = make_src(tmp_path)
    out = str(tmp_path / "idx")
    for _ in range(3):
        try:
            build(src, out, fail_pids=[1])
        except Exception:
            pass
    man = Manifest(out, "build")
    assert man.read(1)["status"] == STATUS_DEAD
    terminal = [h["status"] for h in man.history(1)
                if h["status"] in (STATUS_ERROR, STATUS_DEAD)]
    assert terminal == [STATUS_ERROR, STATUS_ERROR, STATUS_DEAD]
    attempts = [h["attempt"] for h in man.history(1)
                if h["status"] in (STATUS_ERROR, STATUS_DEAD)]
    assert attempts == [1, 2, 3]
    # healthy partitions carry PROCESSING -> INDEXED -> SEARCHABLE
    h0 = [h["status"] for h in man.history(0)]
    assert h0[0] == "PROCESSING"
    assert STATUS_INDEXED in h0 and h0[-1] == STATUS_SEARCHABLE


def test_dirty_mark_rebuilds_partition(tmp_path):
    """An externally DIRTY-marked partition rebuilds on the next run even
    though its input fingerprint is unchanged; others are untouched."""
    src = make_src(tmp_path)
    out = str(tmp_path / "idx")
    build(src, out)
    man = Manifest(out, "build")
    run0 = sorted(glob.glob(out + "/runs/shard-0000/*.parquet"))
    mtimes = {f: os.stat(f).st_mtime_ns for f in run0}
    man.mark_dirty(2, "external re-feed request")
    assert man.read(2)["status"] == STATUS_DIRTY
    build(src, out)
    man2 = Manifest(out, "build")
    assert man2.read(2)["status"] == STATUS_INDEXED
    assert STATUS_DIRTY in [h["status"] for h in man2.history(2)]
    for f, m in mtimes.items():
        changed = os.stat(f).st_mtime_ns != m
        assert changed == f.endswith("part-00002.parquet"), f
    # index still consistent
    r = IndexReader(out)
    assert r.n_docs == 200


def test_force_mark_refeeds_all_docs_via_delta(tmp_path):
    """FORCE bypasses the content-hash diff: delta_reindex re-feeds every
    doc of the marked partition (old ids tombstoned, new delta docs), and
    queries still score like a fresh rebuild."""
    src = make_src(tmp_path)
    out = str(tmp_path / "idx")
    build(src, out)
    man = Manifest(out, "build")
    man.mark_force(1)
    d = delta_reindex(src, out, text_col="text", key_col="rid",
                      tokenizer="simple", docs_per_partition=64,
                      num_shards=2)
    assert d["reindexed_docs"] == 64      # the whole forced partition
    assert d["tombstoned"] == 64
    assert d["n_docs"] == 200
    assert Manifest(out, "build").read(1)["status"] == STATUS_INDEXED
    # rebuild comparison: identical doc_key -> score maps
    out2 = str(tmp_path / "idx2")
    build(src, out2)
    ra, rb = IndexReader(out), IndexReader(out2)
    for q in ("tok1 tok2", "tok59"):
        ha = {(k, round(s, 9)) for k, s in
              zip(ra.doc_keys(np.array([d_ for d_, _ in ra.topk(q, 10000)],
                                       dtype=np.int64)),
                  [s for _, s in ra.topk(q, 10000)])}
        hb = {(k, round(s, 9)) for k, s in
              zip(rb.doc_keys(np.array([d_ for d_, _ in rb.topk(q, 10000)],
                                       dtype=np.int64)),
                  [s for _, s in rb.topk(q, 10000)])}
        assert ha == hb


def test_expire_history_ttl(tmp_path):
    """FTI record TTL analog (reference: 90 days, JesterJAppender FTI_TTL):
    expire_history drops transitions older than the TTL, keeps fresh
    ones, STAMPS pre-timestamp lines with the file mtime instead of
    dropping them (ADVICE r03 — a dropped recent ERROR would reset
    consecutive_errors retry accounting), and never touches partition
    manifests."""
    import json as _json
    import os
    import time as _time
    from jesterj_ray.state.manifest import Manifest
    man = Manifest(str(tmp_path / "m"), "build")
    man.log(1, "INDEXED")
    man.log(2, "ERROR", message="boom")
    # plant an old and a ts-less line in partition 1's history
    hp = man._hist_path(1)
    with open(hp, "a") as f:
        f.write(_json.dumps({"status": "ERROR", "attempt": 1,
                             "ts": int(_time.time()) - 100 * 86400}) + "\n")
        f.write(_json.dumps({"status": "PROCESSING", "attempt": 0}) + "\n")
    assert len(man.history(1)) == 3
    dropped = man.expire_history()  # default 90-day TTL
    assert dropped == 1  # only the genuinely-old ERROR line
    h1 = man.history(1)
    # the ts-less line survives, stamped with the file mtime
    assert [r["status"] for r in h1] == ["INDEXED", "PROCESSING"]
    assert all("ts" in r for r in h1)
    assert [r["status"] for r in man.history(2)] == ["ERROR"]
    # a fully-expired partition's history file is removed
    os.utime(man._hist_path(2))
    with open(man._hist_path(2), "w") as f:
        f.write(_json.dumps({"status": "ERROR", "ts": 12345}) + "\n")
    assert man.expire_history() == 1
    assert man.history(2) == []
