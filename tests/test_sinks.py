"""Resumable partitioned sink: crash-resume skips committed partitions,
bytes are parallelism-independent, manifest is the read-back truth."""
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd
from jesterj_ray.stages.sinks import (read_partitioned,
                                      write_partitioned_resumable)
from jesterj_ray.state.manifest import Manifest


def make_ds(n=1000, blocks=7, seed=3):
    rng = np.random.default_rng(seed)
    t = pa.table({"k": pa.array(rng.permutation(n), pa.int64()),
                  "v": pa.array(rng.normal(size=n))})
    return rd.from_arrow(t).repartition(blocks), t


def test_write_read_roundtrip(ray_session, tmp_path):
    ds, t = make_ds()
    out = str(tmp_path / "sink")
    stats = write_partitioned_resumable(ds, out, by="k", num_partitions=8)
    assert stats == {"written": 8, "skipped": 0, "rows": 1000}
    back = read_partitioned(out).to_pandas().sort_values("k")
    want = t.to_pandas().sort_values("k")
    assert back["k"].tolist() == want["k"].tolist()
    assert np.allclose(back["v"].to_numpy(), want["v"].to_numpy())


def test_resume_skips_committed_and_is_deterministic(ray_session,
                                                     tmp_path):
    ds, _ = make_ds()
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_partitioned_resumable(ds, a, by="k", num_partitions=8)
    # simulate a crashed first run at dir b: 3 committed partitions
    # (copied from a), one orphan temp/uncommitted file
    os.makedirs(b)
    man = Manifest(b, "sink")
    import shutil
    for pid in (1, 4, 6):
        shutil.copy2(os.path.join(a, f"part-{pid:05d}.parquet"),
                     os.path.join(b, f"part-{pid:05d}.parquet"))
        man.commit(pid, docs_seen=0)
    with open(os.path.join(b, "part-00002.parquet.tmp.999"), "wb") as f:
        f.write(b"garbage")
    ds2, _ = make_ds(blocks=13)  # different parallelism
    stats = write_partitioned_resumable(ds2, b, by="k", num_partitions=8)
    assert stats["skipped"] == 3 and stats["written"] == 5
    # every non-skipped file is byte-identical to the clean run's
    # (deterministic sort inside each partition)
    for pid in range(8):
        if pid in (1, 4, 6):
            continue
        fa = open(os.path.join(a, f"part-{pid:05d}.parquet"), "rb").read()
        fb = open(os.path.join(b, f"part-{pid:05d}.parquet"), "rb").read()
        assert fa == fb, pid
    # read-back sees only committed partitions, never the orphan temp
    assert len(read_partitioned(b)) == len(read_partitioned(a))


def test_rerun_is_noop(ray_session, tmp_path):
    ds, _ = make_ds(n=200)
    out = str(tmp_path / "s")
    write_partitioned_resumable(ds, out, by="k", num_partitions=4)
    ds2, _ = make_ds(n=200)
    stats = write_partitioned_resumable(ds2, out, by="k",
                                        num_partitions=4)
    assert stats == {"written": 0, "skipped": 4, "rows": 0}


def test_layout_mismatch_refused(ray_session, tmp_path):
    """Resuming with a different num_partitions would prune rows against
    the wrong pid space — refused loudly (r03 review)."""
    ds, _ = make_ds(n=100)
    out = str(tmp_path / "s")
    write_partitioned_resumable(ds, out, by="k", num_partitions=8)
    ds2, _ = make_ds(n=100)
    with pytest.raises(ValueError, match="layout"):
        write_partitioned_resumable(ds2, out, by="k", num_partitions=16)
    with pytest.raises(ValueError, match="layout"):
        write_partitioned_resumable(ds2, out, by="v", num_partitions=8)


def test_null_keys_refused(ray_session, tmp_path):
    t = pa.table({"k": pa.array([1, None, 3], pa.int64()),
                  "v": pa.array([1.0, 2.0, 3.0])})
    with pytest.raises(Exception, match="null"):
        write_partitioned_resumable(rd.from_arrow(t),
                                    str(tmp_path / "s"), by="k")


def test_duplicate_keys_byte_deterministic(ray_session, tmp_path):
    """Repeated keys: rows sort by ALL columns, so file bytes stay
    identical across parallelism/shuffle orders (r03 review — key-only
    sort kept arrival order on ties)."""
    rng = np.random.default_rng(9)
    n = 600
    t = pa.table({"k": pa.array(rng.integers(0, 20, n), pa.int64()),
                  "v": pa.array(rng.normal(size=n)),
                  "w": pa.array(rng.integers(0, 5, n), pa.int64())})
    outs = []
    for blocks in (3, 17):
        d = str(tmp_path / f"s{blocks}")
        write_partitioned_resumable(rd.from_arrow(t).repartition(blocks),
                                    d, by="k", num_partitions=4)
        outs.append({p: open(os.path.join(d, f"part-{p:05d}.parquet"),
                             "rb").read() for p in range(4)})
    assert outs[0] == outs[1]

def test_string_keys_route_and_skewed_ints_spread(ray_session, tmp_path):
    """ADVICE r03: the sink must HASH keys — string keys work, and
    strided integer keys (all ≡ 0 mod num_partitions, which pure
    mod-routing would pile into one partition) spread."""
    t = pa.table({"k": pa.array([f"doc-{i:04d}" for i in range(300)]),
                  "v": pa.array(np.arange(300.0))})
    d = str(tmp_path / "str")
    stats = write_partitioned_resumable(rd.from_arrow(t).repartition(5),
                                        d, by="k", num_partitions=8)
    assert stats["rows"] == 300 and stats["written"] >= 6
    back = read_partitioned(d).to_pandas().sort_values("k")
    assert back["k"].tolist() == sorted(t["k"].to_pylist())

    t2 = pa.table({"k": pa.array(np.arange(0, 1600, 16), pa.int64()),
                   "v": pa.array(np.zeros(100))})
    d2 = str(tmp_path / "stride")
    stats2 = write_partitioned_resumable(rd.from_arrow(t2).repartition(3),
                                         d2, by="k", num_partitions=8)
    # stride-16 keys are all ≡ 0 (mod 8): mod routing -> 1 partition,
    # hash routing -> nearly all of them
    assert stats2["written"] >= 6
    assert len(read_partitioned(d2)) == 100
