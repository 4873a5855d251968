"""HyperLogLog sketch: error bound, merge associativity, determinism."""
import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd
from jesterj_ray.stages.sketch import (hll_distinct, hll_estimate,
                                       hll_registers)


def test_hll_error_bound():
    """Estimate within ~3 sigma (sigma = 1.04/sqrt(2^p)) of the truth,
    plus the documented ~2.5% bias allowance in the valley just above the
    linear-counting cutoff (2.5m-8m; classic HLL bias that HLL++'s
    empirical tables correct — we keep plain HLL and document it)."""
    m = 1 << 12
    sigma = 1.04 / np.sqrt(m)
    for true_n in (50, 1000, 20_000, 200_000):
        vals = [f"user-{i}" for i in range(true_n)]
        est = hll_estimate(hll_registers(vals, p=12))
        bias = 0.025 * true_n if 2.5 * m < true_n < 8 * m else 0
        assert abs(est - true_n) <= 3 * sigma * true_n + bias + 2, true_n


def test_hll_merge_equals_single_pass():
    """max-merge of split register arrays == one pass over the union, for
    ANY split — the mergeability the distributed path relies on — and
    duplicates across splits never inflate the sketch."""
    vals = [f"u{i}" for i in range(5000)]
    whole = hll_registers(vals, p=12)
    for cut in (1, 777, 2500, 4999):
        a = hll_registers(vals[:cut] + vals[:100], p=12)  # overlap dups
        b = hll_registers(vals[cut:] + vals[:100], p=12)
        assert np.array_equal(np.maximum(a, b), whole)


def test_hll_distinct_dataset_matches_local(ray_session):
    """The Dataset path (per-block registers, driver max-merge) returns
    EXACTLY the local single-pass estimate at any block count
    (deterministic hashing ⇒ parallelism-independent result)."""
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 3000, 10_000)  # duplicates across blocks
    local = int(round(hll_estimate(hll_registers(vals.tolist(), p=12))))
    for blocks in (1, 7, 32):
        t = pa.table({"v": pa.array(vals, pa.int64())})
        ds = rd.from_arrow(t).repartition(blocks)
        assert hll_distinct(ds, "v", p=12) == local
    truth = len(np.unique(vals))
    assert abs(local - truth) <= 0.05 * truth


def test_hll_p_bounds():
    with pytest.raises(ValueError):
        hll_registers(["x"], p=10)


def test_hll_grouped_tracks_exact(ray_session):
    """Grouped sketch vs the exact grouped distinct on the events table:
    small per-group cardinalities sit in the linear-counting range, so
    estimates land within 5% of truth — and the result is block-split
    independent."""
    import os
    from jesterj_ray.pipelines.relational import distinct_users_per_type
    from jesterj_ray.stages.sketch import hll_distinct_grouped
    sf = "/root/testdata/sf0.001"
    edf = distinct_users_per_type(sf)
    exact = dict(zip(edf["event_type"], edf["n_users"]))
    ds = rd.read_parquet(os.path.join(sf, "events.parquet"),
                         columns=["event_type", "user_id"],
                         override_num_blocks=4)
    est = hll_distinct_grouped(ds, "event_type", "user_id")
    assert set(est) == set(exact)
    for k, v in est.items():
        assert abs(v - int(exact[k])) <= max(2, 0.05 * int(exact[k])), k
    ds2 = rd.read_parquet(os.path.join(sf, "events.parquet"),
                          columns=["event_type", "user_id"],
                          override_num_blocks=13)
    assert hll_distinct_grouped(ds2, "event_type", "user_id") == est


def test_tdigest_rank_error():
    """Estimated quantiles land within 1.5% rank error at delta=100 on
    50k normals (t-digest accuracy concentrates at the tails — pin the
    tails tighter than the middle)."""
    from jesterj_ray.stages.sketch import TDigest
    rng = np.random.default_rng(11)
    vals = rng.normal(size=50_000)
    d = TDigest(100)
    for chunk in np.array_split(vals, 10):
        d.add(chunk)
    sv = np.sort(vals)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = d.quantile(q)
        rank = np.searchsorted(sv, est) / sv.size
        tol = 0.005 if q in (0.01, 0.99) else 0.015
        assert abs(rank - q) <= tol, (q, rank)
    # digest stays bounded
    assert d.means.size < 200


def test_tdigest_distributed_matches_bounds(ray_session):
    """Dataset path (per-block digests + driver merge) obeys the same
    rank-error bound, and serde round-trips exactly."""
    from jesterj_ray.stages.sketch import TDigest, tdigest_quantiles
    rng = np.random.default_rng(17)
    vals = rng.exponential(scale=3.0, size=30_000)  # skewed
    t = pa.table({"v": pa.array(vals, pa.float64())})
    ds = rd.from_arrow(t).repartition(16)
    ests = tdigest_quantiles(ds, "v", [0.1, 0.5, 0.9, 0.99])
    sv = np.sort(vals)
    for q, est in zip([0.1, 0.5, 0.9, 0.99], ests):
        rank = np.searchsorted(sv, est) / sv.size
        assert abs(rank - q) <= 0.02, (q, rank)
    d = TDigest(100).add(vals[:100])
    rt = TDigest.from_bytes(d.to_bytes())
    assert np.array_equal(rt.means, d.means)
    assert np.array_equal(rt.weights, d.weights)


def test_ngram_contamination_planted(ray_session):
    """Planted leaks: a verbatim copy scores ratio 1.0, a half-overlap
    doc scores the exact expected fraction, disjoint text scores 0, and
    docs shorter than n tokens are omitted."""
    from jesterj_ray.stages.decontam import ngram_contamination
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            bench_text,                                   # full copy
            bench_text + " one two three four five",      # partial
            "one two three four five six seven eight",    # disjoint
            "too short",                                  # < n tokens
        ], pa.string())})
    bench = pa.table({"id": pa.array([99], pa.int64()),
                      "text": pa.array([bench_text], pa.string())})
    out = ngram_contamination(rd.from_arrow(corpus), rd.from_arrow(bench),
                              text_col="text", id_col="id", n=5)
    assert out["id"].tolist() == [1, 2, 3]  # doc 4 omitted
    r = dict(zip(out["id"], out["ratio"]))
    assert r[1] == 1.0
    # doc 2: 13 tokens -> 9 distinct 5-grams, 4 of them inside bench_text
    assert r[2] == round(4 / 9, 6)
    assert r[3] == 0.0


def test_contamination_half_away_rounding(ray_session):
    """ratio rounds half-AWAY-from-zero like SQL round(): a doc with 128
    distinct grams and 1 hit must report 0.007813, not banker's
    0.007812 (r03 review — real oracle hash flip)."""
    from jesterj_ray.stages.decontam import ngram_contamination
    # 132 tokens -> 128 distinct 5-grams (all unique words)
    words = [f"w{i:03d}" for i in range(132)]
    bench_text = " ".join(words[:5])  # exactly the doc's first 5-gram
    corpus = pa.table({"id": pa.array([1], pa.int64()),
                       "text": pa.array([" ".join(words)], pa.string())})
    bench = pa.table({"id": pa.array([9], pa.int64()),
                      "text": pa.array([bench_text], pa.string())})
    out = ngram_contamination(rd.from_arrow(corpus), bench,
                              text_col="text", id_col="id", n=5)
    assert out["n_grams"].tolist() == [128]
    assert out["n_hit"].tolist() == [1]
    assert out["ratio"].tolist() == [0.007813]


def test_misra_gries_no_miss_and_bounds():
    """MG guarantee: at any block split, every item with true frequency
    > n/(k+1) keeps a counter, and lo <= true <= lo + dec."""
    import numpy as np

    from jesterj_ray.stages.sketch import mg_merge, mg_summary
    rng = np.random.default_rng(0)
    data = ["hot"] * 500 + ["warm"] * 200 + \
        [f"c{i}" for i in rng.integers(0, 400, 2000)]
    rng.shuffle(data)
    k = 20
    for nb in (1, 3, 16, 64):
        acc = {"counts": {}, "dec": 0, "n": 0}
        for ch in np.array_split(np.asarray(data, dtype=object), nb):
            acc = mg_merge(acc, mg_summary(ch, k), k)
        assert acc["n"] == len(data)
        assert len(acc["counts"]) <= k
        for item, true in (("hot", 500), ("warm", 200)):
            lo = acc["counts"].get(item, 0)
            assert true > acc["n"] / (k + 1)    # phi-heavy premise
            assert lo > 0                        # no-miss
            assert lo <= true <= lo + acc["dec"]


def test_bloom_filter_membership_and_merge():
    import numpy as np

    from jesterj_ray.stages.sketch import BloomFilter
    bf = BloomFilter(1 << 16, 7)
    keys = [f"k{i}" for i in range(5000)]
    bf.add(keys)
    assert bf.contains(keys).all()               # never false negative
    fp = bf.contains([f"x{i}" for i in range(20000)]).mean()
    assert fp < 0.02                             # ~0.2% at this load
    other = BloomFilter(1 << 16, 7)
    other.add(["only-in-other"])
    merged = bf.merge(other)
    assert merged.contains(["only-in-other", "k123"]).all()
    with pytest.raises(ValueError):
        bf.merge(BloomFilter(1 << 15, 7))
    assert bf.contains([]).size == 0


def test_heavy_hitters_dataset_entrypoint(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from jesterj_ray.stages.sketch import heavy_hitters
    rng = np.random.default_rng(1)
    vals = ["big"] * 400 + ["mid"] * 120 + \
        [f"t{i}" for i in rng.integers(0, 300, 1500)]
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.string())}))
    ds = ds.repartition(6)
    out = heavy_hitters(ds, "v", k=32, phi=0.05)
    assert "big" in set(out["value"])            # 400/2020 ~ 20%
    assert "mid" in set(out["value"])            # ~6%
    for _, r in out.iterrows():
        true = vals.count(r["value"])
        assert r["count_lo"] <= true <= r["count_hi"]
    with pytest.raises(ValueError, match="1/phi"):
        heavy_hitters(ds, "v", k=4, phi=0.05)
