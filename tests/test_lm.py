"""Bigram-LM perplexity stage (stages/lm.py): scalar-reference parity,
OOV scoring, empty docs, parallelism independence, min_count pruning."""
import math

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data as rd

from jesterj_ray.stages.lm import (ALPHA, BigramLM, PerplexityScorer,
                                   train_bigram_lm)
from jesterj_ray.tokenize.tokenizer import simple_tokenize


def _scalar_reference(docs):
    """Row-at-a-time reimplementation of the frozen model."""
    toks = {d: simple_tokenize(t) for d, t in docs}
    ug, bgc = {}, {}
    for tl in toks.values():
        for w in tl:
            ug[w] = ug.get(w, 0) + 1
        for a, b in zip(tl, tl[1:]):
            bgc[(a, b)] = bgc.get((a, b), 0) + 1
    T, V, a = sum(ug.values()), len(ug), ALPHA
    out = {}
    for d, tl in toks.items():
        if not tl:
            continue
        lp = math.log((ug.get(tl[0], 0) + a) / (T + a * V))
        for w1, w2 in zip(tl, tl[1:]):
            lp += math.log((bgc.get((w1, w2), 0) + a)
                           / (ug.get(w1, 0) + a * V))
        out[d] = (len(tl), lp / len(tl))
    return out


DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat ate the cat food"),
    (2, "dogs bark at the moon and the moon ignores dogs"),
    (3, ""),                       # no tokens -> dropped
    (4, "zebra"),                  # single token: unigram term only
    (5, "the the the the"),        # heavy repetition -> low ppl
]


def _run(docs, num_blocks, **scorer_kw):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    })).repartition(num_blocks)
    lm = train_bigram_lm(ds, field="text")
    scored = ds.map_batches(
        PerplexityScorer, batch_format="pyarrow",
        fn_constructor_kwargs={"model_ref": ray.put(lm), **scorer_kw},
        concurrency=2).sort("doc_id")
    return lm, scored.to_pandas()


def test_scalar_parity(ray_session):
    ref = _scalar_reference(DOCS)
    _, out = _run(DOCS, 3)
    assert list(out["doc_id"]) == sorted(ref)      # empty doc dropped
    for _, r in out.iterrows():
        n, avg = ref[r["doc_id"]]
        assert r["n_tokens"] == n
        assert r["avg_logprob"] == pytest.approx(round(avg, 6), abs=2e-6)
        assert r["ppl"] == pytest.approx(round(math.exp(-avg), 6),
                                         rel=1e-6)
    # repetition must score more likely than average prose
    byid = out.set_index("doc_id")
    assert byid.loc[5, "ppl"] < byid.loc[2, "ppl"]


def test_parallelism_independence(ray_session):
    _, a = _run(DOCS, 1)
    _, b = _run(DOCS, 6)
    assert a.equals(b)


def test_oov_scoring(ray_session):
    lm, _ = _run(DOCS, 2)
    new = pa.table({"doc_id": pa.array([99], pa.int64()),
                    "text": pa.array(["qqqq wwww"], pa.string())})
    out = PerplexityScorer(lm)(new)
    a, T, V = ALPHA, lm.T, lm.V
    exp = (math.log(a / (T + a * V)) + math.log(a / (0 + a * V))) / 2
    assert out["avg_logprob"][0].as_py() == pytest.approx(
        round(exp, 6), abs=2e-6)


def test_min_count_prunes_bigrams_only(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(DOCS))), pa.int64()),
        "text": pa.array([t for _, t in DOCS], pa.string())}))
    full = train_bigram_lm(ds, field="text")
    pruned = train_bigram_lm(ds, field="text", min_count=2)
    assert pruned.T == full.T and pruned.V == full.V
    assert len(pruned.bg_index) < len(full.bg_index)
    assert np.all(pruned.bcounts >= 2)
    # every surviving bigram keeps its exact count
    for k, c in zip(pruned.bg_index, pruned.bcounts):
        i = full.bg_index.get_loc(k)
        assert full.bcounts[i] == c


def test_pipeline_smoke_sorted(ray_session):
    from jesterj_ray.stages.lm import lm_perplexity_pipeline
    out = lm_perplexity_pipeline("/root/testdata/sf0.001").to_pandas()
    assert len(out) > 0
    assert list(out["doc_id"]) == sorted(out["doc_id"])
    assert (out["ppl"] > 0).all()
    assert (out["avg_logprob"] < 0).all()


def test_ccnet_buckets(ray_session):
    from jesterj_ray.stages.lm import ccnet_buckets_pipeline
    out = ccnet_buckets_pipeline("/root/testdata/sf0.001").to_pandas()
    assert set(out["bucket"].unique()) == {"head", "middle", "tail"}
    # per-lang: buckets are value-monotone (every head ppl <= every
    # middle ppl <= every tail ppl) and roughly tercile-sized
    for lang, g in out.groupby("lang"):
        h = g[g["bucket"] == "head"]["ppl"]
        m = g[g["bucket"] == "middle"]["ppl"]
        t = g[g["bucket"] == "tail"]["ppl"]
        if len(h) and len(m):
            assert h.max() <= m.min()
        if len(m) and len(t):
            assert m.max() <= t.min()
        n = len(g)
        if n >= 9:
            assert len(h) >= 1 and len(t) >= 1
    # same docs as lm_perplexity (zero-token docs dropped identically)
    from jesterj_ray.stages.lm import lm_perplexity_pipeline
    lp = lm_perplexity_pipeline("/root/testdata/sf0.001").to_pandas()
    assert list(out["doc_id"]) == list(lp["doc_id"])
