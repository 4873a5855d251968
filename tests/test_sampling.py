"""Deterministic stratified sampling (stages/sampling.py): selection
independent of block layout (docIDs-not-execution-order repo rule
applied to sampling) and block-local prune bounds the driver fold."""
import numpy as np
import pandas as pd
import pyarrow as pa

from jesterj_ray.stages.sampling import _block_topk, mix_rank


def _table(n, langs=("en", "de", "fr")):
    rng = np.random.default_rng(2)
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array([langs[i] for i in
                          rng.integers(0, len(langs), size=n)])})


def brute(t, k):
    df = t.to_pandas()
    df["h"] = mix_rank(df["doc_id"].to_numpy())
    df = df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
    df["rank"] = df.groupby("lang", sort=False).cumcount() + 1
    return df[df["rank"] <= k][["lang", "rank", "doc_id"]] \
        .reset_index(drop=True)


def test_block_prune_is_layout_invariant():
    t = _table(500)
    k = 7
    want = brute(t, k)
    for n_blocks in (1, 3, 8, 50):
        bounds = np.linspace(0, len(t), n_blocks + 1, dtype=int)
        cands = []
        for a, b in zip(bounds[:-1], bounds[1:]):
            blk = t.slice(a, b - a)
            out = _block_topk(blk, group_col="lang", id_col="doc_id",
                              k=k)
            # prune bound: <= k rows per group per block
            per = out.to_pandas().groupby("lang").size()
            assert (per <= k).all()
            cands.append(out.to_pandas())
        cand = pd.concat(cands)
        cand = cand.sort_values(["lang", "h", "doc_id"],
                                kind="mergesort")
        cand["rank"] = cand.groupby("lang", sort=False).cumcount() + 1
        got = cand[cand["rank"] <= k][["lang", "rank", "doc_id"]] \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


def test_mix_rank_matches_sql_semantics():
    """Every intermediate stays below 2^63 (DuckDB BIGINT errors on
    overflow) and the numpy path equals the plain-python big-int
    evaluation — the exactness both oracles rely on."""
    ids = np.array([0, 1, 7, 10**6, 10**9, 10**12, 2**40, 2**52],
                   dtype=np.int64)
    got = mix_rank(ids)
    for i, v in zip(ids.tolist(), got.tolist()):
        assert v == ((i % 1000003) * 2654435761 + i) % 1000000007
        assert (i % 1000003) * 2654435761 + i < 2**63
