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
    """Every intermediate stays below 2^63 for the WHOLE non-negative
    int64 domain (DuckDB BIGINT errors on overflow; numpy would wrap
    silently — r04 review finding) and the numpy path equals the
    plain-python big-int evaluation — the exactness both oracles rely
    on.  Negative ids are refused (SQL % keeps the dividend's sign)."""
    import pytest
    ids = np.array([0, 1, 7, 10**6, 10**9, 10**12, 2**40, 2**52,
                    2**63 - 1], dtype=np.int64)
    got = mix_rank(ids)
    for i, v in zip(ids.tolist(), got.tolist()):
        assert v == ((i % 1000003) * 2654435761 + i % 1000000007) \
            % 1000000007
        assert (i % 1000003) * 2654435761 + i % 1000000007 < 2**63
    with pytest.raises(ValueError, match="non-negative"):
        mix_rank(np.array([-1], dtype=np.int64))


def test_token_budget_prune_is_layout_invariant_and_safe():
    """mix_by_token_budget's block prune: concat-of-block-survivors
    resolves to the same selection as the unpruned global computation,
    at any block layout (incl. the subtle case where a pruned doc's
    tokens precede another block's doc globally — safe because the
    pruned doc's KEPT in-block prefix already carries >= budget
    tokens)."""
    from jesterj_ray.stages.sampling import _block_budget_prune
    rng = np.random.default_rng(5)
    n = 400
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array([("en", "de")[i] for i in
                          rng.integers(0, 2, size=n)]),
        "text": pa.array([" ".join(["tok"] * int(k))
                          for k in rng.integers(0, 30, size=n)])})
    budget = 150

    def resolve(cand):
        cand = cand.sort_values(["lang", "h", "doc_id"],
                                kind="mergesort")
        g = cand.groupby("lang", sort=False)
        cand["cum_tokens"] = g["n_tok"].cumsum()
        cand["rank"] = g.cumcount() + 1
        out = cand[cand["cum_tokens"] - cand["n_tok"] < budget]
        return out[["lang", "rank", "doc_id", "n_tok",
                    "cum_tokens"]].reset_index(drop=True)

    want = resolve(_block_budget_prune(
        t, group_col="lang", id_col="doc_id", text_col="text",
        budget=budget).to_pandas())      # single block == ground truth
    for n_blocks in (2, 5, 17, 100):
        bounds = np.linspace(0, n, n_blocks + 1, dtype=int)
        cands = [_block_budget_prune(
            t.slice(a, b - a), group_col="lang", id_col="doc_id",
            text_col="text", budget=budget).to_pandas()
            for a, b in zip(bounds[:-1], bounds[1:])]
        got = resolve(pd.concat(cands, ignore_index=True))
        pd.testing.assert_frame_equal(got, want)
        # prune bound: survivors per group per block hold < budget
        # tokens BEFORE their last row (=> bounded by budget + 1 doc)
        for c in cands:
            per = c.groupby("lang")["n_tok"].sum()
            # kept prefix stops at the crossing doc
            assert (per - c.groupby("lang")["n_tok"].max()
                    < budget).all()
    # budget semantics: tokens before every selected doc < budget,
    # crossing doc included, nothing after it
    assert ((want["cum_tokens"] - want["n_tok"]) < budget).all()
    for lang, grp in want.groupby("lang"):
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        assert grp["cum_tokens"].iloc[-1] >= budget or \
            len(grp) == (t.to_pandas()["lang"] == lang).sum()
