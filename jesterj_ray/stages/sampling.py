"""Deterministic stratified sampling — the training-data mixing
primitive (pick k docs per language / source / quality bucket, stably
across reruns and cluster sizes).

Selection rank is a FROZEN overflow-safe integer mix of the doc id
(``h = ((id % 1000003) * 2654435761 + id % 1000000007) %
1000000007``), chosen so DuckDB evaluates it exactly in BIGINT for the
WHOLE non-negative int64 domain (max intermediate ~2.66e15 + 1e9 —
SQL BIGINT errors on overflow rather than wrapping, so a 64-bit
splitmix is NOT SQL-expressible) and numpy evaluates it identically in
int64.  Rank ties break by id.  Knuth's multiplicative constant
scatters sequential ids; the outer prime keeps the mix full-range.
Ids must be NON-NEGATIVE: SQL ``%`` keeps the dividend's sign while
numpy's is always non-negative, so negative ids would diverge.

Distributed shape: each block prunes to its own k-smallest per group
(vectorized lexsort + boundary mask — no per-group Python), so the
driver fold sees at most k x groups x blocks candidate rows, never the
corpus.  The same pattern serves any per-group top-k by deterministic
score.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

_M1, _M2, _P = 1000003, 2654435761, 1000000007


def mix_rank(ids: np.ndarray) -> np.ndarray:
    """The frozen selection hash (see module docstring); exact in
    int64 for ALL non-negative ids: (id % 1e6+3) * 2654435761 <=
    ~2.66e15, + (id % 1e9+7) stays far below 2^63 — no wrap on the
    numpy side, no overflow error on the SQL side."""
    ids = ids.astype(np.int64)
    if ids.size and int(ids.min()) < 0:
        raise ValueError("mix_rank ids must be non-negative "
                         "(SQL % keeps the dividend's sign)")
    return ((ids % _M1) * _M2 + ids % _P) % _P


def _block_topk(t: pa.Table, *, group_col: str, id_col: str,
                k: int) -> pa.Table:
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if ids.size == 0:
        return t.append_column("h", pa.array([], pa.int64()))
    h = mix_rank(ids)
    groups = t[group_col].to_numpy(zero_copy_only=False)
    codes, _ = pd.factorize(groups)
    order = np.lexsort((ids, h, codes))
    gsort = codes[order]
    # rank within group = position - first position of the group
    boundary = np.empty(gsort.size, dtype=bool)
    boundary[0] = True
    np.not_equal(gsort[1:], gsort[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    first_of = np.repeat(starts, np.diff(np.append(starts, gsort.size)))
    keep = order[(np.arange(gsort.size) - first_of) < k]
    out = t.take(pa.array(np.sort(keep)))
    return out.append_column("h", pa.array(h[np.sort(keep)], pa.int64()))


def _block_budget_prune(t: pa.Table, *, group_col: str, id_col: str,
                        text_col: str, budget) -> pa.Table:
    """Keep rows that could still be within the group's token budget:
    a doc whose IN-BLOCK predecessors (hash order) already hold
    ``budget`` tokens is out globally too (global cum-before >=
    in-block cum-before).  Survivors per group per block are bounded
    by the budget (every doc has >= 0 tokens), never the corpus."""
    import pyarrow.compute as pc
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n_tok = pc.count_substring_regex(
        pc.utf8_lower(t[text_col]), pattern="[a-z0-9]+") \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    out_cols = {group_col: t[group_col], id_col: t[id_col]}
    if ids.size == 0:
        return pa.table(out_cols | {
            "n_tok": pa.array([], pa.int64()),
            "h": pa.array([], pa.int64())})
    h = mix_rank(ids)
    codes_arr, uniq_groups = pd.factorize(
        t[group_col].to_numpy(zero_copy_only=False))
    codes = codes_arr
    order = np.lexsort((ids, h, codes))
    gsort = codes[order]
    csum = np.cumsum(n_tok[order])
    boundary = np.empty(gsort.size, dtype=bool)
    boundary[0] = True
    np.not_equal(gsort[1:], gsort[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    base = np.repeat(csum[starts] - n_tok[order][starts],
                     np.diff(np.append(starts, gsort.size)))
    cum_before = csum - n_tok[order] - base
    # per-group budgets (weighted mixing): dict group -> budget, int
    # for uniform; unknown groups get 0 = excluded (the driver fold
    # applies the same rule — keep them in lockstep)
    if isinstance(budget, dict):
        per_group = np.array([budget.get(g, 0)
                              for g in uniq_groups], dtype=np.int64)
        row_budget = per_group[gsort]
    else:
        row_budget = np.int64(budget)
    keep = np.sort(order[cum_before < row_budget])
    sel = pa.array(keep)
    return pa.table({group_col: t[group_col].take(sel),
                     id_col: t[id_col].take(sel),
                     "n_tok": pa.array(n_tok[keep], pa.int64()),
                     "h": pa.array(h[keep], pa.int64())})


def mix_by_token_budget(sf_dir: str, *, budget: int = 2000,
                        table: str = "documents",
                        group_col: str = "lang",
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        num_blocks: int = 8,
                        ds: "object" = None) -> pd.DataFrame:
    """Greedy token-budget fill per group — the data-MIXING primitive
    (cap each language/source at N training tokens, deterministically):
    docs enter in the frozen hash-rank order until the tokens BEFORE a
    doc reach the budget (the crossing doc is included).  ``budget``
    may be a dict {group: tokens} for WEIGHTED mixes (the per-source
    sampling weights of a training recipe; groups absent from the dict
    get 0 = excluded).  Emits (group, rank, id, n_tok, cum_tokens).

    Two-level fold (r04 VERDICT #6 — the driver fold used to concat
    every block's survivors, O(blocks x groups x budget-bounded rows)):
    blocks prune locally (:func:`_block_budget_prune`), then a groupby
    on the group key resolves each group's EXACT selection inside one
    ``map_groups`` task — so the driver sees only final selected rows,
    O(groups x budget), independent of block count (pinned by
    ``test_mix_block_count_independence``)."""
    import ray.data as rd
    if ds is None:
        ds = rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                             columns=[group_col, id_col, text_col],
                             override_num_blocks=num_blocks)
    else:
        # composed mode (curation pipeline): mix an upstream-filtered
        # Dataset instead of the raw table; sf_dir is ignored
        ds = ds.select_columns([group_col, id_col, text_col])
    cand = ds.map_batches(
        _block_budget_prune, batch_format="pyarrow",
        fn_kwargs={"group_col": group_col, "id_col": id_col,
                   "text_col": text_col, "budget": budget})

    def fill_group(g: pd.DataFrame) -> pd.DataFrame:
        # all of one group's block survivors: the exact greedy fill
        g = g.sort_values(["h", id_col], kind="mergesort")
        csum = g["n_tok"].cumsum()
        before = csum - g["n_tok"]
        b = budget.get(g[group_col].iloc[0], 0) \
            if isinstance(budget, dict) else budget
        keep = before.to_numpy() < np.int64(b)
        out = g.loc[keep, [group_col, id_col, "n_tok"]].copy()
        out["cum_tokens"] = csum[keep]
        out["rank"] = np.arange(1, int(keep.sum()) + 1, dtype=np.int64)
        return out

    out = cand.groupby(group_col).map_groups(
        fill_group, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "rank": pd.Series([], dtype=np.int64),
                             id_col: pd.Series([], dtype=np.int64),
                             "n_tok": pd.Series([], dtype=np.int64),
                             "cum_tokens": pd.Series([],
                                                     dtype=np.int64)})
    out = out.sort_values([group_col, "rank"], kind="mergesort")
    out = out[[group_col, "rank", id_col, "n_tok", "cum_tokens"]].copy()
    for c in ("rank", "n_tok", "cum_tokens"):
        out[c] = out[c].astype(np.int64)
    return out.reset_index(drop=True)


def sample_per_group(sf_dir: str, *, table: str = "documents",
                     group_col: str = "lang", id_col: str = "doc_id",
                     k: int = 5, columns=None) -> pd.DataFrame:
    """k deterministic docs per group: (group, rank 1..k, id).  The
    driver fold is O(k x groups) — each block pre-prunes."""
    import ray.data as rd
    cols = list(dict.fromkeys([group_col, id_col] + (columns or [])))
    ds = rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                         columns=cols, override_num_blocks=8)
    cand = ds.map_batches(
        _block_topk, batch_format="pyarrow",
        fn_kwargs={"group_col": group_col, "id_col": id_col, "k": k}) \
        .to_pandas()
    if cand.empty:
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "rank": pd.Series([], dtype=np.int64),
                             id_col: pd.Series([], dtype=np.int64)})
    cand = cand.sort_values([group_col, "h", id_col], kind="mergesort")
    cand["rank"] = cand.groupby(group_col, sort=False).cumcount() + 1
    out = cand[cand["rank"] <= k][[group_col, "rank", id_col]]
    out["rank"] = out["rank"].astype(np.int64)
    return out.reset_index(drop=True)
