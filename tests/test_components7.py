"""Seventh-wave search components: JSON facets, significant terms,
percolator, realtime get (jesterj_ray/pipelines/components.py)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _tokens(text):
    from jesterj_ray.tokenize.tokenizer import simple_tokenize
    return simple_tokenize(text or "")


def test_json_facet_nested_limits_and_order(ray_session):
    from jesterj_ray.pipelines.components import json_facet_nested
    out = json_facet_nested(SF, query="dup stream", top_buckets=2, sub_n=2)
    # bucket limit: at most 2 langs, each with at most 2 sources
    assert out["lang"].nunique() <= 2
    assert out.groupby("lang")["source"].count().max() <= 2
    # bucket order is count desc then lang asc
    bc = out.drop_duplicates("lang")["lang_count"].to_numpy()
    assert (np.diff(bc) <= 0).all()
    # stat parity: avg_chars recomputed from the raw table over the
    # brute-force match set
    t = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    matched = t[t["text"].map(
        lambda x: bool({"dup", "stream"} & set(_tokens(x))))]
    for lang, g in matched.groupby("lang"):
        want = np.floor(g["n_chars"].sum() / len(g) * 1e6 + 0.5) / 1e6
        got = out[out["lang"] == lang]["avg_chars"]
        if len(got):
            assert got.iloc[0] == want


def test_json_facet_nested_absent_query_empty(ray_session):
    from jesterj_ray.pipelines.components import json_facet_nested
    out = json_facet_nested(SF, query="zzzabsent")
    assert out.empty
    assert list(out.columns) == ["lang", "lang_count", "avg_chars",
                                 "source", "source_count"]


def test_significant_terms_matches_brute_force(ray_session):
    from jesterj_ray.pipelines.components import significant_terms
    out = significant_terms(SF, query="dup stream", top_n=10, min_fg_df=5)
    t = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    doc_terms = t["text"].map(lambda x: set(_tokens(x)))
    fg_mask = doc_terms.map(lambda s: bool({"dup", "stream"} & s))
    bg_n, fg_n = len(t), int(fg_mask.sum())
    rows = []
    vocab = set().union(*doc_terms)
    for term in vocab - {"dup", "stream"}:
        has = doc_terms.map(lambda s: term in s)
        fg_df, bg_df = int((has & fg_mask).sum()), int(has.sum())
        if fg_df >= 5:
            lift = np.floor((fg_df * float(bg_n)) / (bg_df * float(fg_n))
                            * 1e6 + 0.5) / 1e6
            rows.append((term, fg_df, bg_df, lift))
    want = pd.DataFrame(rows, columns=["term", "fg_df", "bg_df", "lift"]) \
        .sort_values(["lift", "term"], ascending=[False, True],
                     kind="mergesort").head(10).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype({"fg_df": np.int64, "bg_df": np.int64}), want)


def test_significant_terms_excludes_query_terms(ray_session):
    from jesterj_ray.pipelines.components import significant_terms
    out = significant_terms(SF, query="dup stream", top_n=50, min_fg_df=1)
    assert not set(out["term"]) & {"dup", "stream"}


def test_percolate_matches_brute_force(ray_session):
    from jesterj_ray.pipelines.components import (PERCOLATOR_QUERIES,
                                                  percolate_documents)
    out = percolate_documents(SF)
    t = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    doc_terms = t["text"].map(lambda x: set(_tokens(x)))
    rows = []
    for q in PERCOLATOR_QUERIES:
        for did, terms in zip(t["doc_id"], doc_terms):
            if all(m in terms for m in q["must"]) and \
                    not any(m in terms for m in q["must_not"]):
                rows.append((q["qid"], did))
    want = pd.DataFrame(rows, columns=["qid", "doc_id"]) \
        .sort_values(["qid", "doc_id"]).reset_index(drop=True) \
        .astype(np.int64)
    pd.testing.assert_frame_equal(out, want)
    # the absent-term stored query matches nothing
    assert (out["qid"] != 4).all()


def test_percolate_must_not_prunes(ray_session):
    from jesterj_ray.pipelines.components import percolate_documents
    out = percolate_documents(SF, queries=[
        {"qid": 1, "must": ["customer"], "must_not": []},
        {"qid": 2, "must": ["customer"], "must_not": ["window"]}])
    n1 = int((out["qid"] == 1).sum())
    n2 = int((out["qid"] == 2).sum())
    assert 0 < n2 < n1  # NOT really excludes some matches
    assert set(out[out["qid"] == 2]["doc_id"]) <= \
        set(out[out["qid"] == 1]["doc_id"])


def test_realtime_get_sees_delta_and_delete(ray_session, tmp_path):
    import shutil

    from jesterj_ray.pipelines.components import realtime_get
    from jesterj_ray.pipelines.flagship import _cache_dir
    shutil.rmtree(_cache_dir(SF, "rtg1"), ignore_errors=True)
    out = realtime_get(SF)
    t = pq.read_table(f"{SF}/documents.parquet").to_pandas() \
        .set_index("doc_id")
    by_id = out.set_index("doc_id")
    # updated doc: base tokens + the 4 suffix tokens, served alive
    base_len = len(_tokens(t.loc[3, "text"]))
    assert by_id.loc[3, "found"] and by_id.loc[3, "doc_len"] == base_len + 4
    # deleted doc: tombstoned, not found
    assert not by_id.loc[17, "found"] and by_id.loc[17, "doc_len"] == 0
    # never-indexed id
    assert not by_id.loc[9999999, "found"]
    # untouched doc serves its original length
    assert by_id.loc[42, "doc_len"] == len(_tokens(t.loc[42, "text"]))
    # idempotent: warm-cache re-run (delta diff is a no-op) is identical
    again = realtime_get(SF)
    pd.testing.assert_frame_equal(out, again)


def test_percolate_indexed_identity_and_large_query_set(ray_session):
    """The indexed percolator must match the exhaustive one on the
    stock query set AND on a larger synthetic store (guard-term
    sharing, absent guards, must_not interplay)."""
    from jesterj_ray.pipelines.components import (
        percolate_documents, percolate_documents_indexed)
    sf = "/root/testdata/sf0.001"
    a = percolate_documents(sf)
    b = percolate_documents_indexed(sf)
    pd.testing.assert_frame_equal(a, b)

    words = ["merge", "sort", "stream", "dup", "customer", "window",
             "hash", "join", "filter", "zzzabsent"]
    qs = []
    qid = 0
    for i, w1 in enumerate(words):
        for w2 in words[i + 1:i + 3]:
            qid += 1
            qs.append({"qid": qid, "must": [w1, w2],
                       "must_not": [words[(i + 5) % len(words)]]})
    a2 = percolate_documents(sf, queries=qs)
    b2 = percolate_documents_indexed(sf, queries=qs)
    pd.testing.assert_frame_equal(a2, b2)


def test_percolate_mustless_query_both_paths(ray_session):
    """A stored query with an empty must list (pure exclusion) must
    work identically on the exhaustive and indexed paths (r05
    self-review: the indexed path crashed on min([]))."""
    from jesterj_ray.pipelines.components import (
        percolate_documents, percolate_documents_indexed)
    sf = "/root/testdata/sf0.001"
    qs = [{"qid": 1, "must": [], "must_not": ["stream"]},
          {"qid": 2, "must": ["merge"], "must_not": []}]
    import os
    a = percolate_documents(sf, queries=qs)
    b = percolate_documents_indexed(sf, queries=qs)
    pd.testing.assert_frame_equal(a, b)
    n_docs = pq.read_metadata(
        os.path.join(sf, "documents.parquet")).num_rows
    n_stream = (a["qid"] == 1).sum()
    assert 0 < n_stream < n_docs  # exclusion actually bites


def test_percolate_paths_identity_property(ray_session):
    """Property-style sweep: exhaustive == indexed over a randomized
    family of stored query stores (seeded), covering shared guards,
    pure-exclusion, absent terms, and single-term queries."""
    import random
    from jesterj_ray.pipelines.components import (
        percolate_documents, percolate_documents_indexed)
    sf = "/root/testdata/sf0.001"
    vocab = ["merge", "sort", "stream", "dup", "customer", "window",
             "hash", "join", "filter", "key", "line", "zzzabsent"]
    rng = random.Random(20260818)
    for trial in range(4):
        qs = []
        for qid in range(1, 13):
            must = rng.sample(vocab, rng.randint(0, 3))
            must_not = rng.sample(
                [w for w in vocab if w not in must],
                rng.randint(0, 2))
            qs.append({"qid": qid, "must": must,
                       "must_not": must_not})
        a = percolate_documents(sf, queries=qs)
        b = percolate_documents_indexed(sf, queries=qs)
        pd.testing.assert_frame_equal(a, b)
