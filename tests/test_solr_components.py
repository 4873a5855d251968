"""Solr-parity late components (flagship.terms/stats/range/cursor):
edge semantics the sf0.01 oracle rows don't reach."""
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_terms_component_order_and_prefix(ray_session):
    from jesterj_ray.pipelines.flagship import terms_component
    out = terms_component(SF, prefix="s", limit=3)
    assert len(out) <= 3
    assert all(t.startswith("s") for t in out["term"])
    dfs = list(out["df"])
    assert dfs == sorted(dfs, reverse=True)
    none = terms_component(SF, prefix="zzzzzz")
    assert len(none) == 0


def test_stats_component_empty_match(ray_session):
    from jesterj_ray.pipelines.flagship import stats_component
    out = stats_component(SF, query="qqqqnotaterm")
    assert out["n"][0] == 0
    assert pd.isna(out["min_v"][0]) and pd.isna(out["stddev_v"][0])


def test_stats_component_single_term(ray_session):
    from jesterj_ray.pipelines.flagship import stats_component
    out = stats_component(SF, query="merge")
    assert out["n"][0] > 0
    assert out["min_v"][0] <= out["max_v"][0]
    assert out["min_v"][0] <= out["mean_v"][0] <= out["max_v"][0]
    assert out["stddev_v"][0] >= 0


def test_range_facets_cover_and_zeros(ray_session):
    from jesterj_ray.pipelines.flagship import range_facets
    from jesterj_ray.pipelines.flagship import stats_component
    out = range_facets(SF, query="merge", start=0, end=1000, gap=100)
    assert list(out["bucket_start"]) == list(range(0, 1000, 100))
    # bucket totals == in-range match count (all n_chars < 1000)
    st = stats_component(SF, query="merge")
    assert st["max_v"][0] < 1000
    assert out["n"].sum() == st["n"][0]
    # buckets past max_v are emitted as zeros, not elided
    beyond = out[out["bucket_start"] > st["max_v"][0]]
    assert len(beyond) > 0 and (beyond["n"] == 0).all()


def test_cursor_pages_stable_and_disjoint(ray_session):
    from jesterj_ray.pipelines.flagship import cursor_pages
    a = cursor_pages(SF, query="merge sort", page_size=4, pages=(1, 2, 3))
    assert list(a["rnk"]) == list(range(1, 13))
    # page windows tile the rank sequence with no overlap
    for p in (1, 2, 3):
        w = a[a["page"] == p]
        assert list(w["rnk"]) == list(range((p - 1) * 4 + 1, p * 4 + 1))
    # deterministic: same order on re-run
    b = cursor_pages(SF, query="merge sort", page_size=4, pages=(1, 2, 3))
    assert a.equals(b)
    # rounded-score ordering is monotone non-increasing
    s = list(a["score"])
    assert all(s[i] >= s[i + 1] for i in range(len(s) - 1))


def test_facet_stats_consistency(ray_session):
    from jesterj_ray.pipelines.flagship import facet_stats
    from jesterj_ray.pipelines.flagship import stats_component
    out = facet_stats(SF, query="merge", facet_field="lang",
                      stat_field="n_chars")
    st = stats_component(SF, query="merge")
    assert out["n"].sum() == st["n"][0]          # facets tile the match set
    assert out["sum_v"].sum() == st["sum_v"][0]
    assert (out["mean_v"] * out["n"] - out["sum_v"]).abs().max() < 0.5
    assert list(out["lang"]) == sorted(out["lang"])


def test_url_domain_filter_semantics(ray_session):
    import pyarrow as pa
    import ray
    from jesterj_ray.stages.urls import DomainFilter, extract_domain
    t = pa.table({"url": pa.array([
        "https://site3.example.com/p/1",
        "http://ok.example.net/x",
        "not a url at all",
    ], pa.string())})
    d = extract_domain(t, url_col="url")
    assert d["domain"].to_pylist() == ["site3.example.com",
                                       "ok.example.net", None]
    f = DomainFilter(("site3.example.com",), url_col="url")(t)
    # blocked, kept, and unparseable-kept (null domain never blocks)
    assert f["kept"].to_pylist() == [False, True, True]


def test_url_pipeline_blocklist_bites(ray_session):
    from jesterj_ray.stages.urls import url_domain_filter_pipeline
    out = url_domain_filter_pipeline(SF).to_pandas()
    assert len(out) > 0
    assert (~out["kept"]).sum() > 0              # some docs blocked
    blocked = out[~out["kept"]]["domain"].unique()
    assert set(blocked) <= {"site3.example.com", "site7.example.org",
                            "site11.example.org"}


def test_phrase_slop_semantics(ray_session, tmp_path):
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    from jesterj_ray.index.build_rows import build_index_rows
    from jesterj_ray.index.query import IndexReader
    texts = [
        (0, "alpha merge sort beta"),            # exact
        (1, "merge quick sort now"),             # gap 1
        (2, "merge one two sort"),               # gap 2
        (3, "merge a b c sort"),                 # gap 3 (too far at ~2)
        (4, "sort then merge"),                  # wrong order
        (5, "merge merge zz sort"),              # chain via 2nd merge
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([d for d, _ in texts], pa.int64()),
        "text": pa.array([t for _, t in texts], pa.string())}),
        os.path.join(str(tmp_path), "d.parquet"))
    idx = os.path.join(str(tmp_path), "idx")
    build_index_rows(os.path.join(str(tmp_path), "d.parquet"), idx,
                     text_col="text", key_col="doc_id",
                     tokenizer="simple", docs_per_partition=4,
                     num_shards=2, positions=True)
    r = IndexReader(idx)
    got = {d for d, _ in r.phrase_slop_topk("merge sort", slop=2, k=10)}
    keys = {int(k) for k in r.doc_keys(
        __import__("numpy").array(sorted(got), dtype="int64"))}
    assert keys == {0, 1, 2, 5}
    # slop 0 falls back to the exact phrase
    got0 = {d for d, _ in r.phrase_slop_topk("merge sort", slop=0, k=10)}
    keys0 = {int(k) for k in r.doc_keys(
        __import__("numpy").array(sorted(got0), dtype="int64"))}
    assert keys0 == {0}
    # slop 3 admits doc 3 as well
    got3 = {d for d, _ in r.phrase_slop_topk("merge sort", slop=3, k=10)}
    assert len(got3) == 5


def test_synonym_expansion_widens_matches(ray_session):
    from jesterj_ray.index.query import IndexReader
    from jesterj_ray.pipelines.flagship import (SYNONYMS,
                                                documents_index)
    r = IndexReader(documents_index(SF))
    plain = {d for d, _ in r.topk("merge sort", r.n_docs)}
    syn = {d for d, _ in r.topk_synonyms("merge sort", SYNONYMS,
                                         r.n_docs)}
    assert plain <= syn
    only_syn = {d for d, _ in r.topk("join order", r.n_docs)} - plain
    if only_syn:                      # docs matching only via synonyms
        assert only_syn <= syn
    # no synonyms for the terms -> identical to plain topk
    assert {d for d, _ in r.topk_synonyms("customer", SYNONYMS, 10)} \
        == {d for d, _ in r.topk("customer", 10)}


def test_q3_top_orders_shape(ray_session):
    from jesterj_ray.pipelines.relational import q3_top_orders
    a = q3_top_orders(SF)
    assert list(a["rank"]) == list(range(1, len(a) + 1))
    revs = list(a["revenue"])
    assert revs == sorted(revs, reverse=True)
    b = q3_top_orders(SF)
    assert a.equals(b)
