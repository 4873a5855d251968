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
