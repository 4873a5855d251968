"""Solr QueryElevationComponent / ReRankQParser / JoinQParser analogs
(pipelines/flagship.py): semantics pinned at sf0.001.

Reference behavior: Solr elevate.xml pins ids at the top in config
order (forceElevation even for non-matching queries) and removes
excluded ids; {!rerank} rescores only the top reRankDocs of the main
list; {!join} restricts the match set to ids referenced by another
collection.  JesterJ relies on these server-side (SURVEY §2.2 senders).
"""
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_elevation_pins_excludes_and_passthrough(ray_session):
    from jesterj_ray.pipelines.flagship import (
        DOC_QUERIES, ELEVATION, bm25_topk_documents, elevate_topk)
    el = elevate_topk(SF)
    plain = bm25_topk_documents(SF)
    # pinned ids hold ranks 1..m in config order, flagged elevated
    q1 = el[el.qid == 1].reset_index(drop=True)
    assert q1.loc[0, ["doc_id", "elevated"]].tolist() == [129, 1]
    assert q1.loc[1, ["doc_id", "elevated"]].tolist() == [7, 1]
    assert (q1.loc[2:, "elevated"] == 0).all()
    # excluded id never appears, pinned ids appear exactly once
    assert 362 not in q1.doc_id.iloc[2:].tolist()
    assert q1.doc_id.tolist().count(129) == 1
    # organic tail preserves bm25 order minus pinned/excluded ids
    drop = set(ELEVATION[1]["elevate"]) | set(ELEVATION[1]["exclude"])
    organic = [d for d in plain[plain.qid == 1].doc_id if d not in drop]
    assert q1.doc_id.iloc[2:].tolist() == organic[:len(q1) - 2]
    # forceElevation: the absent-term query still yields its pin
    q4 = el[el.qid == 4]
    assert q4.doc_id.tolist() == [13] and q4.elevated.tolist() == [1]
    # an unconfigured query passes through rank-identical
    for qid in (3, 5, 6):
        got = el[el.qid == qid].doc_id.tolist()
        want = plain[plain.qid == qid].doc_id.tolist()
        assert got == want, qid
    # k respected even with pins
    ks = {q["qid"]: q["k"] for q in DOC_QUERIES}
    for qid, grp in el.groupby("qid"):
        assert len(grp) <= ks[qid]
        assert grp["rank"].tolist() == list(range(1, len(grp) + 1))


def test_rerank_window_and_combined_scores(ray_session):
    from jesterj_ray.index.query import IndexReader
    from jesterj_ray.pipelines.flagship import (documents_index,
                                                rerank_topk)
    rr = rerank_topk(SF, "merge sort", "customer", 5, 2.0, 10)
    assert rr["rank"].tolist() == list(range(1, len(rr) + 1))
    # recompute both phases brute-force from the reader
    reader = IndexReader(documents_index(SF))
    ids, sc = reader.match_scores("merge sort")
    keys = np.asarray([int(x) for x in reader.doc_keys(ids)], np.int64)
    o = np.lexsort((keys, -sc))
    keys, sc = keys[o], sc[o]
    rids, rsc = reader.match_scores("customer")
    rmap = dict(zip((int(x) for x in reader.doc_keys(rids)),
                    rsc.tolist()))
    comb = sc.copy()
    comb[:5] += 2.0 * np.array([rmap.get(int(d), 0.0)
                                for d in keys[:5]])
    r6 = np.floor(comb * 1e6 + 0.5) / 1e6
    o2 = np.lexsort((keys, -r6))[:10]
    assert rr.doc_id.tolist() == keys[o2].tolist()
    assert np.allclose(rr.score.to_numpy(), r6[o2])
    # docs OUTSIDE the window keep their main score even when the
    # rerank query matches them (window semantics, not a global boost)
    outside = [int(d) for d in keys[5:] if int(d) in rmap]
    if outside:
        d = outside[0]
        row = rr[rr.doc_id == d]
        if len(row):
            main = sc[np.where(keys == d)[0][0]]
            assert abs(row.score.iloc[0]
                       - np.floor(main * 1e6 + 0.5) / 1e6) < 1e-12


def test_join_query_restricts_to_referenced_ids(ray_session):
    import duckdb
    from jesterj_ray.pipelines.flagship import (bm25_topk_documents,
                                                join_query_topk)
    jq = join_query_topk(SF, "merge sort", "purchase", 150.0, 10)
    con = duckdb.connect()
    keys = {r[0] for r in con.execute(
        f"SELECT DISTINCT CAST(props->>'k' AS BIGINT) FROM "
        f"'{SF}/events.parquet' "
        f"WHERE event_type = 'purchase' AND value >= 150.0").fetchall()}
    assert set(jq.doc_id) <= keys
    # every returned doc matches the query (subset of the match set)
    plain = bm25_topk_documents(
        SF, [{"qid": 1, "query": "merge sort", "k": 10**6}])
    match = set(plain.doc_id)
    assert set(jq.doc_id) <= match
    # ranking inside the joined set preserves bm25 relative order
    pos = {d: r for r, d in enumerate(plain.doc_id)}
    got = jq.doc_id.tolist()
    assert got == sorted(got, key=lambda d: pos[d])
    # an impossible predicate joins to nothing
    empty = join_query_topk(SF, "merge sort", "purchase", 1e12, 10)
    assert len(empty) == 0
