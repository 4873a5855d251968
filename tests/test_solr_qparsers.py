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


def test_suggester_weights_and_tombstones(ray_session, tmp_path):
    """SuggestComponent: collection-frequency weights (totalTermFreq,
    not docFreq), weight-desc/term-asc order, top-n cut — and a
    tombstoned doc's occurrences stop counting immediately (no
    rebuild), unlike the df-based terms_component which keeps Lucene
    docFreq semantics until compaction."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    from jesterj_ray.index.build_rows import build_index_rows
    from jesterj_ray.index.query import IndexReader, delete_docs
    from jesterj_ray.pipelines.flagship import (suggest,
                                                suggest_from_reader)
    sug = suggest(SF, prefix="s", n=5)
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT term, CAST(count(*) AS BIGINT) AS weight
        FROM (SELECT unnest(regexp_extract_all(lower(text),
                            '[a-z0-9]+')) AS term
              FROM '{SF}/documents.parquet')
        WHERE term LIKE 's%' GROUP BY term
        ORDER BY weight DESC, term LIMIT 5""").df()
    pd.testing.assert_frame_equal(sug, want)

    # tombstone: delete the doc holding most of one term's mass
    texts = ["alpha alpha alpha beta", "alpha gamma", "beta beta"]
    tab = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "content": pa.array(texts)})
    src = str(tmp_path / "c.parquet")
    pq.write_table(tab, src)
    out = str(tmp_path / "idx")
    build_index_rows(src, out, text_col="content", tokenizer="simple",
                     docs_per_partition=2, num_shards=2)
    rdr = IndexReader(out)
    before = suggest_from_reader(rdr, "a", 10)
    assert before.set_index("term")["weight"].to_dict() == {"alpha": 4}
    # map original texts -> index doc keys via the 'alpha' postings
    docs, tfs = rdr.postings("alpha")
    keys_by_tf = {int(t): k for t, k in zip(tfs, rdr.doc_keys(docs))}
    assert delete_docs(out, [keys_by_tf[3]]) == 1  # the tf=3 doc
    after = suggest_from_reader(IndexReader(out), "a", 10)
    assert after.set_index("term")["weight"].to_dict() == {"alpha": 1}
    # a fully-tombstoned term drops out entirely
    assert delete_docs(out, [keys_by_tf[1]]) == 1
    gone = suggest_from_reader(IndexReader(out), "a", 10)
    assert len(gone) == 0


def test_ltr_features_consistent_with_ranking(ray_session):
    """LTR FeatureLogger: features derive from the same reader state
    as the ranking — bm25 equals the topk score, n_match counts
    matched distinct query terms, dl is the token count, sum_idf sums
    matched idf."""
    from jesterj_ray.pipelines.flagship import (bm25_topk_documents,
                                                ltr_features)
    lf = ltr_features(SF)
    plain = bm25_topk_documents(SF)
    merged = lf.merge(plain, on=["qid", "rank", "doc_id"])
    assert len(merged) == len(lf) == len(plain)
    assert np.allclose(merged["bm25"], merged["score"])
    # hand-check one doc's features against the raw text
    import duckdb
    con = duckdb.connect()
    row = lf[lf.qid == 1].iloc[0]
    toks = con.execute(
        f"SELECT regexp_extract_all(lower(text), '[a-z0-9]+') FROM "
        f"'{SF}/documents.parquet' WHERE doc_id = {int(row.doc_id)}"
    ).fetchone()[0]
    assert row.dl == len(toks)
    tf_m, tf_s = toks.count("merge"), toks.count("sort")
    assert row.n_match == (tf_m > 0) + (tf_s > 0)
    assert row.max_tf == max(tf_m, tf_s)
    # a single-term query has n_match == 1 everywhere and
    # constant sum_idf
    q2 = lf[lf.qid == 2]
    assert (q2.n_match == 1).all()
    assert q2.sum_idf.nunique() == 1


def test_spellcheck_collate_semantics(ray_session):
    """spellcheck.collate: rank-sum candidate order, conjunctive
    re-run hit counts, zero-hit candidates dropped, known words pass
    through unchanged."""
    import duckdb
    from jesterj_ray.pipelines.flagship import spellcheck_collate
    col = spellcheck_collate(SF, "streem qery", 2, 3)
    assert len(col) >= 1
    assert col["rank"].tolist() == list(range(1, len(col) + 1))
    con = duckdb.connect()
    for _, row in col.iterrows():
        terms = row.collation.split()
        n = con.execute(
            f"""SELECT count(*) FROM (
              SELECT doc_id,
                     list_contains(regexp_extract_all(lower(text),
                                   '[a-z0-9]+'), ?) AND
                     list_contains(regexp_extract_all(lower(text),
                                   '[a-z0-9]+'), ?) AS m
              FROM '{SF}/documents.parquet') WHERE m""",
            terms).fetchone()[0]
        assert n == row.hits and n > 0
    # a known word passes through as itself
    col2 = spellcheck_collate(SF, "stream qery", 2, 3)
    assert all(c.split()[0] == "stream" for c in col2.collation)
    # hits ordering: candidate list is rank-sum ordered, so the head
    # collation uses both rank-1 suggestions when it has hits
    assert col.collation.iloc[0].split()[0] in ("stream",)


def test_global_shuffle_order_deterministic(ray_session):
    """Training-order shuffle: frozen mix_rank order, identical at any
    parallelism, matches the SQL oracle ordering."""
    import duckdb
    from jesterj_ray.pipelines.flagship import global_shuffle_order
    got = global_shuffle_order(SF).to_pandas()
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT doc_id,
            CAST(((doc_id % 1000003) * 2654435761
                  + doc_id % 1000000007) % 1000000007 AS BIGINT)
              AS shuffle_key
        FROM '{SF}/documents.parquet'
        ORDER BY shuffle_key, doc_id""").df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)
    # the order is a real permutation, not the input order
    assert got.doc_id.tolist() != sorted(got.doc_id.tolist())


def test_scoring_df_matches_served_idf(ray_session, tmp_path):
    """scoring_df (the LTR feature source) must reproduce the idf the
    scorer actually uses — on a DEFAULT index that is the as-built df
    even after deletes (Lucene semantics); deleting a doc must NOT
    silently change logged features away from served scores."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from jesterj_ray.index.bm25 import idf
    from jesterj_ray.index.build_rows import build_index_rows
    from jesterj_ray.index.query import IndexReader, delete_docs
    texts = ["alpha beta", "alpha gamma", "beta gamma", "alpha"]
    tab = pa.table({"doc_id": pa.array(list(range(4)), pa.int64()),
                    "content": pa.array(texts)})
    src = str(tmp_path / "c.parquet")
    pq.write_table(tab, src)
    out = str(tmp_path / "idx")
    build_index_rows(src, out, text_col="content", tokenizer="simple",
                     docs_per_partition=2, num_shards=2)
    rdr = IndexReader(out)
    assert rdr.scoring_df("alpha") == 3
    assert rdr.scoring_df("zzznot") == 0
    # delete an alpha doc: default (non-exact-stats) index keeps
    # as-built df in scoring — scoring_df must agree with the score
    docs, _ = rdr.postings("alpha")
    victim = rdr.doc_keys(docs[:1])[0]
    assert delete_docs(out, [victim]) == 1
    r2 = IndexReader(out)
    hits = r2.topk("alpha", 5)
    assert hits
    served_idf_times = hits[-1][1]  # lowest-tf alive doc's score
    df_used = r2.scoring_df("alpha")
    # reproduce the last hit's score from scoring_df components
    d, s = hits[-1]
    tf = dict(zip(*r2.postings("alpha")))[d]
    dl = r2.doc_len(np.array([d], dtype=np.int64))[0]
    expect = idf(r2.n_docs, df_used) * tf * (1.2 + 1.0) / (
        tf + 1.2 * (1 - 0.75 + 0.75 * dl / r2.avgdl))
    assert abs(s - expect) < 1e-12


def test_facet_multiselect_excludes_tagged_filter(ray_session):
    """Multi-select faceting: the tagged filter's own facet counts as
    if its fq were absent (all langs present); other facets apply the
    fq (source counts only over lang='en' matches)."""
    import duckdb
    from jesterj_ray.pipelines.flagship import facet_multiselect
    ms = facet_multiselect(SF, "dup stream", "lang", "en", "source")
    con = duckdb.connect()
    toks = ("SELECT doc_id, unnest(regexp_extract_all(lower(text), "
            "'[a-z0-9]+')) AS term FROM "
            f"'{SF}/documents.parquet'")
    langs = con.execute(
        f"""WITH t AS ({toks}), m AS (SELECT DISTINCT doc_id FROM t
            WHERE term IN ('dup','stream'))
        SELECT d.lang, count(*) FROM '{SF}/documents.parquet' d
        JOIN m USING (doc_id) GROUP BY d.lang""").fetchall()
    got_langs = ms[ms.facet == "lang"].set_index("value")["n"].to_dict()
    assert got_langs == {l: n for l, n in langs}
    assert len(got_langs) > 1  # the fq did NOT collapse its own facet
    srcs = con.execute(
        f"""WITH t AS ({toks}), m AS (SELECT DISTINCT doc_id FROM t
            WHERE term IN ('dup','stream'))
        SELECT d.source, count(*) FROM '{SF}/documents.parquet' d
        JOIN m USING (doc_id) WHERE d.lang = 'en'
        GROUP BY d.source""").fetchall()
    got_srcs = ms[ms.facet == "source"].set_index("value")["n"].to_dict()
    assert got_srcs == {s: n for s, n in srcs}
    # the applied leg counts strictly fewer docs than the excluded leg
    assert sum(got_srcs.values()) < sum(got_langs.values())
