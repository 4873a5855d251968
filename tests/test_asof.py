"""asof_join semantics: backward inner as-of with exact matches, keyed.

Pins against a brute-force O(n*m) python oracle, plus the edge cases the
vectorized path must honor: exact-timestamp matches pair, left rows with
no prior right row drop, and right-side (by, on) ties fail loudly."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd
from jesterj_ray.pipelines.relational import asof_join


def _ts(us):
    return np.datetime64("2024-01-01", "us") + np.timedelta64(int(us), "us")


def make_sides(seed=5, n_left=300, n_right=400, n_keys=17):
    rng = np.random.default_rng(seed)
    lt = pa.table({
        "lid": pa.array(range(n_left), pa.int64()),
        "k": pa.array(rng.integers(0, n_keys, n_left), pa.int64()),
        "ts": pa.array([_ts(u) for u in
                        rng.choice(10_000_000, n_left, replace=False)],
                       pa.timestamp("us")),
        "lval": pa.array(rng.normal(size=n_left)),
    })
    rt = pa.table({
        "rid": pa.array(range(n_right), pa.int64()),
        "k": pa.array(rng.integers(0, n_keys, n_right), pa.int64()),
        "ts": pa.array([_ts(u) for u in
                        rng.choice(10_000_000, n_right, replace=False)],
                       pa.timestamp("us")),
    })
    return lt, rt


def brute(lt: pa.Table, rt: pa.Table):
    l, r = lt.to_pandas(), rt.to_pandas()
    rows = []
    for _, lr in l.iterrows():
        cand = r[(r["k"] == lr["k"]) & (r["ts"] <= lr["ts"])]
        if cand.empty:
            continue
        best = cand.sort_values("ts").iloc[-1]
        rows.append((lr["lid"], int(best["rid"])))
    return sorted(rows)


def test_asof_matches_bruteforce(ray_session):
    lt, rt = make_sides()
    out = asof_join(rd.from_arrow(lt), rd.from_arrow(rt),
                    on="ts", by="k", num_groups=8).to_pandas()
    got = sorted(zip(out["lid"].astype(int), out["rid_r"].astype(int)))
    assert got == brute(lt, rt)
    # matched right timestamp comes back and is never after the left's
    assert (out["ts_r"] <= out["ts"]).all()
    # left payload survives untouched
    lmap = dict(zip(lt["lid"].to_pylist(), lt["lval"].to_pylist()))
    assert all(abs(lmap[i] - v) < 1e-12
               for i, v in zip(out["lid"].astype(int), out["lval"]))


def test_asof_exact_match_and_no_match(ray_session):
    lt = pa.table({"lid": pa.array([0, 1], pa.int64()),
                   "k": pa.array([1, 1], pa.int64()),
                   "ts": pa.array([_ts(100), _ts(50)], pa.timestamp("us"))})
    rt = pa.table({"rid": pa.array([7], pa.int64()),
                   "k": pa.array([1], pa.int64()),
                   "ts": pa.array([_ts(100)], pa.timestamp("us"))})
    out = asof_join(rd.from_arrow(lt), rd.from_arrow(rt),
                    on="ts", by="k").to_pandas()
    # lid 0 pairs at the exact timestamp; lid 1 precedes every right row
    assert out["lid"].tolist() == [0]
    assert out["rid_r"].tolist() == [7]


def test_asof_right_ties_fail_loudly(ray_session):
    lt = pa.table({"lid": pa.array([0], pa.int64()),
                   "k": pa.array([1], pa.int64()),
                   "ts": pa.array([_ts(100)], pa.timestamp("us"))})
    rt = pa.table({"rid": pa.array([1, 2], pa.int64()),
                   "k": pa.array([1, 1], pa.int64()),
                   "ts": pa.array([_ts(60), _ts(60)], pa.timestamp("us"))})
    with pytest.raises(Exception, match="ties"):
        asof_join(rd.from_arrow(lt), rd.from_arrow(rt),
                  on="ts", by="k").to_pandas()


def test_range_join_matches_bruteforce(ray_session):
    from jesterj_ray.pipelines.relational import range_join
    lt, rt = make_sides(seed=9, n_left=250, n_right=250, n_keys=11)
    W = 500_000  # 0.5 s band over a 10 s spread: plenty of pairs
    out = range_join(rd.from_arrow(lt), rd.from_arrow(rt),
                     on="ts", by="k", max_gap_us=W,
                     num_groups=8).to_pandas()
    got = sorted(zip(out["lid"].astype(int), out["rid_r"].astype(int)))
    l, r = lt.to_pandas(), rt.to_pandas()
    want = []
    for _, lr in l.iterrows():
        gap = (r["ts"] - lr["ts"]) // np.timedelta64(1, "us")
        hit = r[(r["k"] == lr["k"]) & (gap > 0) & (gap <= W)]
        want += [(int(lr["lid"]), int(x)) for x in hit["rid"]]
    assert got == sorted(want)
    assert len(got) == len(set(got))  # no duplicate pairs from replicas


def test_range_join_boundaries(ray_session):
    """gap == max pairs; gap == 0 and gap > max do not; pairs that span a
    bucket boundary (left in bucket k, right in k+1) are found."""
    from jesterj_ray.pipelines.relational import range_join
    W = 1000
    lt = pa.table({"lid": pa.array([0, 1, 2, 3], pa.int64()),
                   "k": pa.array([1, 1, 1, 1], pa.int64()),
                   "ts": pa.array([_ts(100), _ts(200), _ts(999),
                                   _ts(5000)], pa.timestamp("us"))})
    rt = pa.table({"rid": pa.array([10, 11, 12], pa.int64()),
                   "k": pa.array([1, 1, 1], pa.int64()),
                   "ts": pa.array([_ts(1100), _ts(200), _ts(1999)],
                                  pa.timestamp("us"))})
    out = range_join(rd.from_arrow(lt), rd.from_arrow(rt),
                     on="ts", by="k", max_gap_us=W).to_pandas()
    got = sorted(zip(out["lid"].astype(int), out["rid_r"].astype(int)))
    # lid0(ts100): rid10 @1100 gap=1000 == W -> pair (crosses bucket 0->1);
    #              rid11 @200 gap=100 -> pair
    # lid1(ts200): rid11 gap=0 -> NO; rid10 gap=900 -> pair
    # lid2(ts999): rid10 gap=101 -> pair; rid12 @1999 gap=1000 -> pair
    # lid3(ts5000): nothing
    assert got == [(0, 10), (0, 11), (1, 10), (2, 10), (2, 12)]


def test_grouped_quantiles_match_duckdb_rule(ray_session):
    """Counting-sort quantiles == DuckDB quantile_disc on random grouped
    multisets (pins the exact ceil(q*n) 1-based index rule, ties-low,
    across group sizes 1..40 including heavy duplicates)."""
    import duckdb
    from jesterj_ray.pipelines.relational import grouped_quantiles
    rng = np.random.default_rng(21)
    ks, vs = [], []
    for k in range(12):
        sz = int(rng.integers(1, 41))
        ks += [k] * sz
        vs += rng.integers(0, 12, sz).tolist()  # heavy ties
    t = pa.table({"k": pa.array(ks, pa.int64()),
                  "v": pa.array(vs, pa.int64())})
    got = grouped_quantiles(rd.from_arrow(t), "k", "v")
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    want = con.execute(
        "SELECT k, quantile_disc(v, 0.25), quantile_disc(v, 0.5), "
        "quantile_disc(v, 0.75) FROM t GROUP BY k ORDER BY k").fetchall()
    got = got.sort_values("k").reset_index(drop=True)
    assert [(int(r["k"]), int(r["q1_4"]), int(r["q1_2"]), int(r["q3_4"]))
            for _, r in got.iterrows()] == [tuple(map(int, w)) for w in want]


def test_cogroup_joins_preserve_huge_int64_ids(ray_session):
    """Ids >= 2^53 survive the cogroup joins exactly: each side converts
    to pandas only over its OWN rows (null-free), and pairing is
    positional — so int64 never degrades through float64 (r03 review)."""
    from jesterj_ray.pipelines.relational import asof_join, range_join
    base = (1 << 53) + 1  # not representable in float64
    lt = pa.table({"lid": pa.array([base, base + 2], pa.int64()),
                   "k": pa.array([1, 1], pa.int64()),
                   "ts": pa.array([_ts(500), _ts(900)],
                                  pa.timestamp("us"))})
    rt = pa.table({"rid": pa.array([base + 1, base + 3], pa.int64()),
                   "k": pa.array([1, 1], pa.int64()),
                   "ts": pa.array([_ts(400), _ts(800)],
                                  pa.timestamp("us"))})
    out = asof_join(rd.from_arrow(lt), rd.from_arrow(rt),
                    on="ts", by="k").to_pandas()
    assert sorted(zip(out["lid"], out["rid_r"])) == \
        [(base, base + 1), (base + 2, base + 3)]
    assert out["lid"].dtype == np.int64 and out["rid_r"].dtype == np.int64
    out2 = range_join(rd.from_arrow(lt), rd.from_arrow(rt),
                      on="ts", by="k", max_gap_us=10_000).to_pandas()
    # right AFTER left within gap: (base@500 -> base+3@800)
    assert sorted(zip(out2["lid"], out2["rid_r"])) == [(base, base + 3)]
    assert out2["lid"].dtype == np.int64


def test_funnel_counts_ordering(ray_session, tmp_path):
    """Funnel requires the strictly-increasing first-qualifying chain:
    a purchase BEFORE the click doesn't count, a click before the
    signup doesn't, equal timestamps don't advance (strict >)."""
    import pyarrow.parquet as pq
    from jesterj_ray.pipelines.relational import funnel_counts

    def ev(uid, us, typ):
        return {"user_id": uid, "event_id": len(rows),
                "ts": np.datetime64("2024-01-01", "us")
                + np.timedelta64(us, "us"), "event_type": typ,
                "value": 0.0, "props": "{}"}
    rows = []
    # u1: full ordered funnel
    for us, t in [(1, "signup"), (2, "click"), (3, "purchase")]:
        rows.append(ev(1, us, t))
    # u2: purchase precedes click -> stops at click
    for us, t in [(1, "signup"), (3, "click"), (2, "purchase")]:
        rows.append(ev(2, us, t))
    # u3: click precedes signup -> stops at signup
    for us, t in [(2, "signup"), (1, "click")]:
        rows.append(ev(3, us, t))
    # u4: click at the SAME instant as signup -> strict > rejects it
    for us, t in [(5, "signup"), (5, "click")]:
        rows.append(ev(4, us, t))
    # u5: no signup at all -> reaches nothing
    rows.append(ev(5, 1, "click"))
    t = pa.table({k: pa.array([r[k] for r in rows])
                  for k in ("event_id", "ts", "user_id", "event_type",
                            "value", "props")})
    d = str(tmp_path / "sf")
    import os
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = funnel_counts(d)
    assert out["stage"].tolist() == ["signup", "click", "purchase"]
    assert out["n_users"].tolist() == [4, 2, 1]


def test_session_stats_shapes(ray_session, tmp_path):
    """Sessions split strictly-greater than the gap; durations are exact
    integer microseconds; single-event sessions count with duration 0."""
    import os
    import pyarrow.parquet as pq
    from jesterj_ray.pipelines.relational import session_stats
    base = np.datetime64("2024-01-01", "us")
    rows = []
    def ev(uid, sec):
        rows.append({"user_id": uid, "event_id": len(rows),
                     "ts": base + np.timedelta64(sec, "s"),
                     "event_type": "view", "value": 0.0, "props": "{}"})
    # u1: [0, 100, 1900] one session (gaps 100s, 1800s == gap NOT >) then
    # +1801s -> new single-event session
    for s in (0, 100, 1900, 3701):
        ev(1, s)
    # u2: one event
    ev(2, 7)
    t = pa.table({k: pa.array([r[k] for r in rows])
                  for k in ("event_id", "ts", "user_id", "event_type",
                            "value", "props")})
    d = str(tmp_path / "sf"); os.makedirs(d)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = session_stats(d)
    r1 = out[out["user_id"] == 1].iloc[0]
    assert r1["n_sessions"] == 2
    assert r1["total_dur_us"] == 1900 * 1_000_000
    assert r1["max_dur_us"] == 1900 * 1_000_000
    r2 = out[out["user_id"] == 2].iloc[0]
    assert (r2["n_sessions"], r2["total_dur_us"], r2["max_dur_us"]) \
        == (1, 0, 0)


def test_retention_cohorts_week_anchor(ray_session, tmp_path):
    """Week truncation is Monday-anchored like DuckDB date_trunc('week')
    (1970-01-01 truncates to 1969-12-29); offsets are exact week
    integers; a user active in cohort week and week+2 produces cells
    (0: yes, 1: no, 2: yes)."""
    import os
    import pyarrow.parquet as pq
    from jesterj_ray.pipelines.relational import retention_cohorts
    def ts(day, hour=12):
        return (np.datetime64("2024-01-01", "us")  # a Monday
                + np.timedelta64(day, "D") + np.timedelta64(hour, "h"))
    rows = []
    def ev(uid, t):
        rows.append({"user_id": uid, "event_id": len(rows), "ts": t,
                     "event_type": "view", "value": 0.0, "props": "{}"})
    ev(1, ts(0)); ev(1, ts(6, 23))   # same Monday-week
    ev(1, ts(15))                     # week offset 2
    ev(2, ts(3)); ev(2, ts(8))        # cohort wk0, active offset 0 and 1
    d = str(tmp_path / "sf"); os.makedirs(d)
    t = pa.table({k: pa.array([r[k] for r in rows])
                  for k in ("event_id", "ts", "user_id", "event_type",
                            "value", "props")})
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = retention_cohorts(d)
    assert out["cohort_week"].nunique() == 1
    assert str(out["cohort_week"].iloc[0])[:10] == "2024-01-01"
    cells = dict(zip(out["week_offset"], out["n_users"]))
    assert cells == {0: 2, 1: 1, 2: 1}


def test_retention_week_floor_pre1970(ray_session, tmp_path):
    """Pre-1970 timestamps floor to the correct Monday (truncating
    division would shift them a week forward; r03 review)."""
    import os
    import duckdb
    import pyarrow.parquet as pq
    from jesterj_ray.pipelines.relational import retention_cohorts
    rows = []
    for i, d in enumerate(["1969-12-28T12:00:00",   # Sunday pre-epoch
                           "1969-12-29T01:00:00",   # Monday
                           "1970-01-04T23:00:00"]):
        rows.append({"user_id": 1, "event_id": i,
                     "ts": np.datetime64(d, "us"), "event_type": "view",
                     "value": 0.0, "props": "{}"})
    t = pa.table({k: pa.array([r[k] for r in rows])
                  for k in ("event_id", "ts", "user_id", "event_type",
                            "value", "props")})
    d = str(tmp_path / "sf"); os.makedirs(d)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    out = retention_cohorts(d)
    con = duckdb.connect()
    want = con.execute(
        "SELECT CAST(date_trunc('week', TIMESTAMP '1969-12-28 12:00:00') "
        "AS TIMESTAMP)").fetchone()[0]
    assert out["cohort_week"].iloc[0].to_pydatetime() == want
    # Sunday 12-28 is in week 12-22; Mon 12-29 + Sun 01-04 in week 12-29
    assert dict(zip(out["week_offset"], out["n_users"])) == {0: 1, 1: 1}
