"""Scale-shape pins for the per-user window family (r03 VERDICT #1/#2):

- the per-group Python callback count is bounded by num_groups, never by
  the user count (counted through a named probe actor the resolve hook
  increments from inside Ray workers — monkeypatching doesn't reach
  workers);
- the retention / distinct-users driver folds receive O(num_groups x
  cells) partial rows, never O(users).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray
import ray.data as rd

N_USERS = 200
N_GROUPS = 8


@ray.remote
class _CallCounter:
    def __init__(self):
        self.n = 0

    def inc(self):
        self.n += 1
        return self.n

    def get(self):
        return self.n


@pytest.fixture()
def events_dir(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    n = 4000
    users = rng.integers(0, N_USERS, n)
    # spread over ~3 days so multi-session users exist
    ts = np.datetime64("2024-01-01T00:00:00", "us") + \
        rng.integers(0, 3 * 86_400_000_000, n).astype("timedelta64[us]")
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(users, pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "event_type": pa.array(
            np.array(["signup", "click", "view", "purchase"], object)[
                rng.integers(0, 4, n)]),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    return str(d)


def _with_counter(fn, events_dir, name, **kw):
    ctr = _CallCounter.options(name=name).remote()
    ray.get(ctr.get.remote())  # ensure registered before workers look it up
    try:
        out = fn(events_dir, num_groups=N_GROUPS, probe_counter=name, **kw)
        return out, ray.get(ctr.get.remote())
    finally:
        ray.kill(ctr)


def test_sessionize_callbacks_bounded_by_groups(events_dir):
    from jesterj_ray.pipelines.relational import sessionize_events
    out, calls = _with_counter(sessionize_events, events_dir,
                               "probe_sessionize")
    assert len(out) == N_USERS > N_GROUPS
    assert 0 < calls <= N_GROUPS


def test_next_event_lag_callbacks_bounded_and_correct(events_dir):
    from jesterj_ray.pipelines.relational import next_event_lag
    out, calls = _with_counter(next_event_lag, events_dir, "probe_lag")
    assert 0 < calls <= N_GROUPS
    # every user contributes (count - 1) rows
    ev = pq.read_table(events_dir + "/events.parquet").to_pandas()
    expect = int((ev.groupby("user_id").size() - 1).sum())
    assert len(out) == expect
    # spot-check one user against a pandas LEAD: each row keys on the
    # EARLIER event's id, so join on event_id and compare gaps exactly
    g = ev[ev["user_id"] == 3].sort_values(["ts", "event_id"])
    gaps = pd.Series(
        ((g["ts"].to_numpy()[1:] - g["ts"].to_numpy()[:-1])
         // np.timedelta64(1, "us")).astype(np.int64),
        index=g["event_id"].to_numpy()[:-1])
    mine = out[out["user_id"] == 3].set_index("event_id")["gap_us"]
    assert mine.sort_index().equals(gaps.sort_index())


def test_session_stats_callbacks_bounded(events_dir):
    from jesterj_ray.pipelines.relational import session_stats
    out, calls = _with_counter(session_stats, events_dir, "probe_stats")
    assert len(out) == N_USERS
    assert 0 < calls <= N_GROUPS
    # single-pass invariants: max <= total, n_sessions >= 1
    assert (out["max_dur_us"] <= out["total_dur_us"]).all()
    assert (out["n_sessions"] >= 1).all()


def test_funnel_callbacks_bounded_and_no_per_user_rows(events_dir):
    from jesterj_ray.pipelines.relational import funnel_counts
    out, calls = _with_counter(funnel_counts, events_dir, "probe_funnel")
    assert 0 < calls <= N_GROUPS
    assert list(out["step"]) == [1, 2, 3]
    # monotone funnel
    assert (out["n_users"].to_numpy()[1:] <=
            out["n_users"].to_numpy()[:-1]).all()
    # parity with a pandas reference funnel
    ev = pq.read_table(events_dir + "/events.parquet").to_pandas()
    stages = ("signup", "click", "purchase")
    reached = np.zeros(len(stages) + 1, np.int64)
    for _, g in ev.groupby("user_id"):
        g = g.sort_values("ts")
        cur, r = None, 0
        for s in stages:
            m = (g["event_type"] == s) if cur is None else \
                ((g["event_type"] == s) & (g["ts"] > cur))
            if not m.any():
                break
            cur = g.loc[m, "ts"].min()
            r += 1
        reached[r] += 1
    expect = [int(reached[i + 1:].sum()) for i in range(len(stages))]
    assert list(out["n_users"]) == expect


def test_retention_fold_is_o_groups_not_o_users(events_dir):
    from jesterj_ray.pipelines.relational import (_retention_partials,
                                                  retention_cohorts)
    ds = rd.read_parquet(events_dir + "/events.parquet",
                         columns=["user_id", "ts"], override_num_blocks=8)
    parts = _retention_partials(ds, N_GROUPS).to_pandas()
    # 3-day span -> <= 2 cohort weeks x <= 2 offsets of cells per group
    assert len(parts) <= N_GROUPS * 4 < N_USERS
    out = retention_cohorts(events_dir, num_groups=N_GROUPS)
    # total cohort size at offset 0 = all users
    assert int(out[out["week_offset"] == 0]["n_users"].sum()) == N_USERS


def test_distinct_users_fold_is_o_groups_not_o_users(events_dir):
    from jesterj_ray.pipelines.relational import (_distinct_users_partials,
                                                  distinct_users_per_type)
    ds = rd.read_parquet(events_dir + "/events.parquet",
                         columns=["event_type", "user_id"],
                         override_num_blocks=8)
    parts = _distinct_users_partials(ds, N_GROUPS).to_pandas()
    assert len(parts) <= N_GROUPS * 4 < N_USERS  # 4 event types
    out = distinct_users_per_type(events_dir, num_groups=N_GROUPS)
    ev = pq.read_table(events_dir + "/events.parquet").to_pandas()
    expect = ev.groupby("event_type")["user_id"].nunique().sort_index()
    assert list(out["event_type"]) == list(expect.index)
    assert list(out["n_users"]) == list(expect.to_numpy())
