"""Windowed aggregation + sessionization semantics on crafted event sets
(the SQL oracle covers the sf tables; these pin edge cases)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows):
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([np.datetime64(r[1], "us") for r in rows],
                       type=pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[3] for r in rows], type=pa.string()),
        "value": pa.array([r[4] for r in rows], type=pa.float64()),
        "props": pa.array(["{}"] * len(rows), type=pa.string()),
    })
    pq.write_table(t, f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_tumbling_windows(ray_session, tmp_path):
    from pdfsearch_ray.pipelines.events import windowed_event_counts

    rows = [
        (0, "2024-01-01T00:05:00", 1, "click", 1.0),
        (1, "2024-01-01T00:59:59.999999", 1, "click", 2.0),
        (2, "2024-01-01T01:00:00", 1, "click", 4.0),   # next window edge
        (3, "2024-01-01T00:30:00", 2, "view", 8.0),
    ]
    d = _write_events(tmp_path, rows)
    df = windowed_event_counts(d).to_pandas().sort_values(
        ["window_start", "event_type"]).reset_index(drop=True)
    assert len(df) == 3
    w0 = df[(df.event_type == "click") &
            (df.window_start == pd.Timestamp("2024-01-01T00:00:00"))]
    assert int(w0.n_events.iloc[0]) == 2 and int(w0.sum_value_cents.iloc[0]) == 300
    w1 = df[(df.event_type == "click") &
            (df.window_start == pd.Timestamp("2024-01-01T01:00:00"))]
    assert int(w1.n_events.iloc[0]) == 1


def test_sessionization_gap_edges(ray_session, tmp_path):
    from pdfsearch_ray.pipelines.events import user_sessions

    rows = [
        # user 1: gap exactly 30min stays in-session; 30min+1us splits
        (0, "2024-01-01T00:00:00", 1, "a", 1.0),
        (1, "2024-01-01T00:30:00", 1, "a", 2.0),
        (2, "2024-01-01T01:00:00.000001", 1, "a", 4.0),
        # user 2: single event
        (3, "2024-01-01T05:00:00", 2, "b", 8.0),
    ]
    d = _write_events(tmp_path, rows)
    df = user_sessions(d).to_pandas().sort_values(
        ["user_id", "session_start"]).reset_index(drop=True)
    u1 = df[df.user_id == 1]
    assert len(u1) == 2
    assert int(u1.n_events.iloc[0]) == 2 and int(u1.sum_value_cents.iloc[0]) == 300
    assert int(u1.n_events.iloc[1]) == 1
    u2 = df[df.user_id == 2]
    assert len(u2) == 1 and int(u2.n_events.iloc[0]) == 1
    assert u2.session_start.iloc[0] == u2.session_end.iloc[0]


def test_asof_block_semantics():
    """Hand-checked as-of edges: inclusive ts match, (user,ts) tie by max
    event_id, per-user isolation, no-match sentinel."""
    import pyarrow as pa

    from pdfsearch_ray.pipelines.events import asof_block

    ts = pa.array([100, 200, 200, 300, 150], type=pa.timestamp("us"))
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "user_id": pa.array([7, 7, 7, 7, 9], type=pa.int64()),
        "ts": ts,
        "event_type": pa.array(
            ["purchase", "purchase", "purchase", "view", "view"]),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], type=pa.float64()),
    })
    out = asof_block(t, "purchase")
    by_eid = {r["event_id"]: r for r in out.to_pylist()}
    # event 1 at ts=100 matches itself (inclusive >=)
    assert by_eid[1]["ref_event_id"] == 1
    # events 2,3 share ts=200: tie resolves to max event_id (3)
    assert by_eid[2]["ref_event_id"] == 3
    assert by_eid[3]["ref_event_id"] == 3
    # event 4 at ts=300: most recent purchase is the deduped ts=200 -> 3
    assert by_eid[4]["ref_event_id"] == 3 and by_eid[4]["ref_value"] == 3.0
    # user 9 has no purchases: sentinel
    assert by_eid[5]["ref_event_id"] == -1 and by_eid[5]["ref_value"] == -1.0


def test_asof_join_events_distributed_matches_block(ray_session):
    """The bucketed distributed pass equals one asof_block over the whole
    table (partitioning by user is lossless for a user-keyed asof)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfsearch_ray.pipelines.events import asof_block, asof_join_events

    sf = "/root/testdata/sf0.001"
    whole = pq.read_table(
        f"{sf}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type", "value"])
    want = asof_block(whole, "purchase").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    got = asof_join_events(sf).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert want.equals(got[want.columns.tolist()])


def test_asof_block_property_vs_bruteforce():
    """Property: asof_block equals the O(n²) definition on random event
    tables (ties, duplicate timestamps, users with no refs, empty)."""
    import numpy as np
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pdfsearch_ray.pipelines.events import asof_block

    @settings(max_examples=60, deadline=None)
    @given(st.lists(
        st.tuples(st.integers(0, 3),          # user
                  st.integers(0, 20),         # ts (us, small => many ties)
                  st.booleans()),             # is reference type
        min_size=0, max_size=40))
    def check(rows):
        n = len(rows)
        eid = list(range(1, n + 1))
        t = pa.table({
            "event_id": pa.array(eid, type=pa.int64()),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "event_type": pa.array(
                ["purchase" if r[2] else "view" for r in rows]),
            "value": pa.array([float(i) for i in eid], type=pa.float64()),
        })
        got = {r["event_id"]: (r["ref_event_id"], r["ref_value"])
               for r in asof_block(t, "purchase").to_pylist()}
        for i, (u, ts, _) in enumerate(rows):
            # brute force: among purchase rows of the same user with
            # ts' <= ts, pick max ts'; tie -> max event_id
            cands = [(ts2, j + 1) for j, (u2, ts2, p2) in enumerate(rows)
                     if p2 and u2 == u and ts2 <= ts]
            if cands:
                want_eid = max(cands)[1]
                assert got[i + 1] == (want_eid, float(want_eid)), (rows, i)
            else:
                assert got[i + 1] == (-1, -1.0), (rows, i)

    check()


def test_asof_block_many_users_no_cross_match():
    """Regression: >2^18 distinct users in one block must not cross-match
    (the old fixed-46-bit key packing overflowed int64 and silently
    joined user 2^18 to user 0)."""
    import numpy as np
    import pyarrow as pa

    from pdfsearch_ray.pipelines.events import asof_block

    n = (1 << 18) + 4
    t = pa.table({
        "event_id": pa.array(np.arange(1, n + 1), type=pa.int64()),
        "user_id": pa.array(np.arange(n), type=pa.int64()),
        "ts": pa.array(np.full(n, 1000), type=pa.timestamp("us")),
        "event_type": pa.array(["purchase"] + ["view"] * (n - 1)),
        "value": pa.array(np.ones(n), type=pa.float64()),
    })
    out = asof_block(t, "purchase").to_pylist()
    assert out[0]["ref_event_id"] == 1
    assert all(r["ref_event_id"] == -1 for r in out[1:])


def test_funnel_greedy_first_match_planted(ray_session, tmp_path):
    """Planted funnel geometry: greedy first-match semantics — a user
    whose FIRST view is followed by a click inside the horizon
    converts; a user whose only in-order chain starts at a LATER view
    does not (greedy anchors at the first step-1 event)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdfsearch_ray.pipelines.events import funnel_counts

    H = 3_600_000_000  # 1 hour in us
    base = 1_700_000_000_000_000
    rows = [
        # user 1: view -> click (+10m) -> purchase (+20m): full convert
        (1, base, "view"), (1, base + H // 6, "click"),
        (1, base + H // 3, "purchase"),
        # user 2: first view, click arrives AFTER the 24h horizon
        (2, base, "view"), (2, base + 25 * 24 * H, "click"),
        # user 3: click BEFORE the first view only: no step 2
        (3, base, "click"), (3, base + H, "view"),
        # user 4: view then click, purchase before click: stops at 2
        (4, base, "view"), (4, base + H, "click"),
        (4, base + H // 2, "purchase"),
    ]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array([r[1] for r in rows],
                       type=pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[2] for r in rows], type=pa.string()),
        "value": pa.array([1.0] * len(rows), type=pa.float64()),
        "props": pa.array(["{}"] * len(rows), type=pa.string()),
    })
    pq.write_table(t, os.path.join(tmp_path, "events.parquet"))
    out = funnel_counts(str(tmp_path)).to_pandas().set_index("step")
    assert out.loc[1, "n_users"] == 4      # all four users view... (3 views late)
    assert out.loc[2, "n_users"] == 2      # users 1 and 4
    assert out.loc[3, "n_users"] == 1      # user 1 only
    # exact integer lag sums from step 1
    assert out.loc[2, "sum_lag_us"] == H // 6 + H
    assert out.loc[3, "sum_lag_us"] == H // 3
