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
    assert int(w0.n_events.iloc[0]) == 2 and float(w0.sum_value.iloc[0]) == 3.0
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
    assert int(u1.n_events.iloc[0]) == 2 and float(u1.sum_value.iloc[0]) == 3.0
    assert int(u1.n_events.iloc[1]) == 1
    u2 = df[df.user_id == 2]
    assert len(u2) == 1 and int(u2.n_events.iloc[0]) == 1
    assert u2.session_start.iloc[0] == u2.session_end.iloc[0]
