"""Event-stream operators: tumbling-window aggregation and gap-based
sessionization, Ray-Data-first.

The reference is strictly batch with no windowing (SURVEY §2.9); these
are the engine's window/stateful additions for log/event workloads, both
ANSI-SQL-expressible so the driver value-checks them against DuckDB.

Partitioning notes (scale):
* Tumbling windows need NO shuffle beyond the final small groupby — the
  window key is computed per batch (vectorized timestamp floor) and the
  aggregate's key cardinality is (windows × event types), tiny compared
  to rows.
* Sessionization's only correct partitioning key is ``user_id`` (a
  session never spans users).  The groupby shuffles narrow columns only;
  per-group work is a vectorized diff/cumsum, not a Python row loop.
  Hot users (bots) are the skew risk at web scale — the same salting
  machinery as head terms applies if one user exceeds a group budget,
  at the cost of splitting that user's sessions at salt boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data.aggregate import Count, Sum

WINDOW_MINUTES = 60
SESSION_GAP_MINUTES = 30


def _events(sf_dir: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def windowed_event_counts(sf_dir: str) -> rd.Dataset:
    """Per (1-hour tumbling window, event_type): event count and value
    sum.  Window assignment is a vectorized integer floor inside
    map_batches; only the tiny (window, type) aggregate shuffles."""
    win_us = WINDOW_MINUTES * 60 * 1_000_000

    def assign(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        win = (ts // win_us) * win_us
        return pa.table({
            "window_start": pa.array(win).cast(pa.timestamp("us")),
            "event_type": batch["event_type"],
            "value": batch["value"],
        })

    agg = (
        _events(sf_dir, ["ts", "event_type", "value"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby(["window_start", "event_type"])
        .aggregate(Count(alias_name="n_events"),
                   Sum("value", alias_name="sum_value"))
    )

    def round6(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(
            batch.schema.get_field_index("sum_value"), "sum_value",
            pc.round(batch["sum_value"], ndigits=6),
        )

    return agg.map_batches(round6, batch_format="pyarrow")


def user_sessions(sf_dir: str) -> rd.Dataset:
    """Gap-based sessionization: consecutive events of a user belong to
    one session while the gap stays ≤ SESSION_GAP_MINUTES.  Emits one row
    per session with start/end, count and value sum."""
    gap = np.timedelta64(SESSION_GAP_MINUTES * 60 * 1_000_000, "us")

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy()
        new_s = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_s[1:] = (ts[1:] - ts[:-1]) > gap
        sid = np.cumsum(new_s)
        out = g.groupby(sid).agg(
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("ts", "size"),
            sum_value=("value", "sum"),
        ).reset_index(drop=True)
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value"] = out["sum_value"].round(6)
        return out

    return (
        _events(sf_dir, ["event_id", "user_id", "ts", "value"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pandas")
    )
