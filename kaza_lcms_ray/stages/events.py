"""Tumbling-window aggregation over the events table.

Ray Data has no event-time window primitive; a tumbling window over bounded
batch data is exactly ``groupby(key, floor(ts / size))`` — implemented
two-phase (per-batch partial → combine), with only order-insensitive
statistics (count / min / max / exact integer sums) so results are
bit-stable and SQL-checkable.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Max, Min, Sum

KEYS = ["event_type", "window_start"]


def tumbling_window(ds, freq: str = "h"):
    """Dataset[events] → per (event_type, hour window): n, min/max value."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(window_start=df["ts"].dt.floor(freq))
        g = df.groupby(KEYS, as_index=False).agg(
            n=("event_id", "count"),
            min_value=("value", "min"),
            max_value=("value", "max"),
        )
        return g

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(KEYS)
        .aggregate(
            Sum("n", alias_name="n"),
            Min("min_value", alias_name="min_value"),
            Max("max_value", alias_name="max_value"),
        )
    )


def sliding_window(ds, width_hours: int = 2, slide_hours: int = 1):
    """Sliding windows as fan-out → tumbling combine: each event is mapped
    to the width/slide windows that contain it, then aggregated like a
    tumbling window.  Overlap factor = width/slide copies per event — the
    standard batch expression of a sliding window (no watermark state)."""
    assert width_hours % slide_hours == 0
    k = width_hours // slide_hours

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        base = df["ts"].dt.floor(f"{slide_hours}h")
        frames = []
        for off in range(k):
            frames.append(
                df.assign(window_start=base - pd.to_timedelta(off * slide_hours, "h"))
            )
        fan = pd.concat(frames, ignore_index=True)
        return fan.groupby(KEYS, as_index=False).agg(
            n=("event_id", "count"),
            min_value=("value", "min"),
            max_value=("value", "max"),
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(KEYS)
        .aggregate(
            Sum("n", alias_name="n"),
            Min("min_value", alias_name="min_value"),
            Max("max_value", alias_name="max_value"),
        )
    )


def sessionize(ds, gap_minutes: int = 30):
    """Gap-based sessionization per user — the stateful event-time window
    Ray Data lacks as a primitive, expressed as groupby(user).map_groups
    with a deterministic in-group sort (the documented partitioning
    assumption: one user's events fit one group).

    A new session starts when the gap to the previous event (ordered by
    ts, event_id) exceeds ``gap_minutes``.  Output per session: user_id,
    session_id (MIN event_id — order-free), session_start/end, n_events,
    value_cents (exact ×100 integer sum).  Every statistic is
    order-insensitive within the session, so results are bit-stable and
    SQL-checkable (lag + windowed running sum oracle).
    """
    import numpy as np

    gap = np.timedelta64(gap_minutes * 60 * 1_000_000, "us")

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy()
        brk = np.concatenate(([0], (np.diff(ts) > gap).astype(np.int64)))
        sid = np.cumsum(brk)
        cents = np.rint(g["value"].to_numpy() * 100.0).astype(np.int64)
        out = (
            pd.DataFrame(
                {
                    "user_id": g["user_id"].to_numpy(),
                    "sid": sid,
                    "event_id": g["event_id"].to_numpy(),
                    "ts": ts,
                    "cents": cents,
                }
            )
            .groupby(["user_id", "sid"], as_index=False)
            .agg(
                session_id=("event_id", "min"),
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                n_events=("event_id", "count"),
                value_cents=("cents", "sum"),
            )
        )
        return out.drop(columns=["sid"])

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
