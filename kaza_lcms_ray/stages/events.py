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
