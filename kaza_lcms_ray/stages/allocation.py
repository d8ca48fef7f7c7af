"""Sampling-allocation statistics (SURVEY.md gap #4; reference:
src/misc/pt_calc_disprop.py:13-56): per-class reference-polygon area →
area shares → majority/minority classification → suggested
disproportional point allocation.

Exactness: per-polygon shoelace areas fold sequentially over the ring edges
(left fold ↔ SQL list_reduce) and are rounded to int64 at 1e-12 deg²
resolution, so the per-class sums — and the majority test
``area·K ≥ Σarea`` — are exact integer arithmetic, bit-identical to the
DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

AREA_SCALE = 1e12  # deg² → int64 units


def polygon_area_batch(t: pa.Table) -> pa.Table:
    """Per-polygon scaled outer-ring shoelace area (f.area() analog)."""
    rings = t.column("rings").to_pylist()
    out = np.empty(len(rings), dtype=np.int64)
    for i, poly in enumerate(rings):
        ring = np.array([[p["x"], p["y"]] for p in poly[0]])
        terms = ring[:-1, 0] * ring[1:, 1] - ring[1:, 0] * ring[:-1, 1]
        f = np.add.accumulate(terms)[-1] if terms.size else 0.0
        out[i] = np.int64(np.round((np.abs(f) * 0.5) * AREA_SCALE))
    return pa.table(
        {
            "LANDCOVER": t.column("LANDCOVER").cast(pa.int64()),
            "area_scaled": pa.array(out),
        }
    )


def poly_area_by_class(polygons_path: str, kind: str = "reference"):
    """Per-class total polygon area + majority flag (aggregate_histogram /
    area_by_class of pt_calc_disprop.py:24-56).

    Returns Dataset[LANDCOVER, area_scaled, is_majority] where is_majority
    = (class share ≥ mean share) ⟺ (area·n_classes ≥ total), exact ints.
    """
    import ray.data as rd

    from .zonal import bucketed_sum

    ds = bucketed_sum(
        rd.read_parquet(polygons_path)
        .filter(expr=f"kind == '{kind}'")
        .map_batches(polygon_area_batch, batch_format="pyarrow"),
        ["LANDCOVER"],
        ["area_scaled"],
        max_keys_hint=1 << 16,  # |classes| — tree reduce
    )

    def flag(t: pa.Table) -> pa.Table:
        a = t.column("area_scaled").to_numpy(zero_copy_only=False)
        return t.append_column(
            "is_majority", pa.array(a * np.int64(len(a)) >= a.sum())
        )

    # the aggregate is class-count-sized (≤ 8 rows): one block, one batch
    return ds.repartition(1).map_batches(flag, batch_format="pyarrow")


def disprop_allocation(
    area_df: pd.DataFrame, total_points: int, boost: float = 2.0, min_points: int = 10
) -> pd.DataFrame:
    """Suggested disproportional allocation: minority classes' area shares
    are boosted ×``boost`` before normalizing, every class gets at least
    ``min_points``, and counts use largest-remainder rounding so they sum
    exactly to ``total_points`` (deterministic).

    The reference script stops at the majority/minority classification
    ('if user provides multiplier for … disprop allocation',
    pt_calc_disprop.py:57-59); this completes that intent.
    """
    df = area_df.sort_values("LANDCOVER").reset_index(drop=True)
    share = df["area_scaled"] / df["area_scaled"].sum()
    weight = np.where(df["is_majority"], share, share * boost)
    weight = weight / weight.sum()
    raw = weight * total_points
    alloc = np.maximum(np.floor(raw).astype(int), min_points)
    # largest-remainder distribution of the leftover (may be negative when
    # min_points pushed the floor sum over total)
    leftover = total_points - int(alloc.sum())
    order = np.argsort(-(raw - np.floor(raw)), kind="stable")
    i = 0
    while leftover != 0 and i < 10 * len(alloc):
        j = order[i % len(alloc)]
        step = 1 if leftover > 0 else -1
        if alloc[j] + step >= min_points:
            alloc[j] += step
            leftover -= step
        i += 1
    return df.assign(share=share, suggested_points=alloc)


def polygon_centroid_batch(t: pa.Table) -> pa.Table:
    """Per-polygon outer-ring shoelace centroid (f.centroid() analog):
    Cx = Σ(xᵢ+xᵢ₊₁)·tᵢ / (3·Σtᵢ), tᵢ = xᵢyᵢ₊₁ − xᵢ₊₁yᵢ.  Both sums fold
    LEFT over the ring edges (numpy accumulate ↔ SQL list_reduce), and
    the centroid is a pinned two-operand division — the signed area
    cancels orientation, so no abs() is needed."""
    rings = t.column("rings").to_pylist()
    cx = np.empty(len(rings), dtype=np.float64)
    cy = np.empty(len(rings), dtype=np.float64)
    for i, poly in enumerate(rings):
        ring = np.array([[p["x"], p["y"]] for p in poly[0]])
        terms = ring[:-1, 0] * ring[1:, 1] - ring[1:, 0] * ring[:-1, 1]
        s = np.add.accumulate(terms)[-1] if terms.size else 0.0
        sx = (
            np.add.accumulate((ring[:-1, 0] + ring[1:, 0]) * terms)[-1]
            if terms.size
            else 0.0
        )
        sy = (
            np.add.accumulate((ring[:-1, 1] + ring[1:, 1]) * terms)[-1]
            if terms.size
            else 0.0
        )
        cx[i] = sx / (s * 3.0)
        cy[i] = sy / (s * 3.0)
    return pa.table(
        {
            "poly_id": t.column("poly_id"),
            "LANDCOVER": t.column("LANDCOVER").cast(pa.int64()),
            "cx": pa.array(cx),
            "cy": pa.array(cy),
        }
    )


def poly_centroids(polygons_path: str, kind: str = "reference"):
    """Per-polygon centroid table — the vector-side companion of
    :func:`poly_area_by_class` (reference: the polygon geometry utilities
    around src/misc/pt_calc_disprop.py).  Stateless per-polygon map over
    the small vector side input; Dataset[poly_id, LANDCOVER, cx, cy]."""
    import ray.data as rd

    return (
        rd.read_parquet(polygons_path)
        .filter(expr=f"kind == '{kind}'")
        .map_batches(polygon_centroid_batch, batch_format="pyarrow")
    )
