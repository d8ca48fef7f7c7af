"""Analytic DEM — the static ancillary side input (SURVEY.md S5/T5).

The reference joins static rasters (SRTM DEM, src/misc/sentinel1.py:82;
JRC water) into its pipelines.  The engine analog is a precomputed per-cell
elevation table built ONCE from a closed-form surface, broadcast via
``ray.put`` and looked up by cell id inside an actor pool
(stages/terrain.TerrainLookup) — the exact static-lookup-actor shape a real
DEM asset would use.  Because the surface is closed-form (sin/cos only —
bit-identical between numpy and DuckDB's libm), every derived quantity
(slope, aspect, terrain-corrected backscatter) is value-checked by the SQL
oracle, which recomputes the same elevations analytically.
"""

from __future__ import annotations

import numpy as np

from . import cells

# elevation in meters over (lon, lat) degrees; constants are arbitrary but
# FIXED — the oracle embeds the identical expression tree
E_A, E_FA = 300.0, 0.9
E_B, E_FB = 1.3, 7.0
E_C = 10.0


def elev(lon, lat):
    """e = (300·sin(0.9·lon))·cos(1.3·lat) + 10·sin(7·lon)."""
    return (E_A * np.sin(lon * E_FA)) * np.cos(lat * E_B) + E_C * np.sin(lon * E_FB)


def elev_sql(lon_expr: str, lat_expr: str) -> str:
    return (
        f"(({E_A!r} * sin(({lon_expr}) * {E_FA!r})) * cos(({lat_expr}) * {E_B!r})"
        f" + {E_C!r} * sin(({lon_expr}) * {E_FB!r}))"
    )


def build_dem(
    lon_min: float, lat_min: float, lon_max: float, lat_max: float,
    level: int, margin: int = 2,
) -> dict:
    """Precompute the per-cell elevation table over a bbox (+margin cells so
    every in-domain cell has all four finite-difference neighbors).
    Returns {"cell_ids": sorted int64, "elev": float64} for broadcast."""
    ix0, iy0 = cells.grid_coords(np.array([lon_min]), np.array([lat_min]), level)
    ix1, iy1 = cells.grid_coords(np.array([lon_max]), np.array([lat_max]), level)
    n = np.int64(1) << level
    xs = np.arange(max(0, ix0[0] - margin), min(int(n), ix1[0] + margin + 1))
    ys = np.arange(max(0, iy0[0] - margin), min(int(n), iy1[0] + margin + 1))
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    ids = cells.morton(gx.ravel(), gy.ravel())
    lon, lat = cells.cell_center(ids, level)
    order = np.argsort(ids)
    return {"cell_ids": ids[order], "elev": elev(lon, lat)[order]}
