"""SAR-style kernels: dB↔linear, band ratio, Lee-sigma speckle filter,
simplified terrain flattening (SURVEY.md M17-M19, A11).

Reference analogs (src/misc/sentinel1.py): ``toNatural``/``toDB`` (:207-221),
``addRatio`` VH/VV (:217-221), 3×3 kernel mean/variance Lee-sigma speckle
compose (:165-205), volumetric-model terrain correction (:79-143).  Our data
model has no real SAR scenes, so these are generic engine kernels over any
(cell grid, value) dataset: the per-record math is plain vectorized batch
kernels; the windowed statistics reuse the focal stage (halo-exchange
blocks); the compose step is a coalesce (Reducer.sum of masked variants →
``pc.coalesce``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def to_natural_batch(t: pa.Table, col: str, out: str = "natural") -> pa.Table:
    """dB → linear power: 10^(x/10) (sentinel1.py:209)."""
    x = t.column(col).to_numpy(zero_copy_only=False)
    return t.append_column(out, pa.array(np.power(10.0, x / 10.0)))


def to_db_batch(t: pa.Table, col: str, out: str = "db") -> pa.Table:
    """linear → dB: 10·log10(x) (sentinel1.py:215)."""
    x = t.column(col).to_numpy(zero_copy_only=False)
    with np.errstate(divide="ignore"):
        return t.append_column(out, pa.array(10.0 * np.log10(x)))


def add_ratio_batch(t: pa.Table, num: str, den: str, out: str = "ratio") -> pa.Table:
    """Band ratio (VH/VV analog, sentinel1.py:217-221)."""
    a = t.column(num).to_numpy(zero_copy_only=False)
    b = t.column(den).to_numpy(zero_copy_only=False)
    with np.errstate(divide="ignore", invalid="ignore"):
        return t.append_column(out, pa.array(a / b))


def lee_sigma(
    ds,
    value_col: str,
    level: int,
    radius: int = 1,
    sigma_v: float = 0.9,
    block_bits: int = 5,
):
    """Lee-style speckle filter: x̂ = m + k·(x − m) with k from local
    mean/variance over the (2r+1)² window (sentinel1.py:182-205 semantics
    over our cell grid).  Returns Dataset[cell_id, value, filtered].

    ONE distributed pass: the halo-exchange block fanout (stages/focal.py)
    scatters each cell + halo into its block, and a single map_groups per
    block computes window count/sum/sum-of-squares AND the filter algebra —
    no joins, no driver-side materialization (the round-1 version merged
    three focal outputs on the driver, which dies at continental cell
    counts).  When the input values are integers (e.g. scaled-cent sums),
    every window sum is exact in float64, so the result is bit-identical
    under any partitioning and reproducible by the DuckDB oracle.
    """
    import pandas as pd

    from .focal import block_fanout

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        from ..state import cells

        ix = g["ix"].to_numpy()
        iy = g["iy"].to_numpy()
        v = g["v"].to_numpy()
        home = g["home"].to_numpy()
        x0, y0 = ix.min(), iy.min()
        w = int(ix.max() - x0) + 1
        h = int(iy.max() - y0) + 1
        # integer grids: window sums of v and v² stay EXACT in int64 (v² for
        # large aggregates exceeds 2^53, where float accumulation becomes
        # order-dependent); one cast to float64 afterwards matches the
        # oracle's CAST(SUM(...) AS DOUBLE).  (int64 bound: |v| < 3·10⁹.)
        gi = np.zeros((w, h), dtype=np.int64)
        gi[ix - x0, iy - y0] = v.astype(np.int64)
        present = np.zeros((w, h), dtype=np.int64)
        present[ix - x0, iy - y0] = 1

        def shifts(arr):
            acc = np.zeros_like(arr)
            for dx in range(-radius, radius + 1):
                for dy in range(-radius, radius + 1):
                    sh = np.zeros_like(arr)
                    xs = slice(max(0, dx), w + min(0, dx))
                    xd = slice(max(0, -dx), w + min(0, -dx))
                    ys = slice(max(0, dy), h + min(0, dy))
                    yd = slice(max(0, -dy), h + min(0, -dy))
                    sh[xd, yd] = arr[xs, ys]
                    acc = acc + sh
            return acc

        cnt = shifts(present).astype(np.float64)
        s1 = shifts(gi).astype(np.float64)
        s2 = shifts(gi * gi).astype(np.float64)
        grid = gi.astype(np.float64)
        cntc = np.maximum(cnt, 1.0)
        m = s1 / cntc
        var = s2 / cntc - m * m
        noise = (sigma_v * m) * (sigma_v * m) * 0.1
        with np.errstate(divide="ignore", invalid="ignore"):
            k = np.where(var + noise > 0, var / (var + noise), 0.0)
        filt = m + k * (grid - m)
        hx, hy = ix[home], iy[home]
        return pd.DataFrame(
            {
                "cell_id": cells.morton(hx, hy),
                "value": grid[hx - x0, hy - y0],
                "filtered": filt[hx - x0, hy - y0],
            }
        )

    return (
        block_fanout(ds, value_col, radius, level, block_bits)
        .groupby("block")
        .map_groups(per_block, batch_format="pandas")
        .select_columns(["cell_id", "value", "filtered"])
    )


def terrain_flatten_batch(
    t: pa.Table, value_col: str, slope_col: str, aspect_col: str, look_azimuth_deg: float = 0.0
) -> pa.Table:
    """Simplified volumetric-model terrain flattening: scale backscatter by
    the local-incidence geometry, flag layover/shadow where the correction
    is undefined (sentinel1.py:98-143 semantics, cosine model).
    Adds: flattened (f64), layover (bool), shadow (bool)."""
    x = t.column(value_col).to_numpy(zero_copy_only=False)
    slope = np.deg2rad(t.column(slope_col).to_numpy(zero_copy_only=False))
    aspect = np.deg2rad(t.column(aspect_col).to_numpy(zero_copy_only=False))
    look = np.deg2rad(look_azimuth_deg)
    inc = np.deg2rad(35.0)  # nominal incidence angle
    # local incidence: cos θ_loc = cos(slope)·cos(inc) + sin(slope)·sin(inc)·cos(aspect − look)
    cos_loc = np.cos(slope) * np.cos(inc) + np.sin(slope) * np.sin(inc) * np.cos(aspect - look)
    layover = cos_loc > np.cos(inc - slope.clip(max=inc))  # toward-sensor steep slopes
    shadow = cos_loc <= 0.0
    with np.errstate(divide="ignore", invalid="ignore"):
        flat = np.where(shadow, np.nan, x * (np.cos(inc) / np.clip(cos_loc, 1e-9, None)))
    return (
        t.append_column("flattened", pa.array(flat))
        .append_column("layover", pa.array(layover))
        .append_column("shadow", pa.array(shadow))
    )
