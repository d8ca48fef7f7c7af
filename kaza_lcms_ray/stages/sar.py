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


def lee_sigma(ds, value_col: str, level: int, radius: int = 1, sigma_v: float = 0.9):
    """Lee-style speckle filter: x̂ = m + k·(x − m) with k from local
    mean/variance over the (2r+1)² window (sentinel1.py:182-205 semantics
    over our cell grid).  Returns Dataset[cell_id, value, filtered].

    The per-cell input and the focal statistics all grow with CELLS (not
    documents), so the final combine is a driver-side merge — two chained
    distributed hash joins here would cost more in shuffle setup than the
    tables weigh, and their aggregator pools contend on small sessions.
    """
    from .focal import focal

    m = focal(ds, value_col, "mean", radius, level).to_pandas()
    v = focal(ds, value_col, "var", radius, level).to_pandas()
    base = ds.to_pandas()
    merged = base.merge(
        m.rename(columns={"focal_mean": "local_mean"}), on="cell_id"
    ).merge(v.rename(columns={"focal_var": "local_var"}), on="cell_id")
    x = merged[value_col].to_numpy()
    m_ = merged["local_mean"].to_numpy()
    v_ = merged["local_var"].to_numpy()
    # k = var_signal / (var_signal + noise), noise ∝ (sigma_v·mean)²
    noise = (sigma_v * m_) ** 2 * 0.1
    with np.errstate(divide="ignore", invalid="ignore"):
        k = np.where(v_ + noise > 0, v_ / (v_ + noise), 0.0)
    merged["filtered"] = m_ + k * (x - m_)
    import ray.data as rd

    return rd.from_pandas(merged)


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
