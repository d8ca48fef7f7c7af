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


RAD = 0.017453292519943295  # float64 π/180 (np.deg2rad's multiplier)
DEG = 57.29577951308232  # float64 180/π


def _make_libm():
    import math

    return {
        "tan": lambda v: np.frompyfunc(math.tan, 1, 1)(v).astype(np.float64),
        "atan": lambda v: np.frompyfunc(math.atan, 1, 1)(v).astype(np.float64),
        "acos": lambda v: np.frompyfunc(math.acos, 1, 1)(v).astype(np.float64),
        "log10": lambda v: np.frompyfunc(math.log10, 1, 1)(
            np.where(v > 0, v, np.nan)
        ).astype(np.float64),
        "pow10": lambda v: np.frompyfunc(lambda x: math.pow(10.0, x), 1, 1)(v).astype(
            np.float64
        ),
    }


_LIBM = _make_libm()


def terrain_correct_batch(
    t: pa.Table,
    value_db_col: str,
    slope_col: str,
    aspect_col: str,
    incidence_deg: float = 35.0,
    heading_deg: float = 0.0,
    exact_libm: bool = False,
) -> pa.Table:
    """Full volumetric-model terrain correction (Vollrath/Reiche), mirroring
    src/misc/sentinel1.py:79-143 step for step:

      φ_r = φ_i − φ_s                    (radar heading − terrain aspect)
      α_r = atan(tan α_s · cos φ_r)       (slope steepness in range, eq. 2)
      α_az = atan(tan α_s · sin φ_r)      (slope steepness in azimuth, eq. 3)
      θ_lia = acos(cos α_az · cos(θ_i − α_r))   (local incidence, eq. 4)
      γ0 = σ0_natural / cos θ_i
      volModel = |tan(90° − θ_i + α_r) / tan(90° − θ_i)|
      γ0_volume = γ0 / volModel           (volumetric flattening)
      layover = α_r(deg) < θ_i(deg)       (False where slope ≥ view angle;
                                           sentinel1.py:133 semantics)
      shadow = θ_lia(deg) < 85            (False in radar shadow, :136)

    Adds: gamma0_vol_db, alpha_r_deg, theta_lia_deg, layover, shadow.
    """
    import math

    if exact_libm:
        # per-cell cardinality → libm ufuncs are affordable, and they are
        # bit-identical to DuckDB's std:: trig (numpy's SIMD tan/atan/acos/
        # pow/log10 differ in the last ulp — measured), so the SQL oracle
        # can replay the whole chain exactly
        tan_, atan_, acos_, log10_ = _LIBM["tan"], _LIBM["atan"], _LIBM["acos"], _LIBM["log10"]
        pow10_ = _LIBM["pow10"]
    else:
        tan_, atan_, acos_, log10_ = np.tan, np.arctan, np.arccos, np.log10
        pow10_ = lambda v: np.power(10.0, v)  # noqa: E731
    x_db = t.column(value_db_col).to_numpy(zero_copy_only=False)
    slope = t.column(slope_col).to_numpy(zero_copy_only=False) * RAD
    aspect = t.column(aspect_col).to_numpy(zero_copy_only=False)
    theta_i = incidence_deg * RAD
    cos_ti = math.cos(theta_i)  # scalar constants via libm (shared w/ SQL)
    tan_n = math.tan(math.pi / 2.0 - theta_i)
    phi_r = (heading_deg - aspect) * RAD
    alpha_r = atan_(tan_(slope) * np.cos(phi_r))
    alpha_az = atan_(tan_(slope) * np.sin(phi_r))
    theta_lia = acos_(np.cos(alpha_az) * np.cos(theta_i - alpha_r))
    sigma0 = pow10_(x_db / 10.0)
    gamma0 = sigma0 / cos_ti
    ninety = np.pi / 2.0
    with np.errstate(divide="ignore", invalid="ignore"):
        vol = np.abs(tan_(ninety - theta_i + alpha_r) / tan_n)
        gamma0_vol = gamma0 / vol
        out_db = 10.0 * log10_(gamma0_vol)
    alpha_r_deg = alpha_r * DEG
    theta_lia_deg = theta_lia * DEG
    return (
        t.append_column("gamma0_vol_db", pa.array(out_db))
        .append_column("alpha_r_deg", pa.array(alpha_r_deg))
        .append_column("theta_lia_deg", pa.array(theta_lia_deg))
        .append_column("layover", pa.array(alpha_r_deg < incidence_deg))
        .append_column("shadow", pa.array(theta_lia_deg < 85.0))
    )


# backwards-compatible alias (round-1 name; simplified model replaced by the
# full volumetric model above)
def terrain_flatten_batch(t, value_col, slope_col, aspect_col, look_azimuth_deg=0.0):
    return terrain_correct_batch(
        t, value_col, slope_col, aspect_col, heading_deg=look_azimuth_deg
    )


def compose_coalesce_batch(t: pa.Table, cols: list[str], out: str) -> pa.Table:
    """A11: first-non-null compose of masked variants (the reference's
    cat(masked…).reduce(sum) over DISJOINT masks, sentinel1.py:203-205 —
    with disjoint masks a sum of masked images IS a coalesce)."""
    import pyarrow.compute as pc

    return t.append_column(out, pc.coalesce(*[t.column(c) for c in cols]))


def refined_lee_batch(
    t: pa.Table, value_col: str, mean_col: str, var_col: str, enl: float = 7.0
) -> pa.Table:
    """The reference's speckleFilter regime compose (sentinel1.py:165-205):
    pure-speckle areas get the window mean, low-texture areas the refined
    estimate f, high-texture areas pass through — composed via coalesce of
    the three DISJOINT masked variants (A11).

      ci = √var / mean;  cu = 1/√enl;  cmax = √2·cu
      α = (1 + cu²) / (ci² − cu²);  b = α − enl − 1
      d = mean²·b² + 4·α·enl·mean·x;  f = (b·mean + √d) / (2α)
    """
    x = t.column(value_col).to_numpy(zero_copy_only=False)
    m = t.column(mean_col).to_numpy(zero_copy_only=False)
    v = t.column(var_col).to_numpy(zero_copy_only=False)
    cu = 1.0 / np.sqrt(enl)
    cmax = np.sqrt(2.0) * cu
    with np.errstate(divide="ignore", invalid="ignore"):
        ci = np.sqrt(np.maximum(v, 0.0)) / m
        alpha = (1.0 + cu * cu) / (ci * ci - cu * cu)
        b = alpha - (enl + 1.0)
        d = m * m * b * b + 4.0 * alpha * enl * m * x
        f = (b * m + np.sqrt(np.maximum(d, 0.0))) / (2.0 * alpha)
    pure = pa.array(np.where(ci <= cu, m, np.nan))
    low = pa.array(np.where((ci > cu) & (ci < cmax), f, np.nan))
    raw = pa.array(np.where(ci >= cmax, x, np.nan))
    import pyarrow.compute as pc

    masked = (
        t.append_column("_pure", _nan_to_null(pure))
        .append_column("_low", _nan_to_null(low))
        .append_column("_raw", _nan_to_null(raw))
    )
    out = compose_coalesce_batch(masked, ["_pure", "_low", "_raw"], "filtered")
    return out.drop_columns(["_pure", "_low", "_raw"])


def _nan_to_null(arr: pa.Array) -> pa.Array:
    import pyarrow.compute as pc

    return pc.if_else(pc.is_nan(arr), pa.scalar(None, pa.float64()), arr)
