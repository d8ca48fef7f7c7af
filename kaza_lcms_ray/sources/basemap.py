"""Third catalog source: the Planet/NICFI basemap analog (SURVEY.md S1's
third collection; reference src/misc/02planet.py).

The reference reads a THIRD image catalog — the NICFI monthly basemaps
(``projects/planet-nicfi/assets/basemaps/africa``) with its own band set
(B, G, R, N), filters it to one calendar year (``calendarRange``), maps
NDVI / NDWI / SAVI(L=0.5) over each monthly image (02planet.py:12-23),
flattens the monthly collection with ``toBands()``, adds topography, and
clips to the AOI buffered by 5 km before export (02planet.py:32-45).

Engine analog, Ray-Data-first:
  * the catalog read = geo spans restricted to the basemap's band subset
    (B,G,R,N = catalog bands 0..3) and to one year — the filter runs in the
    same fused Arrow parse pass, so no second scan of the documents table;
  * a monthly image = the exact integer-cents mean composite of each band
    over a (cell, month) group — two-phase partial sums (zonal.bucketed_sum)
    so the shuffle carries one skinny row per (cell, month) per block, never
    raw observations;
  * per-image indices = NDVI/NDWI/SAVI computed from the composite means
    with the same left-associated expression tree the SQL oracle evaluates;
  * addTopography = the broadcast static-DEM lookup actor
    (stages/terrain.TerrainLookup) reused as-is;
  * clip(aoi.buffer()) = a vectorized bbox filter with an explicit buffer
    margin applied BEFORE the shuffle, so clipped-away observations never
    leave the parse stage.

The output is the "long" layout — one row per (cell, month) with 4 bands +
3 indices + 3 topography columns.  The reference's ``toBands()`` flatten is
a pivot of this table (month → column prefix); long is the layout that
scales (the pivot is a per-cell reshape, not a shuffle) and is what the
SQL value-check compares.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

# NICFI basemap band subset: name → catalog band index (02planet.py band
# names N/R/G used by addIndices; B carried through the stack).
BASEMAP_BANDS = {"B": 0, "G": 1, "R": 2, "N": 3}

# reference: year = 2021 (02planet.py:29); synth years span 2020-2022
PLANET_YEAR = 2021

# AOI analog of the Mufunta polygon: a fixed sub-bbox of the synth domain,
# buffered like aoi.buffer(5000) (~0.05 deg at the equator)
AOI_BBOX = (21.5, -18.5, 25.5, -14.5)
AOI_BUFFER_DEG = 0.05

# cumulative day-of-year at each month start (non-leap)
_CUM_DAYS = np.array(
    [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334, 365], dtype=np.int64
)


def month_of_doy(year: np.ndarray, doy: np.ndarray) -> np.ndarray:
    """Calendar month of a (year, doy) pair, leap-aware — bit-identical to
    DuckDB's ``month(make_date(year,1,1) + (doy-1))`` for doy in [1, 366]."""
    y = np.asarray(year, dtype=np.int64)
    d = np.asarray(doy, dtype=np.int64)
    leap = (y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0))
    # map leap doys past Feb 29 onto the non-leap scale; doy 60 in a leap
    # year (Feb 29) maps to 59 which is still month 2
    d_eff = np.where(leap & (d > 59), d - 1, d)
    return np.searchsorted(_CUM_DAYS, d_eff, side="left").astype(np.int64)


def month_sql_expr(year_expr: str, doy_expr: str) -> str:
    """The DuckDB twin of month_of_doy."""
    return (
        f"CAST(month(make_date(CAST({year_expr} AS INTEGER), 1, 1)"
        f" + CAST(({doy_expr}) - 1 AS INTEGER)) AS BIGINT)"
    )


def read_basemap(geo, year: int = PLANET_YEAR, aoi=AOI_BBOX, buffer_deg=AOI_BUFFER_DEG):
    """The third-catalog read: calendarRange(year) + clip(aoi.buffer()) +
    band-subset projection, fused into one stateless Arrow pass over the
    parsed geo spans.  Keeps only the cents columns of the basemap bands
    (exact integer arithmetic downstream) + (cell_id, month)."""
    minx, miny, maxx, maxy = aoi
    minx, miny, maxx, maxy = (
        minx - buffer_deg, miny - buffer_deg, maxx + buffer_deg, maxy + buffer_deg
    )
    cent_cols = [f"c{i}" for i in BASEMAP_BANDS.values()]

    def fn(t: pa.Table) -> pa.Table:
        lon = t.column("lon").to_numpy(zero_copy_only=False)
        lat = t.column("lat").to_numpy(zero_copy_only=False)
        yr = t.column("year").to_numpy(zero_copy_only=False)
        keep = (
            (yr == year)
            & (lon >= minx) & (lon < maxx)
            & (lat >= miny) & (lat < maxy)
        )
        t = t.filter(pa.array(keep))
        doy = t.column("doy").to_numpy(zero_copy_only=False)
        yr = t.column("year").to_numpy(zero_copy_only=False)
        cols = {
            "cell_id": t.column("cell_id"),
            "month": pa.array(month_of_doy(yr, doy)),
        }
        for c in cent_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    return geo.map_batches(fn, batch_format="pyarrow")


def _indices_from_means(cols: dict) -> dict:
    """NDVI/NDWI/SAVI from the composite band means (02planet.py:12-23),
    left-associated exactly as the oracle writes them."""
    B, G, R, N = (cols[b] for b in ("B", "G", "R", "N"))
    with np.errstate(divide="ignore", invalid="ignore"):
        return {
            "NDVI": (N - R) / (N + R),
            "NDWI": (G - N) / (G + N),
            "SAVI": (N - R) * 1.5 / (N + R + 0.5),
        }


def planet_monthly_stack(
    geo,
    year: int = PLANET_YEAR,
    aoi=AOI_BBOX,
    buffer_deg=AOI_BUFFER_DEG,
    level: int | None = None,
    concurrency=None,
):
    """The 02planet.py pipeline end-to-end: basemap read → per-(cell, month)
    mean composite → NDVI/NDWI/SAVI → topography.

    Returns Dataset[cell_id, month, n, B, G, R, N, NDVI, NDWI, SAVI,
    elev, slope_deg, aspect_deg] — one row per cell-month (the long form of
    the reference's toBands() stack)."""
    from ..state import cells as cells_mod
    from ..state.dem import build_dem
    from ..stages import zonal
    from ..stages.terrain import TerrainLookup
    from .. import synth

    if level is None:
        level = cells_mod.CELL_LEVEL
    if concurrency is None:
        from ..runtime import pool_size

        concurrency = (1, pool_size(0.4))

    bm = read_basemap(geo, year=year, aoi=aoi, buffer_deg=buffer_deg)
    cent_cols = [f"c{i}" for i in BASEMAP_BANDS.values()]
    keys = ["cell_id", "month"]
    partial = bm.map_batches(
        lambda t: zonal._partial_counts(t, keys, cent_cols), batch_format="pyarrow"
    )
    agg = zonal.bucketed_sum(partial, keys, ["n"] + [f"s_{c}" for c in cent_cols])

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        denom = n * 100.0
        # "n_obs", not "n": the band column N would collide case-insensitively
        # in the SQL oracle
        cols = {
            "cell_id": t.column("cell_id"),
            "month": t.column("month"),
            "n_obs": t.column("n"),
        }
        means = {
            name: t.column(f"s_c{b}").to_numpy(zero_copy_only=False).astype(np.float64)
            / denom
            for name, b in BASEMAP_BANDS.items()
        }
        cols.update({k: pa.array(v) for k, v in means.items()})
        cols.update({k: pa.array(v) for k, v in _indices_from_means(means).items()})
        return pa.table(cols)

    stack = agg.map_batches(finalize, batch_format="pyarrow")

    # addTopography (02planet.py:37 via covariates.addTopography): the same
    # broadcast static-DEM lookup actor as the terrain pipeline (S5/T5)
    dem_ref = ray.put(
        build_dem(synth.LON_MIN, synth.LAT_MIN, synth.LON_MAX, synth.LAT_MAX,
                  level=level, margin=2)
    )
    return stack.map_batches(
        TerrainLookup,
        fn_constructor_kwargs={"dem_ref": dem_ref, "level": level},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
