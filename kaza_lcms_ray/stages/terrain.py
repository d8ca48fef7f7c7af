"""Terrain pipeline: static-DEM lookup actor + slope/aspect + volumetric
correction (SURVEY.md S5/T5/M17).

TerrainLookup is the static-ancillary-lookup-actor shape (T5): the
precomputed per-cell DEM table (state/dem.py) is ``ray.put`` once, each
actor reads it in ``__init__`` (binary-search index over sorted cell ids)
and every batch does four vectorized neighbor lookups → central-difference
slope/aspect.  All transcendental steps run through libm (bit-identical to
DuckDB), so the full chain — elevation → gradient → slope/aspect →
volumetric correction — is value-checked by the SQL oracle.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray

from ..state import cells, dem
from .sar import DEG, RAD, terrain_correct_batch

# elevation units per horizontal cell unit.  25 (not the physically-flat
# 1000) so the analytic DEM yields slopes up to ~50 deg: the SAR layover /
# shadow geometry flags (alpha_r < incidence, theta_lia < 85) actually
# trip on a minority of cells instead of certifying the all-True path.
SLOPE_SCALE = 20.0


class TerrainLookup:
    """Actor-pool callable: per-cell rows → + elev, slope_deg, aspect_deg.

    slope = atan(√(gx² + gy²) / SLOPE_SCALE)·180/π with gx/gy the
    central differences of the DEM at the four rook neighbors; aspect =
    atan2(gx, gy)·180/π (downslope bearing east-of-north convention).
    """

    def __init__(self, dem_ref, level: int = cells.CELL_LEVEL):
        d = ray.get(dem_ref) if isinstance(dem_ref, ray.ObjectRef) else dem_ref
        self.ids = d["cell_ids"]
        self.elev = d["elev"]
        self.level = level

    def _lookup(self, ids: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self.ids, ids)
        pos_c = np.clip(pos, 0, self.ids.shape[0] - 1)
        hit = self.ids[pos_c] == ids
        return np.where(hit, self.elev[pos_c], np.nan)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cid = batch.column("cell_id").to_numpy(zero_copy_only=False)
        ix, iy = cells.decode(cid, self.level)
        e0 = self._lookup(cid)
        e_e = self._lookup(cells.morton(ix + 1, iy))
        e_w = self._lookup(cells.morton(ix - 1, iy))
        e_n = self._lookup(cells.morton(ix, iy + 1))
        e_s = self._lookup(cells.morton(ix, iy - 1))
        gx = (e_e - e_w) / 2.0
        gy = (e_n - e_s) / 2.0
        grad = np.sqrt(gx * gx + gy * gy) / SLOPE_SCALE
        atan_u = np.frompyfunc(math.atan, 1, 1)
        slope_deg = atan_u(grad).astype(np.float64) * DEG
        aspect_deg = np.array(
            [math.atan2(float(a), float(b)) for a, b in zip(gx, gy)]
        ) * DEG
        return (
            batch.append_column("elev", pa.array(e0))
            .append_column("slope_deg", pa.array(slope_deg))
            .append_column("aspect_deg", pa.array(aspect_deg))
        )


def terrain_corrected_cells(
    geo,
    level: int = cells.CELL_LEVEL,
    incidence_deg: float = 35.0,
    heading_deg: float = 0.0,
    concurrency=None,
):
    """geo observations → per-cell dB backscatter proxy (10·log₁₀ of the
    exact cents total) → DEM slope/aspect → volumetric terrain correction.

    Returns Dataset[cell_id, value_db, elev, slope_deg, aspect_deg,
    gamma0_vol_db, layover, shadow] — one row per cell.
    """
    from . import zonal
    from ..state.dem import build_dem

    if concurrency is None:
        from ..runtime import pool_size

        concurrency = (1, pool_size(0.4))
    per_cell = zonal.zonal_sums(geo, keys=("cell_id",), bands=(3,))

    def to_db(t: pa.Table) -> pa.Table:
        s = t.column("s_c3").to_numpy(zero_copy_only=False).astype(np.float64)
        log10_u = np.frompyfunc(math.log10, 1, 1)
        v = 10.0 * log10_u(np.where(s > 0, s, np.nan)).astype(np.float64)
        return pa.table(
            {"cell_id": t.column("cell_id"), "value_db": pa.array(v)}
        )

    db = per_cell.map_batches(to_db, batch_format="pyarrow")
    # static ancillary side input: built once, broadcast once (S5/T5)
    dem_ref = ray.put(
        build_dem(
            *_domain_bbox(), level=level, margin=2
        )
    )
    looked = db.map_batches(
        TerrainLookup,
        fn_constructor_kwargs={"dem_ref": dem_ref, "level": level},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    return looked.map_batches(
        lambda t: terrain_correct_batch(
            t,
            "value_db",
            "slope_deg",
            "aspect_deg",
            incidence_deg=incidence_deg,
            heading_deg=heading_deg,
            exact_libm=True,
        ),
        batch_format="pyarrow",
    )


# D8 codes, ESRI convention: E=1, SE=2, S=4, SW=8, W=16, NW=32, N=64, NE=128.
# Iterated in ascending code order so strict-> comparisons break gradient
# ties toward the SMALLEST code — mirrored by (grad DESC, code ASC) in SQL.
D8_OFFSETS = (
    (1, 0, 1),
    (1, -1, 2),
    (0, -1, 4),
    (-1, -1, 8),
    (-1, 0, 16),
    (-1, 1, 32),
    (0, 1, 64),
    (1, 1, 128),
)
_SQRT2 = math.sqrt(2.0)


def flow_direction(geo, level: int = cells.CELL_LEVEL):
    """D8 flow direction over the analytic DEM for every occupied cell —
    the standard hydrology primitive (steepest-descent routing; the first
    step of any flow-accumulation / watershed product layered on a DEM
    the way the reference layers SRTM into its stacks,
    src/misc/sentinel1.py:82).

    Per cell: gradient to each of the 8 neighbors g_k = (e0 − e_k)/d_k
    (d = √2 on diagonals), flow_dir = the ESRI D8 code of the steepest
    POSITIVE gradient (ties → smallest code), 0 for pits/flats; grad is
    the winning gradient (0.0 for pits).

    Exactness: elevations are the closed-form ``dem.elev`` (numpy sin/cos
    — bit-identical to DuckDB libm, the house DEM contract); the division
    by the pinned √2 literal and every comparison are IEEE-identical in
    the SQL twin, so the argmax (grad DESC, code ASC) selects the same
    neighbor bit-for-bit.

    Scale shape: one stateless vectorized map over the AOI-bounded
    occupied-cell table (8 closed-form evaluations per cell, no shuffle,
    no neighbor exchange — the DEM is analytic, so no halo is needed).

    Output: (cell_id:int64, elev:f64, flow_dir:int64, grad:f64).
    """
    from . import zonal

    per_cell = zonal.zonal_sums(geo, keys=("cell_id",), bands=()).select_columns(
        ["cell_id"]
    )
    n_grid = np.int64(1) << level
    nf = float(n_grid)

    def ctr(ix, iy):
        lon = (ix.astype(np.float64) + 0.5) / nf * 360.0 - 180.0
        lat = (iy.astype(np.float64) + 0.5) / nf * 180.0 - 90.0
        return lon, lat

    def d8(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        ix, iy = cells.decode(cid, level)
        lon0, lat0 = ctr(ix, iy)
        e0 = dem.elev(lon0, lat0)
        best_g = np.zeros(len(cid), np.float64)
        best_c = np.zeros(len(cid), np.int64)
        for dx, dy, code in D8_OFFSETS:
            tx, ty = ix + dx, iy + dy
            valid = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
            lon, lat = ctr(tx, ty)
            den = _SQRT2 if dx != 0 and dy != 0 else 1.0
            g = (e0 - dem.elev(lon, lat)) / den
            better = valid & (g > best_g)
            best_g = np.where(better, g, best_g)
            best_c = np.where(better, code, best_c)
        return pa.table(
            {
                "cell_id": pa.array(cid.astype(np.int64), pa.int64()),
                "elev": pa.array(e0),
                "flow_dir": pa.array(best_c),
                "grad": pa.array(best_g),
            }
        )

    return per_cell.map_batches(d8, batch_format="pyarrow")


def inflow_count(geo, level: int = cells.CELL_LEVEL):
    """D8 inflow degree — the first step of flow accumulation: for each
    occupied cell, how many occupied cells drain INTO it under
    :func:`flow_direction` (channels have high inflow, ridges zero).

    Exactness: pure integer counts over the bit-replayable flow_dir
    winners, so all three output columns are int64.

    Scale shape: one fan pass re-encoding each cell's winning neighbor
    (in-batch group counts, one row per target per batch), a bucketed
    integer combine, and a broadcast probe of the AOI-bounded count table
    back onto the occupied cells.

    Output: (cell_id:int64, flow_dir:int64, inflow:int64).
    """
    from .zonal import bucketed_sum

    flow = flow_direction(geo, level).materialize()

    def fan(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        fd = t.column("flow_dir").to_numpy(zero_copy_only=False)
        ix, iy = cells.decode(cid, level)
        parts = []
        for dx, dy, code in D8_OFFSETS:
            m = fd == code
            parts.append(
                pa.table(
                    {
                        "cell_id": pa.array(
                            cells.morton(ix[m] + dx, iy[m] + dy), type=pa.int64()
                        )
                    }
                )
            )
        cat = pa.concat_tables(parts)
        g = cat.group_by(["cell_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["cell_id", "n"])

    counts = bucketed_sum(
        flow.map_batches(fan, batch_format="pyarrow"), ["cell_id"], ["n"]
    ).to_pandas()
    ck = counts["cell_id"].to_numpy(np.int64)
    cn = counts["n"].to_numpy(np.int64)
    order = np.argsort(ck, kind="mergesort")
    side_ref = ray.put({"k": ck[order], "n": cn[order]})

    def attach(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        inflow = np.zeros(len(cid), np.int64)
        if len(side["k"]):
            pos = np.minimum(np.searchsorted(side["k"], cid), len(side["k"]) - 1)
            hit = side["k"][pos] == cid
            inflow[hit] = side["n"][pos[hit]]
        return pa.table(
            {
                "cell_id": t.column("cell_id"),
                "flow_dir": t.column("flow_dir"),
                "inflow": pa.array(inflow),
            }
        )

    return flow.map_batches(attach, batch_format="pyarrow")


def flow_accumulation(geo, level: int = cells.CELL_LEVEL):
    """D8 flow accumulation — the hydrology product :func:`inflow_count`
    is the first step of: for each occupied cell, the COUNT of occupied
    cells whose steepest-descent path (following :func:`flow_direction`
    winners, restricted to occupied targets) passes through it.  The
    per-cell analog of the reference's watershed/drainage layers over
    SRTM (src/misc/sentinel1.py:82).

    Exactness: pure integer counts over the bit-replayable flow_dir
    winner forest.  Edges exist only where the winning D8 target is
    itself an occupied cell — the same rule the recursive-CTE oracle
    applies — and since every edge strictly decreases elevation the
    forest is acyclic by construction.

    Scale shape: the winner fan and the final attach are distributed
    maps; the accumulation itself runs on the collected skinny
    (src, tgt) edge list — two int64 columns over the AOI-bounded
    occupied-CELL table (≤4^level rows, independent of corpus size;
    the inflow_count/side-broadcast discipline) — as a VECTORIZED
    topological leaf-peel: each round fires the whole zero-in-degree
    frontier with np.add.at, rounds = max path depth (≤ grid diameter,
    measured 50 at sf0.01).  At a finer grid than the driver can hold,
    the identical peel runs as bucketed frontier combines (the
    dup_clusters spanning-forest pattern); the per-round message is
    always one (tgt, weight:int64) row per firing cell.

    Output: (cell_id:int64, flow_dir:int64, acc:int64) — acc counts
    strictly-upstream occupied cells (a ridge cell has acc = 0).
    """
    flow = flow_direction(geo, level).materialize()
    n_grid = np.int64(1) << level

    def fan(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        fd = t.column("flow_dir").to_numpy(zero_copy_only=False)
        ix, iy = cells.decode(cid, level)
        src, tgt = [], []
        for dx, dy, code in D8_OFFSETS:
            m = fd == code
            tx, ty = ix[m] + dx, iy[m] + dy
            ok = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
            src.append(cid[m][ok])
            tgt.append(cells.morton(tx[ok], ty[ok]).astype(np.int64))
        return pa.table(
            {
                "src": pa.array(np.concatenate(src), pa.int64()),
                "tgt": pa.array(np.concatenate(tgt), pa.int64()),
            }
        )

    edges = flow.map_batches(fan, batch_format="pyarrow").to_pandas()
    occ = np.sort(flow.select_columns(["cell_id"]).to_pandas()["cell_id"].to_numpy(np.int64))
    src = edges["src"].to_numpy(np.int64)
    tgt = edges["tgt"].to_numpy(np.int64)
    if len(occ):
        pos = np.minimum(np.searchsorted(occ, tgt), len(occ) - 1)
        keep = occ[pos] == tgt
    else:
        keep = np.zeros(len(tgt), bool)
    src, tgt = src[keep], tgt[keep]

    # index into the sorted occupied-cell array
    si = np.searchsorted(occ, src)
    ti = np.searchsorted(occ, tgt)
    n = len(occ)
    parent = np.full(n, -1, np.int64)
    parent[si] = ti
    indeg = np.bincount(ti, minlength=n)
    weight = np.ones(n, np.int64)  # upstream count including self
    frontier = np.flatnonzero(indeg == 0)
    while frontier.size:
        f = frontier[parent[frontier] >= 0]
        if not f.size:
            break
        p = parent[f]
        np.add.at(weight, p, weight[f])
        dec = np.bincount(p, minlength=n)
        indeg -= dec
        # fire parents only once all their children have fired
        frontier = np.unique(p[indeg[p] == 0])
    acc = weight - 1
    side_ref = ray.put({"k": occ, "acc": acc})

    def attach(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        out = np.zeros(len(cid), np.int64)
        if len(side["k"]):
            p = np.minimum(np.searchsorted(side["k"], cid), len(side["k"]) - 1)
            hit = side["k"][p] == cid
            out[hit] = side["acc"][p[hit]]
        return pa.table(
            {
                "cell_id": t.column("cell_id"),
                "flow_dir": t.column("flow_dir"),
                "acc": pa.array(out),
            }
        )

    return flow.map_batches(attach, batch_format="pyarrow")


def watershed_labels(geo, level: int = cells.CELL_LEVEL):
    """Watershed (drainage-basin) labeling: every occupied cell labeled
    with the TERMINAL cell its D8 steepest-descent path ends at — a pit
    (flow_dir = 0) or the last occupied cell before the path exits the
    occupied set.  Basins partition the AOI; the hydrology complement of
    :func:`flow_accumulation` (which counts, where this one names).

    Exactness: the walk follows the bit-replayable flow_dir winners, so
    each cell's root is unique and deterministic; labels are the roots'
    int64 cell ids.

    Scale shape: the winner fan is distributed; root-finding runs over
    the AOI-bounded skinny parent array (≤4^level, the inflow_count
    discipline) via POINTER DOUBLING — parent = parent[parent] — which
    converges in ⌈log2(max path)⌉ vectorized rounds (6 rounds for the
    measured depth-50 forest at sf0.01) instead of depth-many; the label
    attach is a broadcast searchsorted probe.  At a finer grid the same
    doubling runs as log-many bucketed self-joins over (cell, ptr) rows
    (the dup_clusters spanning-forest pattern).

    Output: (cell_id:int64, flow_dir:int64, basin:int64).
    """
    flow = flow_direction(geo, level).materialize()
    n_grid = np.int64(1) << level

    def fan(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        fd = t.column("flow_dir").to_numpy(zero_copy_only=False)
        ix, iy = cells.decode(cid, level)
        src, tgt = [], []
        for dx, dy, code in D8_OFFSETS:
            m = fd == code
            tx, ty = ix[m] + dx, iy[m] + dy
            ok = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
            src.append(cid[m][ok])
            tgt.append(cells.morton(tx[ok], ty[ok]).astype(np.int64))
        return pa.table(
            {
                "src": pa.array(np.concatenate(src), pa.int64()),
                "tgt": pa.array(np.concatenate(tgt), pa.int64()),
            }
        )

    edges = flow.map_batches(fan, batch_format="pyarrow").to_pandas()
    occ = np.sort(
        flow.select_columns(["cell_id"]).to_pandas()["cell_id"].to_numpy(np.int64)
    )
    src = edges["src"].to_numpy(np.int64)
    tgt = edges["tgt"].to_numpy(np.int64)
    if len(occ):
        pos = np.minimum(np.searchsorted(occ, tgt), len(occ) - 1)
        keep = occ[pos] == tgt
    else:
        keep = np.zeros(len(tgt), bool)
    src, tgt = src[keep], tgt[keep]

    n = len(occ)
    parent = np.arange(n, dtype=np.int64)  # roots point at themselves
    parent[np.searchsorted(occ, src)] = np.searchsorted(occ, tgt)
    while True:
        gp = parent[parent]
        if (gp == parent).all():
            break
        parent = gp
    side_ref = ray.put({"k": occ, "basin": occ[parent]})

    def attach(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        out = cid.astype(np.int64).copy()
        if len(side["k"]):
            p = np.minimum(np.searchsorted(side["k"], cid), len(side["k"]) - 1)
            hit = side["k"][p] == cid
            out[hit] = side["basin"][p[hit]]
        return pa.table(
            {
                "cell_id": t.column("cell_id"),
                "flow_dir": t.column("flow_dir"),
                "basin": pa.array(out),
            }
        )

    return flow.map_batches(attach, batch_format="pyarrow")


def _domain_bbox():
    from .. import synth

    return (synth.LON_MIN, synth.LAT_MIN, synth.LON_MAX, synth.LAT_MAX)


def hillshade_cells(
    geo,
    level: int = cells.CELL_LEVEL,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    concurrency=None,
):
    """Analytical hillshade of the DEM over the occupied cells — the
    standard Horn illumination model every terrain viz layer uses
    (reference analog: the hillshade beneath its map products):

        hs = 255 · max(0, cos z·cos s + sin z·sin s·cos(az − aspect))

    with z the solar zenith and s the slope, both from the same
    TerrainLookup central differences as the terrain-correction chain.
    cos z / sin z / az are Python-float constants inlined into BOTH the
    engine and the SQL twin, and every per-cell transcendental runs
    through libm — the whole chain is bit-replayable.

    Output: (cell_id:int64, slope_deg:f64, aspect_deg:f64, hillshade:f64).
    """
    from . import zonal
    from ..state.dem import build_dem

    if concurrency is None:
        from ..runtime import pool_size

        concurrency = (1, pool_size(0.4))
    per_cell = zonal.zonal_sums(geo, keys=("cell_id",), bands=()).select_columns(
        ["cell_id"]
    )
    dem_ref = ray.put(build_dem(*_domain_bbox(), level=level, margin=2))
    looked = per_cell.map_batches(
        TerrainLookup,
        fn_constructor_kwargs={"dem_ref": dem_ref, "level": level},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
    zen_r = (90.0 - altitude_deg) * RAD
    cos_z = math.cos(zen_r)
    sin_z = math.sin(zen_r)
    az_r = azimuth_deg * RAD

    def shade(t: pa.Table) -> pa.Table:
        slope = t.column("slope_deg").to_numpy(zero_copy_only=False)
        aspect = t.column("aspect_deg").to_numpy(zero_copy_only=False)
        cos_u = np.frompyfunc(math.cos, 1, 1)
        sin_u = np.frompyfunc(math.sin, 1, 1)
        s_r = slope * RAD
        a_r = aspect * RAD
        e = cos_z * cos_u(s_r).astype(np.float64) + sin_z * sin_u(s_r).astype(
            np.float64
        ) * cos_u(az_r - a_r).astype(np.float64)
        hs = 255.0 * np.maximum(0.0, e)
        return pa.table(
            {
                "cell_id": t.column("cell_id"),
                "slope_deg": pa.array(slope),
                "aspect_deg": pa.array(aspect),
                "hillshade": pa.array(hs),
            }
        )

    return looked.map_batches(shade, batch_format="pyarrow")


# ---- marching-squares contour extraction over the analytic DEM ----------
#
# Corners of a cell (grid coords): A=(ix,iy) B=(ix+1,iy) C=(ix+1,iy+1)
# D=(ix,iy+1); edges 0=AB 1=BC 2=CD 3=DA.  Case index bit i = (corner i's
# elevation >= level).  The 16-case table is DERIVED (crossed edges = the
# exactly-two state changes; the two saddles 5/10 disambiguate on the
# center mean) and SHARED verbatim with the SQL oracle as a VALUES list —
# one rule, both branches.

MS_EDGES = ((0, 1), (1, 2), (2, 3), (3, 0))  # edge -> (corner P, corner Q)


def _ms_case_table() -> dict:
    """case_key (= idx*2 + center_above_bit) → list of (e1, e2) segments,
    each normalized (e1 < e2)."""
    table = {}
    for idx in range(16):
        above = [(idx >> i) & 1 for i in range(4)]
        crossed = [e for e, (p, q) in enumerate(MS_EDGES) if above[p] != above[q]]
        for cbit in (0, 1):
            key = idx * 2 + cbit
            if len(crossed) == 0:
                table[key] = []
            elif len(crossed) == 2:
                table[key] = [(crossed[0], crossed[1])]
            elif idx == 5:  # A,C above: center above joins them
                table[key] = [(0, 1), (2, 3)] if cbit else [(0, 3), (1, 2)]
            else:  # idx == 10 — B,D above
                table[key] = [(0, 3), (1, 2)] if cbit else [(0, 1), (2, 3)]
    return table


def dem_contours(geo, level: int = cells.CELL_LEVEL, contour: float = 0.0):
    """Marching-squares contour segments of the analytic DEM at elevation
    ``contour`` over every OCCUPIED cell — the vector isoline extraction
    under every terrain map (reference analog: the DEM products of
    src/misc/sentinel1.py:82's SRTM join).

    Scale shape: distinct cells (skinny two-phase) → one STATELESS
    map_batches (the DEM is closed-form — no halo exchange, no join);
    per-edge crossing points are four vectorized interpolations and the
    case dispatch is ≤32 mask selections.  Every double expression
    (corner lon/lat, elevation, interpolation t) mirrors the oracle
    operation-for-operation.

    Output: (cell_id, seg:int64, x1, y1, x2, y2) — lon/lat endpoints.
    """
    from ..state.dem import elev
    from .joins import distinct

    nn = float(np.int64(1) << level)
    table = _ms_case_table()
    lvl = float(contour)

    def segs(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        ix, iy = cells.decode(cid.astype(np.uint64), level)
        fx = ix.astype(np.float64)
        fy = iy.astype(np.float64)
        lon0 = fx / nn * 360.0 - 180.0
        lon1 = (fx + 1.0) / nn * 360.0 - 180.0
        lat0 = fy / nn * 180.0 - 90.0
        lat1 = (fy + 1.0) / nn * 180.0 - 90.0
        cx = (lon0, lon1, lon1, lon0)  # corner lon A,B,C,D
        cy = (lat0, lat0, lat1, lat1)  # corner lat A,B,C,D
        v = [elev(cx[i], cy[i]) for i in range(4)]
        above = [(v[i] >= lvl) for i in range(4)]
        idx = (
            above[0].astype(np.int64)
            + 2 * above[1].astype(np.int64)
            + 4 * above[2].astype(np.int64)
            + 8 * above[3].astype(np.int64)
        )
        center = (v[0] + v[1] + v[2] + v[3]) / 4.0
        key = idx * 2 + (center >= lvl).astype(np.int64)
        # crossing point per edge (valid only where the edge is crossed)
        ex, ey = [], []
        with np.errstate(divide="ignore", invalid="ignore"):
            for e, (p, q) in enumerate(MS_EDGES):
                tt = (lvl - v[p]) / (v[q] - v[p])
                ex.append(cx[p] + tt * (cx[q] - cx[p]))
                ey.append(cy[p] + tt * (cy[q] - cy[p]))
        out_cid, out_seg, o_x1, o_y1, o_x2, o_y2 = [], [], [], [], [], []
        for k, seg_list in table.items():
            if not seg_list:
                continue
            m = key == k
            if not m.any():
                continue
            for seg_no, (e1, e2) in enumerate(seg_list):
                out_cid.append(cid[m])
                out_seg.append(np.full(int(m.sum()), seg_no, np.int64))
                o_x1.append(ex[e1][m])
                o_y1.append(ey[e1][m])
                o_x2.append(ex[e2][m])
                o_y2.append(ey[e2][m])
        if not out_cid:
            return pa.table(
                {
                    "cell_id": pa.array([], pa.int64()),
                    "seg": pa.array([], pa.int64()),
                    "x1": pa.array([], pa.float64()),
                    "y1": pa.array([], pa.float64()),
                    "x2": pa.array([], pa.float64()),
                    "y2": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "cell_id": pa.array(np.concatenate(out_cid)),
                "seg": pa.array(np.concatenate(out_seg)),
                "x1": pa.array(np.concatenate(o_x1)),
                "y1": pa.array(np.concatenate(o_y1)),
                "x2": pa.array(np.concatenate(o_x2)),
                "y2": pa.array(np.concatenate(o_y2)),
            }
        )

    occupied = distinct(geo.select_columns(["cell_id"]), ["cell_id"])
    return occupied.map_batches(segs, batch_format="pyarrow")


def dem_contours_sql(
    cells_sql: str, level: int = cells.CELL_LEVEL, contour: float = 0.0
) -> str:
    """Oracle twin of :func:`dem_contours` — the same derived case table
    as a VALUES join, identical corner/interpolation doubles."""
    from ..state.dem import elev_sql

    nn = float(np.int64(1) << level)
    ixe = cells.morton_decode_sql_expr("cell_id", level, "x")
    iye = cells.morton_decode_sql_expr("cell_id", level, "y")
    lvl = repr(float(contour))
    rows = []
    for k, seg_list in _ms_case_table().items():
        for seg_no, (e1, e2) in enumerate(seg_list):
            rows.append(f"({k}, {seg_no}, {e1}, {e2})")
    vals = ", ".join(rows)

    def pt(axis: str, edge_col: str) -> str:
        # interp along edge id: x/y = P + t * (Q - P), t = (L - vP)/(vQ - vP)
        cases = []
        names = ("a", "b", "c", "d")
        coords = {
            "x": ("lon0", "lon1", "lon1", "lon0"),
            "y": ("lat0", "lat0", "lat1", "lat1"),
        }[axis]
        for e, (p, q) in enumerate(MS_EDGES):
            tt = f"(({lvl} - v{names[p]}) / (v{names[q]} - v{names[p]}))"
            cases.append(
                f"WHEN {e} THEN {coords[p]} + {tt} * ({coords[q]} - {coords[p]})"
            )
        return f"CASE {edge_col} " + " ".join(cases) + " END"

    return f"""
            ms_dc AS (SELECT DISTINCT cell_id FROM ({cells_sql})),
            ms_geom AS (
                SELECT cell_id,
                       CAST({ixe} AS DOUBLE) / {nn!r} * 360.0 - 180.0 AS lon0,
                       (CAST({ixe} AS DOUBLE) + 1.0) / {nn!r} * 360.0 - 180.0 AS lon1,
                       CAST({iye} AS DOUBLE) / {nn!r} * 180.0 - 90.0 AS lat0,
                       (CAST({iye} AS DOUBLE) + 1.0) / {nn!r} * 180.0 - 90.0 AS lat1
                FROM ms_dc
            ),
            ms_v AS (
                SELECT *,
                       {elev_sql("lon0", "lat0")} AS va,
                       {elev_sql("lon1", "lat0")} AS vb,
                       {elev_sql("lon1", "lat1")} AS vc,
                       {elev_sql("lon0", "lat1")} AS vd
                FROM ms_geom
            ),
            ms_k AS (
                SELECT *,
                       (CASE WHEN va >= {lvl} THEN 1 ELSE 0 END
                        + 2 * CASE WHEN vb >= {lvl} THEN 1 ELSE 0 END
                        + 4 * CASE WHEN vc >= {lvl} THEN 1 ELSE 0 END
                        + 8 * CASE WHEN vd >= {lvl} THEN 1 ELSE 0 END) * 2
                       + CASE WHEN (va + vb + vc + vd) / 4.0 >= {lvl}
                              THEN 1 ELSE 0 END AS ckey
                FROM ms_v
            ),
            ms_tab(ckey, seg, e1, e2) AS (VALUES {vals})
            SELECT k.cell_id, CAST(t.seg AS BIGINT) AS seg,
                   {pt("x", "t.e1")} AS x1, {pt("y", "t.e1")} AS y1,
                   {pt("x", "t.e2")} AS x2, {pt("y", "t.e2")} AS y2
            FROM ms_k k JOIN ms_tab t ON t.ckey = k.ckey"""


def viewshed_cells(
    geo, level: int = cells.CELL_LEVEL, obs_height: float = 10.0
):
    """Line-of-sight viewshed over the occupied cells — the classic
    terrain product the reference's DEM-derived layers feed (slope /
    hillshade siblings, src/misc/sentinel1.py:82): every occupied cell
    flagged visible/hidden from a single observer standing ``obs_height``
    meters above the HIGHEST occupied cell (ties → smallest cell_id, so
    the observer is deterministic on both sides of the gate).

    Semantics (R3-style sampling viewshed): for target cell T at
    Chebyshev step count n = max(|Δix|, |Δiy|), the sight line is
    sampled at the n−1 interior parametric points
    ``(ox + Δix·t/n, oy + Δiy·t/n), t = 1..n−1`` in continuous grid
    coords; T is visible iff its normalized elevation angle
    ``(e_T − e_obs)/n`` STRICTLY exceeds every interior sample's
    ``(e_t − e_obs)/t`` (along a fixed ray Euclidean distance is
    proportional to t, so dividing by t is the exact angle comparison).
    Cells at n ≤ 1 (the observer and its ring-1 neighbors) are visible
    by definition.

    Exactness: elevations are the closed-form ``dem.elev`` at IDENTICAL
    float64 sample positions (the (Δ·t)/n parametric form is mirrored
    operation-for-operation in the SQL twin); the running max is
    order-independent, and the strict ``>`` gate is an IEEE comparison
    of bit-identical doubles.

    Scale shape: one tiny distributed argmax (per-batch top-1 partials,
    driver reduces ≤#blocks rows) picks the observer; the visibility
    sweep is a STATELESS vectorized map — each batch loops over sample
    index t (≤ AOI grid diameter rounds), evaluating the analytic DEM on
    the still-unresolved cells only; no shuffle, no neighbor exchange.

    Output: (cell_id:int64, elev:f64, n_steps:int64, visible:int64).
    """
    from . import zonal

    per_cell = zonal.zonal_sums(geo, keys=("cell_id",), bands=()).select_columns(
        ["cell_id"]
    )
    nf = float(np.int64(1) << level)

    def ctr(ix, iy):
        lon = (ix.astype(np.float64) + 0.5) / nf * 360.0 - 180.0
        lat = (iy.astype(np.float64) + 0.5) / nf * 180.0 - 90.0
        return lon, lat

    def best1(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        if not len(cid):
            return pa.table(
                {"cell_id": pa.array([], pa.int64()), "e0": pa.array([], pa.float64())}
            )
        ix, iy = cells.decode(cid, level)
        e0 = dem.elev(*ctr(ix, iy))
        k = np.lexsort((cid, -e0))[0]  # e0 DESC, cell_id ASC
        return pa.table(
            {
                "cell_id": pa.array([np.int64(cid[k])], pa.int64()),
                "e0": pa.array([e0[k]], pa.float64()),
            }
        )

    cand = per_cell.map_batches(best1, batch_format="pyarrow").to_pandas()
    ck = cand["cell_id"].to_numpy(np.int64)
    ce = cand["e0"].to_numpy(np.float64)
    k = int(np.lexsort((ck, -ce))[0])
    ox, oy = cells.decode(np.array([ck[k]], np.int64), level)
    obs = {
        "ox": np.int64(ox[0]),
        "oy": np.int64(oy[0]),
        "eo": float(ce[k] + obs_height),
    }
    obs_ref = ray.put(obs)

    def sweep(t: pa.Table) -> pa.Table:
        o = ray.get(obs_ref)
        ox, oy, eo = o["ox"], o["oy"], o["eo"]
        cid = t.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = cells.decode(cid, level)
        e_t = dem.elev(*ctr(ix, iy))
        dx = ix.astype(np.int64) - ox
        dy = iy.astype(np.int64) - oy
        n = np.maximum(np.abs(dx), np.abs(dy))
        nfl = n.astype(np.float64)
        # target angle, normalized by the Chebyshev step count
        tan_tgt = np.where(n > 0, (e_t - eo) / np.where(n > 0, nfl, 1.0), 0.0)
        mx = np.full(len(cid), -np.inf)
        step = 1
        while True:
            m = n > step  # t = step is interior only when step < n
            if not m.any():
                break
            tt = float(step)
            xs = ox + (dx[m] * step) / nfl[m]
            ys = oy + (dy[m] * step) / nfl[m]
            lon = (xs + 0.5) / nf * 360.0 - 180.0
            lat = (ys + 0.5) / nf * 180.0 - 90.0
            s = (dem.elev(lon, lat) - eo) / tt
            mx[m] = np.maximum(mx[m], s)
            step += 1
        visible = ((n <= 1) | (tan_tgt > mx)).astype(np.int64)
        return pa.table(
            {
                "cell_id": pa.array(cid, pa.int64()),
                "elev": pa.array(e_t, pa.float64()),
                "n_steps": pa.array(n.astype(np.int64), pa.int64()),
                "visible": pa.array(visible, pa.int64()),
            }
        )

    return per_cell.map_batches(sweep, batch_format="pyarrow")


def terrain_indexes(geo, level: int = cells.CELL_LEVEL):
    """Terrain Ruggedness Index and Topographic Position Index per
    occupied cell — the standard DEM-derived morphometry pair (Riley TRI;
    Weiss TPI) the reference's terrain stack sits alongside:

      TRI = Σ |e_k − e_0| / 8   over the 8 neighbors (mean absolute
            relief), rugged terrain high, plains near 0;
      TPI = e_0 − Σ e_k / 8     (positive on ridges, negative in valleys).

    Exactness: closed-form elevations at the 9 cell centers; both sums
    run over the FIXED 8-neighbor order with the identical left-fold
    `+` chain in numpy and SQL (a + b + c … is left-associative in
    both), then one pinned /8.0 division each — bit-exact.

    Scale shape: one stateless vectorized map over the occupied-cell
    table (9 closed-form evaluations per cell, no shuffle, no halo —
    the flow_direction discipline).

    Output: (cell_id:int64, elev:f64, tri:f64, tpi:f64).
    """
    from . import zonal

    per_cell = zonal.zonal_sums(geo, keys=("cell_id",), bands=()).select_columns(
        ["cell_id"]
    )
    nf = float(np.int64(1) << level)
    n_grid = np.int64(1) << level

    def ctr(ix, iy):
        lon = (ix.astype(np.float64) + 0.5) / nf * 360.0 - 180.0
        lat = (iy.astype(np.float64) + 0.5) / nf * 180.0 - 90.0
        return lon, lat

    def fn(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = cells.decode(cid, level)
        e0 = dem.elev(*ctr(ix, iy))
        tri = np.zeros(len(cid), np.float64)
        esum = np.zeros(len(cid), np.float64)
        # FIXED neighbor order shared with the SQL twin (left-fold chain)
        for dx, dy, _code in D8_OFFSETS:
            ek = dem.elev(*ctr(ix + dx, iy + dy))
            tri = tri + np.abs(ek - e0)
            esum = esum + ek
        return pa.table(
            {
                "cell_id": pa.array(cid, pa.int64()),
                "elev": pa.array(e0),
                "tri": pa.array(tri / 8.0),
                "tpi": pa.array(e0 - esum / 8.0),
            }
        )

    return per_cell.map_batches(fn, batch_format="pyarrow")


def curvature_cells(geo, level: int = cells.CELL_LEVEL):
    """Zevenbergen–Thorne surface curvature over the occupied cells —
    the terrain-family completion next to slope/aspect/hillshade/TRI/TPI
    (profile curvature = flow acceleration along the slope line, plan =
    flow convergence across it, total = −2(D+E), the Laplacian form):

        D = ((z_W + z_E)/2 − z₀)/L²     E = ((z_N + z_S)/2 − z₀)/L²
        F = (−z_NW + z_NE + z_SW − z_SE)/(4L²)
        G = (−z_W + z_E)/(2L)           H = (z_N − z_S)/(2L)
        profile = −2(DG² + EH² + FGH)/(G² + H²)   (0 on flat)
        plan    =  2(DH² + EG² − FGH)/(G² + H²)   (0 on flat)

    with the nine elevations straight from the ANALYTIC DEM at neighbor
    cell centers (state/dem.elev — closed-form, bit-identical to the SQL
    twin; no broadcast needed at all) and L = SLOPE_SCALE, the terrain
    chain's gradient normalization.  Stateless, zero shuffle.

    Output: (cell_id:int64, curv_profile:f64, curv_plan:f64,
    curv_total:f64).
    """
    from . import zonal
    from ..state import dem

    per_cell = zonal.zonal_sums(geo, keys=("cell_id",), bands=()).select_columns(
        ["cell_id"]
    )
    n = float(np.int64(1) << level)
    L = SLOPE_SCALE

    def fn(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        ix, iy = cells.decode(cid, level)
        ixf = ix.astype(np.float64)
        iyf = iy.astype(np.float64)

        def z(dx, dy):
            lon = (ixf + dx + 0.5) / n * 360.0 - 180.0
            lat = (iyf + dy + 0.5) / n * 180.0 - 90.0
            return dem.elev(lon, lat)

        z0 = z(0.0, 0.0)
        zw, ze = z(-1.0, 0.0), z(1.0, 0.0)
        zn, zs = z(0.0, 1.0), z(0.0, -1.0)
        znw, zne = z(-1.0, 1.0), z(1.0, 1.0)
        zsw, zse = z(-1.0, -1.0), z(1.0, -1.0)
        D = ((zw + ze) / 2.0 - z0) / (L * L)
        E = ((zn + zs) / 2.0 - z0) / (L * L)
        F = (-znw + zne + zsw - zse) / (4.0 * L * L)
        G = (-zw + ze) / (2.0 * L)
        H = (zn - zs) / (2.0 * L)
        den = G * G + H * H
        safe = np.where(den == 0.0, 1.0, den)
        prof = np.where(
            den == 0.0, 0.0, -2.0 * (D * G * G + E * H * H + F * G * H) / safe
        )
        plan = np.where(
            den == 0.0, 0.0, 2.0 * (D * H * H + E * G * G - F * G * H) / safe
        )
        return pa.table(
            {
                "cell_id": t.column("cell_id"),
                "curv_profile": pa.array(prof, pa.float64()),
                "curv_plan": pa.array(plan, pa.float64()),
                "curv_total": pa.array(-2.0 * (D + E), pa.float64()),
            }
        )

    return per_cell.map_batches(fn, batch_format="pyarrow")
