"""S2-style hierarchical cell index: Z-order (Morton) quadkeys over lon/lat.

The engine's spatial partitioning key.  Plays the role Earth Engine's internal
raster tiling plays for the reference (implicit there; explicit here — see
SURVEY.md §4).  A cell at ``level`` L is one square of the 2^L × 2^L grid over
the full lon/lat domain; ``cell_id`` is the Morton interleave of the (ix, iy)
grid coordinates, which gives spatial locality under sorted/range partitioning.

Levels used by the default pipelines:
  * TILE_LEVEL = 14  (~2.4 km at the equator) — the unit of tile assignment,
    analog of the reference's export tiles (scale=10 exports,
    src/utils/exports.py:15-16).
  * CELL_LEVEL = 12  (~9.8 km) — the zonal-stats aggregation cell, analog of
    the per-pixel-grid reducers (src/utils/s2process.py:138-139).

All functions are vectorized numpy; ``encode`` uses only +, /, *, floor so the
identical arithmetic can be reproduced in ANSI SQL for oracle checks (the
Morton interleave is emitted as a generated SQL expression by
``morton_sql_expr``).
"""

from __future__ import annotations

import numpy as np

TILE_LEVEL = 14
CELL_LEVEL = 12

_B16 = np.uint64(0x0000FFFF0000FFFF)
_B8 = np.uint64(0x00FF00FF00FF00FF)
_B4 = np.uint64(0x0F0F0F0F0F0F0F0F)
_B2 = np.uint64(0x3333333333333333)
_B1 = np.uint64(0x5555555555555555)


def _part1by1(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of x so bit i lands at position 2i."""
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & _B16
    x = (x | (x << np.uint64(8))) & _B8
    x = (x | (x << np.uint64(4))) & _B4
    x = (x | (x << np.uint64(2))) & _B2
    x = (x | (x << np.uint64(1))) & _B1
    return x


def _compact1by1(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64) & _B1
    x = (x | (x >> np.uint64(1))) & _B2
    x = (x | (x >> np.uint64(2))) & _B4
    x = (x | (x >> np.uint64(4))) & _B8
    x = (x | (x >> np.uint64(8))) & _B16
    x = (x | (x >> np.uint64(16))) & np.uint64(0xFFFFFFFF)
    return x


def grid_coords(lon, lat, level: int) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat → integer grid coords at ``level`` (clipped to the grid).

    The arithmetic ``floor((lon + 180) / 360 * 2**level)`` is reproduced
    verbatim in oracle SQL — keep the operation order stable.
    """
    n = np.int64(1) << level
    ix = np.floor((np.asarray(lon, dtype=np.float64) + 180.0) / 360.0 * float(n))
    iy = np.floor((np.asarray(lat, dtype=np.float64) + 90.0) / 180.0 * float(n))
    ix = np.clip(ix, 0, float(n - 1)).astype(np.int64)
    iy = np.clip(iy, 0, float(n - 1)).astype(np.int64)
    return ix, iy


def morton(ix, iy) -> np.ndarray:
    """Interleave (ix, iy) → Morton code (ix bits at odd positions).

    Returned as int64: every supported level (≤26) needs ≤52 bits, and int64
    avoids unsigned/signed friction across Arrow joins and DuckDB BIGINT.
    """
    m = (_part1by1(np.asarray(ix)) << np.uint64(1)) | _part1by1(np.asarray(iy))
    return m.astype(np.int64)


def encode(lon, lat, level: int) -> np.ndarray:
    """lon/lat arrays → uint64 cell ids at ``level``."""
    ix, iy = grid_coords(lon, lat, level)
    return morton(ix, iy)


def decode(cell_id, level: int) -> tuple[np.ndarray, np.ndarray]:
    """cell_id → (ix, iy) grid coords."""
    c = np.asarray(cell_id, dtype=np.uint64)
    ix = _compact1by1(c >> np.uint64(1)).astype(np.int64)
    iy = _compact1by1(c).astype(np.int64)
    return ix, iy


def parent(cell_id, levels_up: int = 1) -> np.ndarray:
    """Parent cell id ``levels_up`` levels coarser (drop 2 bits per level)."""
    return np.asarray(cell_id, dtype=np.int64) >> np.int64(2 * levels_up)


def k_ring(cell_id: int, level: int, k: int = 1) -> np.ndarray:
    """All cells within Chebyshev distance k of ``cell_id`` (incl. itself).

    The neighbor-expansion primitive for spatial range self-joins (the analog
    of the reference's withinDistance join, src/utils/sampling.py:12-28).
    Clipped at the grid boundary (no wraparound — the engine's domain is a
    bounded AOI, not the full globe).
    """
    n = np.int64(1) << level
    ix, iy = decode(np.asarray([cell_id]), level)
    xs = np.arange(max(0, int(ix[0]) - k), min(int(n), int(ix[0]) + k + 1))
    ys = np.arange(max(0, int(iy[0]) - k), min(int(n), int(iy[0]) + k + 1))
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    return morton(gx.ravel(), gy.ravel())


def cell_center(cell_id, level: int) -> tuple[np.ndarray, np.ndarray]:
    """Center (lon, lat) of each cell."""
    ix, iy = decode(cell_id, level)
    n = float(np.int64(1) << level)
    lon = (ix.astype(np.float64) + 0.5) / n * 360.0 - 180.0
    lat = (iy.astype(np.float64) + 0.5) / n * 180.0 - 90.0
    return lon, lat


EARTH_RADIUS_M = 6371008.8  # mean radius


def cell_area_m2(cell_id, level: int) -> np.ndarray:
    """Approximate area of each cell in m² (spherical, cos-latitude scaled).

    Used by per-class area summaries (A10 — reference analog: per-class pixel
    counts × 100 m²/pixel, src/misc/old_README_instructions.md:16-50).
    """
    _, lat = cell_center(cell_id, level)
    n = float(np.int64(1) << level)
    dlon = np.deg2rad(360.0 / n)
    dlat = np.deg2rad(180.0 / n)
    return (EARTH_RADIUS_M**2) * dlon * dlat * np.cos(np.deg2rad(lat))


def hilbert(ix, iy, level: int) -> np.ndarray:
    """(ix, iy) → Hilbert-curve distance at ``level`` (vectorized).

    The S2-style alternative to :func:`morton`: consecutive ids are always
    edge-adjacent cells (unit-step property, tested), so range partitions
    over the id cut ~2× fewer polygons/neighborhoods than Z-order ranges —
    the layout choice for range-partitioned side tables.  Classic
    reflect+swap formulation, 1 vector pass per level; reproduced
    bit-for-bit in SQL by ``hilbert_sql_steps``.
    """
    x = np.asarray(ix, dtype=np.int64).copy()
    y = np.asarray(iy, dtype=np.int64).copy()
    d = np.zeros_like(x)
    n = np.int64(1) << level
    s = n >> 1
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        refl = (ry == 0) & (rx == 1)
        xr = np.where(refl, n - 1 - x, x)
        yr = np.where(refl, n - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, yr, xr), np.where(swap, xr, yr)
        s >>= 1
    return d


def encode_hilbert(lon, lat, level: int) -> np.ndarray:
    """lon/lat arrays → Hilbert cell ids at ``level``."""
    ix, iy = grid_coords(lon, lat, level)
    return hilbert(ix, iy, level)


def hilbert_sql_steps(x0: str, y0: str, d0: str, level: int) -> tuple[list, str]:
    """The Hilbert loop unrolled as (name, expr) steps for
    ``sqlhash.chain_select`` — one linear CTE layer per assignment, exact
    BIGINT arithmetic.  Returns (steps, final_distance_column)."""
    n = 1 << level
    steps = []
    x, y, d = x0, y0, d0
    for k in range(level):
        s = 1 << (level - 1 - k)
        rx, ry = f"rx{k}", f"ry{k}"
        steps.append((rx, f"CASE WHEN ({x} & {s}) > 0 THEN 1 ELSE 0 END"))
        steps.append((ry, f"CASE WHEN ({y} & {s}) > 0 THEN 1 ELSE 0 END"))
        nd, nx, ny = f"hd{k + 1}", f"hx{k + 1}", f"hy{k + 1}"
        quad = (
            f"CASE WHEN {rx} = 1 AND {ry} = 0 THEN 3 "
            f"WHEN {rx} = 1 AND {ry} = 1 THEN 2 "
            f"WHEN {rx} = 0 AND {ry} = 1 THEN 1 ELSE 0 END"
        )
        steps.append((nd, f"{d} + {s * s} * ({quad})"))
        steps.append(
            (
                nx,
                f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
                f"THEN {n - 1} - {y} ELSE {y} END) ELSE {x} END",
            )
        )
        steps.append(
            (
                ny,
                f"CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1 "
                f"THEN {n - 1} - {x} ELSE {x} END) ELSE {y} END",
            )
        )
        x, y, d = nx, ny, nd
    return steps, d


def morton_sql_expr(ix_expr: str, iy_expr: str, level: int) -> str:
    """ANSI-SQL expression computing morton(ix, iy) for oracle checks.

    Emits an explicit bit-interleave sum (DuckDB evaluates BIGINT << / & /
    exactly), so the oracle can reproduce cell ids without any UDF.
    """
    terms = []
    for b in range(level):
        terms.append(f"((({ix_expr}) >> {b}) & 1) * {1 << (2 * b + 1)}")
        terms.append(f"((({iy_expr}) >> {b}) & 1) * {1 << (2 * b)}")
    return "(" + " + ".join(terms) + ")"


def morton_decode_sql_expr(col: str, level: int, axis: str) -> str:
    """ANSI-SQL expression de-interleaving a Morton cell id back to its
    ``ix`` (axis='x', odd bit positions) or ``iy`` (axis='y', even) grid
    coordinate — the oracle twin of ``decode``."""
    shift = 1 if axis == "x" else 0
    terms = [
        f"((({col}) >> {2 * b + shift}) & 1) * {1 << b}" for b in range(level)
    ]
    return "(" + " + ".join(terms) + ")"


def cell_center_sql_exprs(col: str, level: int) -> tuple[str, str]:
    """SQL for ``cell_center``: ((i + 0.5) / n) * span − offset, mirroring
    the numpy arithmetic operation-for-operation."""
    n = float(np.int64(1) << level)
    ix = morton_decode_sql_expr(col, level, "x")
    iy = morton_decode_sql_expr(col, level, "y")
    lon = f"(({ix} + 0.5) / {n!r} * 360.0 - 180.0)"
    lat = f"(({iy} + 0.5) / {n!r} * 180.0 - 90.0)"
    return lon, lat


def grid_coord_sql_expr(col: str, offset: float, span: float, level: int) -> str:
    """SQL for ``grid_coords`` of one axis: floor((col+off)/span * 2^level),
    clipped. Mirrors the numpy arithmetic operation-for-operation."""
    n = 1 << level
    raw = f"floor((({col}) + {offset!r}) / {span!r} * {float(n)!r})"
    return f"CAST(least(greatest({raw}, 0), {float(n - 1)!r}) AS BIGINT)"


GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash(lon, lat, precision: int = 6) -> "pyarrow.StringArray":  # noqa: F821
    """Standard geohash strings (Niemeyer's public base32 scheme) for
    lon/lat arrays, fully vectorized.

    Even precisions only: P chars = 5P bits split equally (5P/2 per axis),
    so the cell coords are exactly :func:`grid_coords` at level 5P/2 and
    the bit interleave is exactly :func:`morton` (lon at odd positions —
    geohash's convention).  Characters are gathered with one uint8 fancy
    index per position and the result is assembled as a zero-copy Arrow
    StringArray (offsets + one data buffer) — no per-row Python.
    """
    import pyarrow as pa

    if precision % 2:
        raise ValueError("geohash(): even precision required (equal bit split)")
    level = 5 * precision // 2
    ix, iy = grid_coords(lon, lat, level)
    code = morton(ix, iy).astype(np.uint64)
    n = code.shape[0]
    alpha = np.frombuffer(GEOHASH_ALPHABET.encode(), dtype=np.uint8)
    chars = np.empty((n, precision), dtype=np.uint8)
    for i in range(precision):
        shift = np.uint64(5 * (precision - 1 - i))
        chars[:, i] = alpha[((code >> shift) & np.uint64(31)).astype(np.int64)]
    offsets = np.arange(0, (n + 1) * precision, precision, dtype=np.int32)
    return pa.StringArray.from_buffers(
        n,
        pa.py_buffer(offsets.tobytes()),
        pa.py_buffer(chars.tobytes()),
    )


def geohash_sql_expr(lon: str, lat: str, precision: int = 6) -> str:
    """Oracle twin of :func:`geohash`: same grid/interleave arithmetic,
    per-character substring picks from the base32 alphabet."""
    if precision % 2:
        raise ValueError("even precision required")
    level = 5 * precision // 2
    ix = grid_coord_sql_expr(lon, 180.0, 360.0, level)
    iy = grid_coord_sql_expr(lat, 90.0, 180.0, level)
    code = morton_sql_expr(ix, iy, level)
    parts = [
        f"substr('{GEOHASH_ALPHABET}', "
        f"CAST((({code}) >> {5 * (precision - 1 - i)}) & 31 AS INTEGER) + 1, 1)"
        for i in range(precision)
    ]
    return "(" + " || ".join(parts) + ")"


RAD = 0.017453292519943295  # float64 π/180 (np.deg2rad's multiplier)


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    """Great-circle distance in meters (haversine), libm-exact: every
    transcendental goes through math.* per element (np.frompyfunc) so the
    doubles are bit-identical to the DuckDB oracle's sin/cos/asin/sqrt —
    the stages/sar.py `_LIBM` discipline.  The expression tree mirrors
    ``haversine_sql_expr`` operation-for-operation (squares written as
    x*x on both sides, never pow)."""
    import math

    def _ufunc(f):
        return lambda v: np.asarray(np.frompyfunc(f, 1, 1)(v), dtype=np.float64)

    sin, cos, asin = _ufunc(math.sin), _ufunc(math.cos), _ufunc(math.asin)

    lon1 = np.asarray(lon1, dtype=np.float64)
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    s_lat = sin((lat2 - lat1) * RAD / 2)
    s_lon = sin((lon2 - lon1) * RAD / 2)
    a = s_lat * s_lat + cos(lat1 * RAD) * cos(lat2 * RAD) * (s_lon * s_lon)
    return 2.0 * EARTH_RADIUS_M * asin(np.sqrt(a))


def haversine_sql_expr(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """DuckDB expression mirroring ``haversine_m`` operation-for-operation
    (libm sin/cos/asin/sqrt on both sides → bit-identical doubles)."""
    s_lat = f"sin((({lat2}) - ({lat1})) * {RAD!r} / 2)"
    s_lon = f"sin((({lon2}) - ({lon1})) * {RAD!r} / 2)"
    a = (
        f"({s_lat}) * ({s_lat}) + cos(({lat1}) * {RAD!r}) * "
        f"cos(({lat2}) * {RAD!r}) * (({s_lon}) * ({s_lon}))"
    )
    return f"2.0 * {EARTH_RADIUS_M!r} * asin(sqrt({a}))"


def hilbert_ranges(minx: float, miny: float, maxx: float, maxy: float, level: int):
    """The id-range SCAN PLAN a Hilbert-ordered layout turns a spatial
    box filter into: every grid cell intersecting the box, encoded to its
    curve distance and coalesced into maximal contiguous [start, end]
    runs.  Fewer runs = fewer index-range scans per query — the measured
    ~1.8×-fewer-fragments advantage of Hilbert over Z-order is exactly a
    statement about this output's row count.

    Pure bounded computation (cells in the box ≤ (box/cell)² at the
    chosen level) — the planning step runs driver-side in any real
    pipeline.  Returns (starts, ends) int64 arrays, starts ascending.
    """
    ix0, iy0 = grid_coords(np.asarray([minx]), np.asarray([miny]), level)
    ix1, iy1 = grid_coords(np.asarray([maxx]), np.asarray([maxy]), level)
    xs = np.arange(int(ix0[0]), int(ix1[0]) + 1, dtype=np.int64)
    ys = np.arange(int(iy0[0]), int(iy1[0]) + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    ids = np.sort(hilbert(gx.ravel(), gy.ravel(), level))
    brk = np.flatnonzero(np.diff(ids) > 1)
    starts = ids[np.concatenate(([0], brk + 1))]
    ends = ids[np.concatenate((brk, [ids.shape[0] - 1]))]
    return starts, ends
