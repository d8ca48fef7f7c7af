"""Deterministic synthesis of the canonical input tables (FIXTURES.md).

The engine's design-scale input is a Lance table of 10^12 interleaved
text+media documents ``(doc_id, spans: list<struct<kind, text, media_ref,
offset>>)`` (BASELINE.json input_hint).  This module synthesizes that table —
plus the side tables (polygons, training_plots, primitives) — at sandbox
scales, fully deterministically from splitmix64 streams (base seed 90210,
matching the reference's sampling seed, src/02train_test.py:121).

Scale mapping: a testdata dir ``.../sf{X}`` maps to ``n_docs = X * 1e7``
(sf0.001 → 10k docs, sf0.01 → 100k, sf0.1 → 1M).  Generated tables are cached
under ``/tmp/kaza_synth/<version>/n<docs>/`` with atomic rename, so the Ray
queries and the DuckDB oracle SQL read the identical files.

Spatial domain (KAZA-like): lon ∈ [20, 27], lat ∈ [−20, −13]; hot-spot box
(Okavango-delta analog) (22.6, −18.9) ± 0.25 holding ~20% of geo spans to
exercise skew handling.  Years {2020, 2021, 2022}; classes 1..8
(src/misc/strata.py:12-21).
"""

from __future__ import annotations

import os
import re
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .state.cells import TILE_LEVEL, encode
from .state.geom import points_in_polygon
from .state.hashing import DEFAULT_SEED, hash_key, hash_unit

GEN_VERSION = "v1"
DOCS_PER_SF = 10_000_000  # sf0.01 -> 1e5 docs (FIXTURES.md t2 scale)
CACHE_ROOT = "/tmp/kaza_synth"

LON_MIN, LON_MAX = 20.0, 27.0
LAT_MIN, LAT_MAX = -20.0, -13.0
HOT_LON, HOT_LAT, HOT_HALF = 22.6, -18.9, 0.25
HOT_FRAC = 0.2
YEARS = (2020, 2021, 2022)
N_CLASSES = 8
CLASS_GRID_DEG = 1.0  # coarse enough that most reference polygons (radius
# ≤ 0.3°) sit inside one class cell → labels match span spectra

# per-class spectral means for (blue, green, red, nir, swir1, swir2) —
# loosely shaped like the 8 strata (Bare..Wetland) so model stages are
# non-trivial; values in [0, 1e4] reflectance units.
CLASS_SPECTRA = np.array(
    [
        [2800, 3400, 3900, 4300, 5200, 4800],  # 1 Bare
        [2600, 2900, 3100, 3300, 3600, 3500],  # 2 Built
        [1200, 2200, 1900, 5200, 3300, 2200],  # 3 Crop
        [600, 1400, 900, 4800, 2300, 1200],  # 4 Forest
        [1000, 2000, 2100, 3800, 3900, 2700],  # 5 Grass
        [900, 1700, 1600, 3600, 3200, 2100],  # 6 Shrub
        [800, 1100, 700, 400, 300, 200],  # 7 Water
        [1100, 1900, 1500, 3100, 2400, 1400],  # 8 Wetland
    ],
    dtype=np.float64,
)
NOISE_HALF = 400.0  # uniform band noise half-width

_WORDS = (
    "the of and to in is was for on that with as at by from river delta basin "
    "forest cover annual survey class land water plot sample region tile map "
    "area point band index model train test label season composite mosaic "
    "pixel scene grid zone field site record note data"
).split()
# 256 canned deterministic sentences for text spans (fast vectorized pick)
_SENTENCES = [
    " ".join(_WORDS[int(h % len(_WORDS))] for h in hash_key(7, "sent", np.arange(s, s + 5 + s % 11)))
    for s in range(256)
]


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    if not m:
        raise ValueError(f"cannot parse scale factor from {sf_dir!r}")
    return float(m.group(1))


def n_docs_for(sf: float) -> int:
    return max(1000, int(round(sf * DOCS_PER_SF)))


def synth_dir(sf_or_dir: float | str) -> str:
    sf = sf_from_dir(sf_or_dir) if isinstance(sf_or_dir, str) else float(sf_or_dir)
    return os.path.join(CACHE_ROOT, GEN_VERSION, f"n{n_docs_for(sf)}")


def ensure(sf_or_dir: float | str, seed: int = DEFAULT_SEED) -> str:
    """Generate (once, atomically) and return the synth table directory.

    Layout: <dir>/documents/part-NNNNN.parquet (sharded),
            <dir>/{polygons,training_plots,primitives}.parquet
    """
    out = synth_dir(sf_or_dir)
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    sf = sf_from_dir(sf_or_dir) if isinstance(sf_or_dir, str) else float(sf_or_dir)
    n = n_docs_for(sf)
    tmp = out + f".tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "documents"), exist_ok=True)
    geo_lon, geo_lat, geo_year = _write_documents(tmp, n, seed)
    polys = _write_polygons(tmp, seed)
    _write_training_plots(tmp, polys, seed)
    _write_primitives(tmp, geo_lon, geo_lat, geo_year, seed)
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    try:
        os.rename(tmp, out)
    except OSError:  # concurrent generator won the race
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# ---------------------------------------------------------------- documents


def _gen_doc_chunk(seed: int, lo: int, hi: int):
    """Generate docs [lo, hi) → (arrow table, parsed geo lon/lat/year)."""
    i = np.arange(lo, hi, dtype=np.int64)
    n_spans = (1 + hash_key(seed, "nspans", i) % np.uint64(8)).astype(np.int64)
    doc_idx = np.repeat(i, n_spans)
    total = int(n_spans.sum())
    # span_j = position within its doc
    starts = np.concatenate(([0], np.cumsum(n_spans)))[:-1]
    span_j = np.arange(total, dtype=np.int64) - np.repeat(starts, n_spans)
    k = doc_idx * 16 + span_j  # unique span key (n_spans ≤ 8 < 16)
    rk = hash_key(seed, "kind", k)
    kind_code = (rk % np.uint64(8)).astype(np.int64)  # 0-1 geo, 2-5 text, 6-7 media
    is_geo = kind_code < 2
    is_media = kind_code >= 6
    is_text = ~is_geo & ~is_media

    kind = np.where(is_geo, "geo", np.where(is_media, "media", "text")).astype(object)
    text = np.empty(total, dtype=object)
    media = np.empty(total, dtype=object)
    text[:] = ""
    media[:] = ""

    # text spans: canned sentence by hash
    ti = np.nonzero(is_text)[0]
    if ti.size:
        sent_idx = (hash_key(seed, "sent", k[ti]) % np.uint64(256)).astype(np.int64)
        text[ti] = np.asarray(_SENTENCES, dtype=object)[sent_idx]

    # media spans
    mi = np.nonzero(is_media)[0]
    if mi.size:
        mh = hash_key(seed, "media", k[mi])
        media[mi] = [f"m://{int(h):016x}" for h in mh]

    # geo spans: 'lon;lat;year;b0,b1,b2,b3,b4,b5' with fixed decimal formats
    gi = np.nonzero(is_geo)[0]
    lon = lat = np.empty(0)
    year = np.empty(0, dtype=np.int64)
    if gi.size:
        gk = k[gi]
        hot = hash_unit(seed, "hot", gk) < HOT_FRAC
        u1 = hash_unit(seed, "lon", gk)
        u2 = hash_unit(seed, "lat", gk)
        lon = np.where(hot, HOT_LON - HOT_HALF + u1 * 2 * HOT_HALF, LON_MIN + u1 * (LON_MAX - LON_MIN))
        lat = np.where(hot, HOT_LAT - HOT_HALF + u2 * 2 * HOT_HALF, LAT_MIN + u2 * (LAT_MAX - LAT_MIN))
        lon = np.round(lon, 6)
        lat = np.round(lat, 6)
        year = (2020 + hash_key(seed, "year", gk) % np.uint64(3)).astype(np.int64)
        doy = (1 + hash_key(seed, "doy", gk) % np.uint64(365)).astype(np.int64)
        cls = class_of(lon, lat, seed)  # 1..8
        noise = (
            hash_unit(seed, "noise", gk[:, None] * np.uint64(8) + np.arange(6, dtype=np.uint64)[None, :])
            - 0.5
        ) * (2 * NOISE_HALF)
        bands = np.clip(CLASS_SPECTRA[cls - 1] + noise, 0.0, 10000.0)
        cents = np.rint(bands * 100.0).astype(np.int64)  # exact 2-decimal values
        geo_texts = [
            "%.6f;%.6f;%d;%d;%d.%02d,%d.%02d,%d.%02d,%d.%02d,%d.%02d,%d.%02d"
            % (
                lon[j],
                lat[j],
                year[j],
                doy[j],
                cents[j, 0] // 100, cents[j, 0] % 100,
                cents[j, 1] // 100, cents[j, 1] % 100,
                cents[j, 2] // 100, cents[j, 2] % 100,
                cents[j, 3] // 100, cents[j, 3] % 100,
                cents[j, 4] // 100, cents[j, 4] % 100,
                cents[j, 5] // 100, cents[j, 5] % 100,
            )
            for j in range(gi.size)
        ]
        text[gi] = geo_texts
        # re-parse lon/lat so downstream consumers (primitives keyed on the
        # engine-parsed tile) agree bit-for-bit with the text round-trip
        lon = np.array([float(t.split(";", 2)[0]) for t in geo_texts])
        lat = np.array([float(t.split(";", 2)[1]) for t in geo_texts])

    # offsets: cumulative byte offset of span texts within each doc
    lens = np.array([len(t) + 1 for t in text], dtype=np.int64)
    cum = np.cumsum(lens) - lens  # byte offset of each span in the chunk
    base_per_doc = cum[starts]  # offset of each doc's first span
    offset = (cum - np.repeat(base_per_doc, n_spans)).astype(np.int32)

    doc_ids = np.array([f"doc-{d:012d}" for d in i], dtype=object)
    struct = pa.StructArray.from_arrays(
        [
            pa.array(kind, type=pa.string()),
            pa.array(text, type=pa.string()),
            pa.array(media, type=pa.string()),
            pa.array(offset, type=pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    list_offsets = pa.array(np.concatenate(([0], np.cumsum(n_spans))).astype(np.int32))
    spans = pa.ListArray.from_arrays(list_offsets, struct)
    tbl = pa.table({"doc_id": pa.array(doc_ids, type=pa.string()), "spans": spans})
    return tbl, lon, lat, year


def class_of(lon: np.ndarray, lat: np.ndarray, seed: int = DEFAULT_SEED) -> np.ndarray:
    """Ground-truth class 1..8: hash of the 0.25° class-grid cell."""
    cgx = np.floor((np.asarray(lon) - LON_MIN) / CLASS_GRID_DEG).astype(np.int64)
    cgy = np.floor((np.asarray(lat) - LAT_MIN) / CLASS_GRID_DEG).astype(np.int64)
    return (1 + hash_key(seed, "classgrid", cgx * 1000 + cgy) % np.uint64(N_CLASSES)).astype(
        np.int32
    )


def _write_documents(tmp: str, n: int, seed: int):
    chunk = 50_000
    all_lon, all_lat, all_year = [], [], []
    for part, lo in enumerate(range(0, n, chunk)):
        tbl, lon, lat, year = _gen_doc_chunk(seed, lo, min(n, lo + chunk))
        pq.write_table(
            tbl,
            os.path.join(tmp, "documents", f"part-{part:05d}.parquet"),
            row_group_size=10_000,
        )
        all_lon.append(lon)
        all_lat.append(lat)
        all_year.append(year)
    return (
        np.concatenate(all_lon) if all_lon else np.empty(0),
        np.concatenate(all_lat) if all_lat else np.empty(0),
        np.concatenate(all_year) if all_year else np.empty(0, np.int64),
    )


# ----------------------------------------------------------------- polygons


def _ngon(cx: float, cy: float, r_base: float, nv: int, key: int, seed: int) -> np.ndarray:
    """Seeded radially-perturbed n-gon, CCW, closed."""
    ang = np.linspace(0.0, 2 * np.pi, nv, endpoint=False)
    radii = r_base * (0.7 + 0.6 * hash_unit(seed, "ngon", np.arange(nv, dtype=np.int64) + key * 64))
    xs = cx + radii * np.cos(ang)
    ys = cy + radii * np.sin(ang)
    ring = np.stack([xs, ys], axis=1)
    return np.concatenate([ring, ring[:1]], axis=0)


def _rect(x0, y0, x1, y1) -> np.ndarray:
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64)


def make_polygons(seed: int = DEFAULT_SEED):
    """Return (poly_ids, kinds, landcover, rings_list) for the fixture set."""
    ids, kinds, lc, rings = [], [], [], []
    # 1 AOI: octagon covering ~70% of the domain
    ids.append("aoi-0")
    kinds.append("aoi")
    lc.append(0)
    rings.append([_ngon((LON_MIN + LON_MAX) / 2, (LAT_MIN + LAT_MAX) / 2, 3.6, 8, 1, seed)])
    # 4 countries: exact 2x2 rectangle tiling (shared borders exercise the
    # half-open ownership rule)
    midx, midy = 23.5, -16.5
    for ci, (x0, y0, x1, y1) in enumerate(
        [
            (LON_MIN, LAT_MIN, midx, midy),
            (midx, LAT_MIN, LON_MAX, midy),
            (LON_MIN, midy, midx, LAT_MAX),
            (midx, midy, LON_MAX, LAT_MAX),
        ]
    ):
        ids.append(f"cty-{ci:02d}")
        kinds.append("country")
        lc.append(0)
        rings.append([_rect(x0, y0, x1, y1)])
    # 8 protected areas
    for p in range(8):
        u = hash_unit(seed, "pa", np.arange(2, dtype=np.int64) + p * 2)
        cx = LON_MIN + 0.8 + u[0] * (LON_MAX - LON_MIN - 1.6)
        cy = LAT_MIN + 0.8 + u[1] * (LAT_MAX - LAT_MIN - 1.6)
        nv = 5 + p % 8
        ids.append(f"pa-{p:03d}")
        kinds.append("protected_area")
        lc.append(0)
        rings.append([_ngon(cx, cy, 0.8, nv, 100 + p, seed)])
    # 240 reference polygons, labeled by the class grid at their center
    for q in range(240):
        u = hash_unit(seed, "ref", np.arange(3, dtype=np.int64) + q * 3)
        if q == 0:  # force one polygon across the hot-spot box
            cx, cy = HOT_LON, HOT_LAT
        else:
            cx = LON_MIN + 0.3 + u[0] * (LON_MAX - LON_MIN - 0.6)
            cy = LAT_MIN + 0.3 + u[1] * (LAT_MAX - LAT_MIN - 0.6)
        r = 0.1 + u[2] * 0.2
        nv = 5 + q % 8
        ids.append(f"ref-{q:04d}")
        kinds.append("reference")
        lc.append(int(class_of(np.array([cx]), np.array([cy]), seed)[0]))
        rings.append([_ngon(cx, cy, r, nv, 1000 + q, seed)])
    # degenerate sliver (near-zero area)
    ids.append("ref-sliver")
    kinds.append("reference")
    lc.append(1)
    rings.append([_rect(21.0, -19.5, 21.5, -19.4999999)])
    return np.asarray(ids, dtype=object), np.asarray(kinds, dtype=object), np.asarray(lc, np.int32), rings


def polygons_table(seed: int = DEFAULT_SEED) -> pa.Table:
    ids, kinds, lc, rings = make_polygons(seed)
    pt = pa.struct([("x", pa.float64()), ("y", pa.float64())])
    rings_arr = pa.array(
        [
            [[{"x": float(x), "y": float(y)} for x, y in ring] for ring in poly]
            for poly in rings
        ],
        type=pa.list_(pa.list_(pt)),
    )
    bbox = pa.array(
        [
            {
                "minx": float(p[0][:, 0].min()),
                "miny": float(p[0][:, 1].min()),
                "maxx": float(p[0][:, 0].max()),
                "maxy": float(p[0][:, 1].max()),
            }
            for p in rings
        ],
        type=pa.struct(
            [("minx", pa.float64()), ("miny", pa.float64()), ("maxx", pa.float64()), ("maxy", pa.float64())]
        ),
    )
    return pa.table(
        {
            "poly_id": pa.array(ids, type=pa.string()),
            "kind": pa.array(kinds, type=pa.string()),
            "LANDCOVER": pa.array(lc, type=pa.int32()),
            "rings": rings_arr,
            "bbox": bbox,
        }
    )


def _write_polygons(tmp: str, seed: int) -> pa.Table:
    tbl = polygons_table(seed)
    pq.write_table(tbl, os.path.join(tmp, "polygons.parquet"))
    return tbl


# ---------------------------------------------------------- training plots


def _write_training_plots(tmp: str, polys: pa.Table, seed: int, n_plots: int = 2000):
    ids, kinds, lc, rings = make_polygons(seed)
    ref_idx = np.nonzero(kinds == "reference")[0]
    pick = (hash_key(seed, "plotpoly", np.arange(n_plots, dtype=np.int64)) % np.uint64(len(ref_idx))).astype(np.int64)
    lons = np.empty(n_plots)
    lats = np.empty(n_plots)
    labels = np.empty(n_plots, dtype=np.int32)
    for j in range(n_plots):
        pi = int(ref_idx[pick[j]])
        ring = rings[pi][0]
        bx0, by0, bx1, by1 = ring[:, 0].min(), ring[:, 1].min(), ring[:, 0].max(), ring[:, 1].max()
        placed = False
        for attempt in range(20):
            u = hash_unit(seed, "plotxy", np.arange(2, dtype=np.int64) + (j * 32 + attempt) * 2)
            x = bx0 + u[0] * (bx1 - bx0)
            y = by0 + u[1] * (by1 - by0)
            if points_in_polygon(np.array([x]), np.array([y]), rings[pi])[0]:
                placed = True
                break
        if not placed:  # centroid fallback (degenerate polygons)
            x, y = float(ring[:-1, 0].mean()), float(ring[:-1, 1].mean())
        lons[j], lats[j] = round(x, 6), round(y, 6)
        labels[j] = lc[pi]
    # two exactly-coincident plots: kNN tie-break fixture
    lons[-1], lats[-1], labels[-1] = lons[-2], lats[-2], labels[-2]
    years = (2020 + hash_key(seed, "plotyear", np.arange(n_plots, dtype=np.int64)) % np.uint64(3)).astype(np.int16)
    tbl = pa.table(
        {
            "plot_id": pa.array([f"plot-{j:05d}" for j in range(n_plots)], type=pa.string()),
            "lon": pa.array(lons, type=pa.float64()),
            "lat": pa.array(lats, type=pa.float64()),
            "LANDCOVER": pa.array(labels, type=pa.int32()),
            "year": pa.array(years, type=pa.int16()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp, "training_plots.parquet"))


# --------------------------------------------------------------- primitives


def _write_primitives(tmp: str, lon, lat, year, seed: int):
    """Per-(tile, year, class) probabilities with argmax ties on ~1% of tiles
    (ties must resolve to the LOWEST class index — band-order argmax semantics
    of src/utils/assemblage.py:12-25)."""
    tile = encode(lon, lat, TILE_LEVEL)
    key = np.unique(np.stack([tile, np.asarray(year, np.int64)], axis=1), axis=0) if lon.size else np.empty((0, 2), np.int64)
    nt = key.shape[0]
    tiles = np.repeat(key[:, 0], N_CLASSES)
    years = np.repeat(key[:, 1], N_CLASSES).astype(np.int16)
    classes = np.tile(np.arange(1, N_CLASSES + 1, dtype=np.int32), nt)
    prob = hash_unit(seed, "prim", hash_key(seed, "tk", tiles * 8 + years.astype(np.int64)) + classes.astype(np.uint64)).astype(np.float32)
    if nt:
        p = prob.reshape(nt, N_CLASSES)
        tie_rows = np.nonzero(hash_key(seed, "tie", key[:, 0].astype(np.uint64)) % np.uint64(100) == 0)[0]
        for r in tie_rows:  # duplicate the max into a second class → tie
            am = int(np.argmax(p[r]))
            other = (am + 3) % N_CLASSES
            p[r, other] = p[r, am]
        prob = p.ravel()
    tbl = pa.table(
        {
            "tile_id": pa.array(tiles, type=pa.int64()),
            "year": pa.array(years, type=pa.int16()),
            "class": pa.array(classes, type=pa.int32()),
            "prob": pa.array(prob, type=pa.float32()),
        }
    )
    pq.write_table(tbl, os.path.join(tmp, "primitives.parquet"))
