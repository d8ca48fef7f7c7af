"""00sample_pts analog: stratified CEO-formatted sample points from an
existing land-cover table (SURVEY.md §3 step 0; src/00sample_pts.py).

Reference flow: stratified random sample from an LC image → ``ceoClean``
(LON/LAT/PLOTID/SAMPLEID columns, src/00sample_pts.py:30-37) →
``plot_id_global`` prefix for cross-AOI uniqueness (:39-46) → CSV export
with the LON,LAT,PLOTID,SAMPLEID,<class> selectors (:208,
src/utils/exports.py:36-45).

Engine flow: the LC "image" is a tile-label table (tile_id, year,
LANDCOVER); stratification uses the seeded-hash random column
(sampling.stratified_sample — deterministic randomColumn analog), a point
is the tile's center, and every step is replayed bit-exactly by the DuckDB
oracle (hash SQL + Morton-decode SQL).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..config import CLASSES, DEFAULT_CONFIG
from ..state import cells
from ..stages import sampling


def ceo_format_batch(t: pa.Table, aoi_n: int, level: int) -> pa.Table:
    """Tile rows → CEO columns: LON/LAT (tile center), PLOTID = SAMPLEID =
    '{aoi_n}_{tile_id}' (ceoClean + plot_id_global)."""
    tid = t.column("tile_id").to_numpy(zero_copy_only=False)
    lon, lat = cells.cell_center(tid, level)
    gid = np.char.add(f"{aoi_n}_", tid.astype(np.int64).astype(str))
    return pa.table(
        {
            "LON": pa.array(lon),
            "LAT": pa.array(lat),
            "PLOTID": pa.array(gid, type=pa.string()),
            "SAMPLEID": pa.array(gid, type=pa.string()),
            "LANDCOVER": t.column("LANDCOVER"),
        }
    )


def stratified_points(
    labels,
    class_points: dict[int, int] | None = None,
    n_points: int = 100,
    seed: int = DEFAULT_CONFIG.seed,
    aoi_n: int = 0,
    level: int = cells.TILE_LEVEL,
):
    """labels Dataset[tile_id, LANDCOVER] → CEO-formatted sample points.

    ``class_points`` gives per-class counts; otherwise every class gets
    ``n_points`` (the reference's equal-allocation default warning,
    src/00sample_pts.py:176-180).
    """
    if class_points is None:
        class_points = {c: n_points for c in CLASSES}
    capped = sampling.stratified_sample(
        labels, "LANDCOVER", ["tile_id"], class_points, seed=seed
    )
    return capped.map_batches(
        lambda t: ceo_format_batch(t, aoi_n, level), batch_format="pyarrow"
    )


def export_ceo_csv(points, out_path: str) -> str:
    """Projected CSV export with the reference's selector set
    (LON,LAT,PLOTID,SAMPLEID,LANDCOVER)."""
    from ..sources.sinks import export_csv

    return export_csv(
        points, out_path, selectors=["LON", "LAT", "PLOTID", "SAMPLEID", "LANDCOVER"]
    )


def sample_pts_pipeline(
    synth_root: str,
    out_path: str | None = None,
    year: int = 2020,
    n_points: int = 100,
    seed: int = DEFAULT_CONFIG.seed,
    aoi_n: int = 0,
):
    """End-to-end 00sample_pts: assemble tile labels for one year →
    stratified CEO points → (optional) CSV export."""
    import ray.data as rd

    from ..stages import assemblage

    prims = rd.read_parquet(f"{synth_root}/primitives.parquet")
    labels = (
        assemblage.assemble_tile_labels(prims)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
    )
    pts = stratified_points(labels, n_points=n_points, seed=seed, aoi_n=aoi_n)
    if out_path:
        export_ceo_csv(pts, out_path)
    return pts
