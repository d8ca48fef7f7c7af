"""Cloud / cloud-shadow masking chain (SURVEY.md M1-M2), cell-grid analog of
the reference's s2cloudless workflow (src/utils/s2process.py:33-97):

  M1  cloud-probability threshold  → is_cloud          (:40-46)
  M2  dark pixels + DIRECTIONAL DISTANCE TRANSFORM of clouds along the
      shadow azimuth → cloud_transform, shadows        (:48-71)
  M3  focal_min/focal_max cleanup of the combined mask (:73-91, focal.py)

Ray shape: the directional transform is a windowed op along ONE direction —
same halo-exchange block pattern as focal, with the halo radius equal to the
projection distance and the per-block kernel a vectorized shift-and-minimum
along the (quantized) azimuth step.  Documented simplification vs EE: the
marching direction is quantized to the nearest of the 8 grid directions (EE
resamples along a real-valued bearing); distances are Chebyshev steps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..state import cells
from .focal import block_fanout


def cloud_prob_mask_batch(t: pa.Table, prob_col: str, thresh: float = 50.0) -> pa.Table:
    """M1: probability > threshold → is_cloud 0/1 (s2process.py:40-46)."""
    return t.append_column(
        "is_cloud", pc.cast(pc.greater(t.column(prob_col), thresh), pa.int32())
    )


def dark_pixels_batch(
    t: pa.Table, nir_col: str, dark_thresh: float, water_col: str | None = None
) -> pa.Table:
    """M2a: NIR below threshold and not water → dark_pixels
    (s2process.py:52-55)."""
    dark = pc.less(t.column(nir_col), dark_thresh)
    if water_col is not None:
        dark = pc.and_(dark, pc.equal(t.column(water_col), 0))
    return t.append_column("dark_pixels", pc.cast(dark, pa.int32()))


def azimuth_step(azimuth_deg: float) -> tuple[int, int]:
    """Quantize a bearing (degrees clockwise from north) to one of the 8
    grid steps (dx = east, dy = north)."""
    rad = np.deg2rad(azimuth_deg)
    dx = int(np.round(np.sin(rad)))
    dy = int(np.round(np.cos(rad)))
    if dx == 0 and dy == 0:  # cannot happen for |round| of unit circle
        dy = 1
    return dx, dy


def directional_distance_transform(
    ds,
    flag_col: str,
    azimuth_deg: float,
    max_dist: int,
    level: int = cells.CELL_LEVEL,
    block_bits: int = 5,
):
    """M2b: per cell, the smallest d ∈ [1, max_dist] such that the cell
    ``d`` steps BACK along the azimuth is flagged (the shadow cast by a
    cloud at distance d); cells with no flagged cell upstream get distance 0
    (unmasked — EE's .mask() analog keeps them out of the shadow zone).

    Returns Dataset[cell_id, cloud_transform:int32].
    """
    assert max_dist < (1 << block_bits)
    dx, dy = azimuth_step(azimuth_deg)

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        ix = g["ix"].to_numpy()
        iy = g["iy"].to_numpy()
        v = g["v"].to_numpy()
        home = g["home"].to_numpy()
        x0, y0 = ix.min(), iy.min()
        w = int(ix.max() - x0) + 1
        h = int(iy.max() - y0) + 1
        flag = np.zeros((w, h), dtype=bool)
        flag[ix - x0, iy - y0] = v > 0
        dist = np.zeros((w, h), dtype=np.int32)
        for d in range(1, max_dist + 1):
            sx, sy = -dx * d, -dy * d  # look back along the azimuth
            sh = np.zeros_like(flag)
            xs = slice(max(0, sx), w + min(0, sx))
            xd = slice(max(0, -sx), w + min(0, -sx))
            ys = slice(max(0, sy), h + min(0, sy))
            yd = slice(max(0, -sy), h + min(0, -sy))
            sh[xd, yd] = flag[xs, ys]
            hit = sh & (dist == 0)
            dist[hit] = d
        hx, hy = ix[home], iy[home]
        return pd.DataFrame(
            {
                "cell_id": cells.morton(hx, hy),
                "cloud_transform": dist[hx - x0, hy - y0],
            }
        )

    return (
        block_fanout(ds, flag_col, max_dist, level, block_bits)
        .groupby("block")
        .map_groups(per_block, batch_format="pandas")
        .select_columns(["cell_id", "cloud_transform"])
    )


def cloud_shadow_mask(
    cloud_cells,
    dark_cells,
    azimuth_deg: float,
    max_dist: int = 10,
    level: int = cells.CELL_LEVEL,
    erode: int = 1,
    dilate: int = 2,
    num_partitions: int | None = None,
):
    """Full M1→M3 chain over per-cell tables: project cloud shadows along
    the azimuth, intersect with dark cells, OR with clouds, then
    open-then-dilate cleanup (add_cld_shdw_mask, s2process.py:73-91).

    cloud_cells: Dataset[cell_id, is_cloud]; dark_cells: Dataset[cell_id,
    dark_pixels].  Returns Dataset[cell_id, mask] (1 = cloud or shadow).
    """
    from ..runtime import join_partitions
    from .focal import dilate_mask

    proj = directional_distance_transform(
        cloud_cells, "is_cloud", azimuth_deg, max_dist, level
    ).materialize()
    if num_partitions is None:
        # sized so no partition is empty (Ray 2.49 empty-partition join bug)
        num_partitions = (
            1 if proj.count() < 20_000 else join_partitions(rows_hint=proj.count())
        )
    joined = proj.join(
        dark_cells,
        join_type="inner",
        num_partitions=num_partitions,
        on=("cell_id",),
    ).materialize()
    shadows = joined.map_batches(
        lambda t: pa.table(
            {
                "cell_id": t.column("cell_id"),
                "shadow": pc.cast(
                    pc.and_(
                        pc.greater(t.column("cloud_transform"), 0),
                        pc.greater(t.column("dark_pixels"), 0),
                    ),
                    pa.int32(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    both = shadows.join(
        cloud_cells,
        join_type="inner",
        num_partitions=num_partitions,
        on=("cell_id",),
    ).materialize()
    combined = both.map_batches(
        lambda t: pa.table(
            {
                "cell_id": t.column("cell_id"),
                "flag": pc.cast(
                    pc.or_(
                        pc.greater(t.column("shadow"), 0),
                        pc.greater(t.column("is_cloud"), 0),
                    ),
                    pa.int32(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return dilate_mask(combined, "flag", erode=erode, dilate=dilate, level=level)
