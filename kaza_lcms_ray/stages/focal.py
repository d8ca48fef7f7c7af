"""Focal (windowed) operations on the cell grid: neighborhood min / max /
mean / variance with halo exchange (SURVEY.md M2/M3/A8).

Reference analogs: the cloud-shadow morphology ``focal_min(2).focal_max(10)``
dilate/erode (src/utils/s2process.py:73-91), directional distance transform
neighborhoods (src/utils/s2process.py:48-71), and the 3×3
``reduceNeighborhood(mean/variance)`` speckle statistics
(src/misc/sentinel1.py:182-183).

Ray shape (the documented partitioning assumption): cells at level L are
grouped into square BLOCKS = their ancestor at level L−block_bits (a
2^block_bits × 2^block_bits cell tile).  Each cell fans out to its home
block and to any neighbor block within ``radius`` of the block border (halo
rows).  One ``groupby(block).map_groups`` call scatters the block's cells
(+halo) into a dense 2-D array and runs the window op fully vectorized
(shift-and-combine over the (2r+1)² offsets — r is small), then emits only
home cells.  Missing cells are absent from the aggregate (count-weighted
mean/variance), matching masked-raster semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state import cells

OPS = ("min", "max", "mean", "var", "sum", "count")


def block_fanout(
    ds,
    value_col: str,
    radius: int,
    level: int,
    block_bits: int = 5,
    cell_col: str = "cell_id",
):
    """Cell rows → (block, ix, iy, v, home) halo-exchange fanout: each cell
    goes to its home block plus any neighbor block within ``radius`` of the
    border.  Shared by every windowed kernel (focal, lee_sigma, directional
    transforms)."""
    nblock = 1 << block_bits

    def fanout(t: pa.Table) -> pa.Table:
        cid = t.column(cell_col).to_numpy(zero_copy_only=False)
        val = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ix, iy = cells.decode(cid, level)
        bx, by = ix >> block_bits, iy >> block_bits
        # home block + neighbor blocks when within radius of the border
        out_b, out_ix, out_iy, out_v, out_home = [], [], [], [], []
        n_side = np.int64(1) << (level - block_bits)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    sel = np.ones(ix.shape[0], dtype=bool)
                else:
                    lx = ix - (bx << block_bits)
                    ly = iy - (by << block_bits)
                    near_x = (lx < radius) if dx < 0 else (lx >= nblock - radius) if dx > 0 else np.ones_like(lx, bool)
                    near_y = (ly < radius) if dy < 0 else (ly >= nblock - radius) if dy > 0 else np.ones_like(ly, bool)
                    sel = near_x & near_y
                if not sel.any():
                    continue
                tbx, tby = bx[sel] + dx, by[sel] + dy
                ok = (tbx >= 0) & (tbx < n_side) & (tby >= 0) & (tby < n_side)
                if not ok.any():
                    continue
                idx = np.nonzero(sel)[0][ok]
                out_b.append(cells.morton(tbx[ok], tby[ok]))
                out_ix.append(ix[idx])
                out_iy.append(iy[idx])
                out_v.append(val[idx])
                out_home.append(np.full(idx.shape[0], dx == 0 and dy == 0))
        return pa.table(
            {
                "block": pa.array(np.concatenate(out_b)),
                "ix": pa.array(np.concatenate(out_ix)),
                "iy": pa.array(np.concatenate(out_iy)),
                "v": pa.array(np.concatenate(out_v)),
                "home": pa.array(np.concatenate(out_home)),
            }
        )

    return ds.map_batches(fanout, batch_format="pyarrow")


def focal(
    ds,
    value_col: str,
    op: str = "mean",
    radius: int = 1,
    level: int = cells.CELL_LEVEL,
    block_bits: int = 5,
    cell_col: str = "cell_id",
):
    """Dataset[cell_id, value] → Dataset[cell_id, focal_<op>].

    Input must have ONE row per cell (aggregate first if needed).
    """
    assert op in OPS
    assert radius < (1 << block_bits)

    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        ix = g["ix"].to_numpy()
        iy = g["iy"].to_numpy()
        v = g["v"].to_numpy()
        home = g["home"].to_numpy()
        x0, y0 = ix.min(), iy.min()
        w = int(ix.max() - x0) + 1
        h = int(iy.max() - y0) + 1
        grid = np.full((w, h), np.nan)
        grid[ix - x0, iy - y0] = v
        present = ~np.isnan(grid)
        gz = np.where(present, grid, 0.0)

        def shifts(arr, combine, init):
            acc = np.full_like(arr, init, dtype=np.float64)
            for dx in range(-radius, radius + 1):
                for dy in range(-radius, radius + 1):
                    sh = np.full_like(arr, init, dtype=np.float64)
                    xs = slice(max(0, dx), w + min(0, dx))
                    xd = slice(max(0, -dx), w + min(0, -dx))
                    ys = slice(max(0, dy), h + min(0, dy))
                    yd = slice(max(0, -dy), h + min(0, -dy))
                    sh[xd, yd] = arr[xs, ys]
                    acc = combine(acc, sh)
            return acc

        cnt = shifts(present.astype(np.float64), np.add, 0.0)
        if op == "count":
            res = cnt
        elif op == "sum":
            res = shifts(gz, np.add, 0.0)
        elif op == "mean":
            res = shifts(gz, np.add, 0.0) / np.maximum(cnt, 1.0)
        elif op == "var":
            s1 = shifts(gz, np.add, 0.0)
            s2 = shifts(gz * gz, np.add, 0.0)
            m = s1 / np.maximum(cnt, 1.0)
            res = s2 / np.maximum(cnt, 1.0) - m * m
        elif op == "min":
            masked = np.where(present, grid, np.inf)
            res = shifts(masked, np.minimum, np.inf)
        else:  # max
            masked = np.where(present, grid, -np.inf)
            res = shifts(masked, np.maximum, -np.inf)

        hx, hy = ix[home], iy[home]
        out_cells = cells.morton(hx, hy)
        return pd.DataFrame(
            {cell_col: out_cells, f"focal_{op}": res[hx - x0, hy - y0]}
        )

    return (
        block_fanout(ds, value_col, radius, level, block_bits, cell_col)
        .groupby("block")
        .map_groups(per_block, batch_format="pandas")
        .select_columns([cell_col, f"focal_{op}"])
    )


def dilate_mask(ds, flag_col: str, erode: int = 1, dilate: int = 2, level: int = cells.CELL_LEVEL):
    """Morphological open-then-dilate of a 0/1 cell mask — the
    focal_min(a).focal_max(b) cloud-mask cleanup (src/utils/s2process.py:88).

    Returns Dataset[cell_id, mask] with the cleaned 0/1 flag."""
    eroded = focal(ds.select_columns(["cell_id", flag_col]), flag_col, "min", erode, level)

    def rename1(t: pa.Table) -> pa.Table:
        return t.rename_columns(["cell_id", "v_eroded"])

    dilated = focal(
        eroded.map_batches(rename1, batch_format="pyarrow"), "v_eroded", "max", dilate, level
    )

    def rename2(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.rename_columns(["cell_id", "mask"])
        return t.set_column(1, "mask", pc.cast(t.column("mask"), pa.int32()))

    return dilated.map_batches(rename2, batch_format="pyarrow")
