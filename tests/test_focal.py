"""Focal/windowed ops vs a dense-grid numpy oracle (incl. halo correctness)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from kaza_lcms_ray.stages import focal
from kaza_lcms_ray.state import cells
from kaza_lcms_ray.state.hashing import hash_unit

LEVEL = 10


def _grid_fixture(n=4000, seed=4):
    # scatter points over a small coordinate window so block borders are hit
    ix = (hash_unit(seed, "x", np.arange(n)) * 200).astype(np.int64) + 64
    iy = (hash_unit(seed, "y", np.arange(n)) * 200).astype(np.int64) + 64
    cid = cells.morton(ix, iy)
    uniq, first = np.unique(cid, return_index=True)
    v = np.round(hash_unit(seed, "v", np.arange(n)) * 100, 2)
    return uniq, ix[first], iy[first], v[first]


def _oracle(ix, iy, v, op, radius):
    out = np.empty(ix.shape[0])
    for i in range(ix.shape[0]):
        sel = (np.abs(ix - ix[i]) <= radius) & (np.abs(iy - iy[i]) <= radius)
        vals = v[sel]
        if op == "mean":
            out[i] = vals.sum() / vals.shape[0]
        elif op == "min":
            out[i] = vals.min()
        elif op == "max":
            out[i] = vals.max()
        elif op == "count":
            out[i] = vals.shape[0]
    return out


@pytest.mark.parametrize("op,radius", [("mean", 1), ("min", 2), ("max", 1), ("count", 2)])
def test_focal_matches_oracle(ray_session, op, radius):
    cid, ix, iy, v = _grid_fixture()
    ds = rd.from_pandas(pd.DataFrame({"cell_id": cid, "val": v}))
    got = (
        focal.focal(ds, "val", op, radius, level=LEVEL, block_bits=4)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    order = np.argsort(cid)
    exp = _oracle(ix, iy, v, op, radius)[order]
    assert len(got) == cid.shape[0]
    assert np.allclose(got[f"focal_{op}"].to_numpy(), exp, rtol=0, atol=1e-12)


def test_dilate_mask(ray_session):
    # a lone flagged cell is erased by erosion; a 3x3 solid block survives
    # and dilates outward
    ids = []
    flags = []
    for x in range(100, 103):
        for y in range(100, 103):
            ids.append(int(cells.morton(np.array([x]), np.array([y]))[0]))
            flags.append(1)
    ids.append(int(cells.morton(np.array([200]), np.array([200]))[0]))
    flags.append(1)
    # surrounding zero rings so erosion has neighbors to see (absent cells
    # are excluded from the window per masked-raster semantics)
    for x0, x1, y0, y1 in ((98, 105, 98, 105), (198, 203, 198, 203)):
        for x in range(x0, x1):
            for y in range(y0, y1):
                c = int(cells.morton(np.array([x]), np.array([y]))[0])
                if c not in ids:
                    ids.append(c)
                    flags.append(0)
    ds = rd.from_pandas(pd.DataFrame({"cell_id": ids, "flag": flags}))
    out = focal.dilate_mask(ds, "flag", erode=1, dilate=2, level=LEVEL).to_pandas()
    lookup = dict(zip(out["cell_id"], out["mask"]))
    center = int(cells.morton(np.array([101]), np.array([101]))[0])
    corner = int(cells.morton(np.array([99]), np.array([99]))[0])
    lone = int(cells.morton(np.array([200]), np.array([200]))[0])
    assert lookup[center] == 1  # solid block survives erosion
    assert lookup[corner] == 1  # dilation reaches the ring
    assert lookup[lone] == 0  # lone pixel eroded away (open)
