"""Round-2 operators: cloud-shadow chain (M1/M2), geometry erode (M20),
coalesce compose + refined Lee (A11/M18), volumetric terrain (M17),
sampling allocation, stratified area CI, general harmonics."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from kaza_lcms_ray.stages import allocation, cloudmask, zonal
from kaza_lcms_ray.state import cells, geom


def _cell_table(flags: np.ndarray, x0=100, y0=100):
    """2-D flag grid → Dataset[cell_id, is_cloud] at CELL_LEVEL."""
    w, h = flags.shape
    gx, gy = np.meshgrid(np.arange(w) + x0, np.arange(h) + y0, indexing="ij")
    return rd.from_arrow(
        pa.table(
            {
                "cell_id": pa.array(cells.morton(gx.ravel(), gy.ravel())),
                "is_cloud": pa.array(flags.ravel().astype(np.int32)),
            }
        )
    )


def test_directional_distance_transform_matches_bruteforce(ray_session):
    rng = np.random.default_rng(4)
    flags = (rng.random((12, 12)) < 0.15).astype(np.int32)
    ds = _cell_table(flags)
    max_dist = 4
    az = 90.0  # east: step (dx=1, dy=0) → shadow cast eastward
    out = (
        cloudmask.directional_distance_transform(ds, "is_cloud", az, max_dist)
        .to_pandas()
        .set_index("cell_id")["cloud_transform"]
    )
    dx, dy = cloudmask.azimuth_step(az)
    assert (dx, dy) == (1, 0)
    w, h = flags.shape
    for i in range(w):
        for j in range(h):
            want = 0
            for d in range(1, max_dist + 1):
                pi, pj = i - dx * d, j - dy * d
                if 0 <= pi < w and 0 <= pj < h and flags[pi, pj]:
                    want = d
                    break
            cid = int(cells.morton(np.array([i + 100]), np.array([j + 100]))[0])
            assert out[cid] == want, (i, j)


def test_cloud_shadow_mask_chain(ray_session):
    flags = np.zeros((10, 10), dtype=np.int32)
    flags[2, 5] = 1  # one cloud
    clouds = _cell_table(flags)
    dark = np.ones((10, 10), dtype=np.int32)  # everything dark
    dark_ds = _cell_table(dark).map_batches(
        lambda t: t.rename_columns(["cell_id", "dark_pixels"]),
        batch_format="pyarrow",
    )
    out = cloudmask.cloud_shadow_mask(
        clouds, dark_ds, azimuth_deg=90.0, max_dist=3, erode=0, dilate=1
    ).to_pandas()
    m = out.set_index("cell_id")["mask"]
    cloud_cell = int(cells.morton(np.array([102]), np.array([105]))[0])
    shadow_cell = int(cells.morton(np.array([104]), np.array([105]))[0])
    far_cell = int(cells.morton(np.array([109]), np.array([100]))[0])
    assert m[cloud_cell] == 1 and m[shadow_cell] == 1
    assert m[far_cell] == 0


def test_cloud_prob_and_dark_batches():
    t = pa.table({"prob": [10.0, 60.0], "nir": [100.0, 900.0], "water": [0, 0]})
    t = cloudmask.cloud_prob_mask_batch(t, "prob", 50.0)
    assert t.column("is_cloud").to_pylist() == [0, 1]
    t = cloudmask.dark_pixels_batch(t, "nir", 500.0, water_col="water")
    assert t.column("dark_pixels").to_pylist() == [1, 0]


def test_erode_polygon_m20():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    er = geom.erode_polygon([sq], 2.0)
    assert er is not None
    assert np.allclose(
        sorted(map(tuple, er[0][:-1])), [(2, 2), (2, 8), (8, 2), (8, 8)]
    )
    assert geom.erode_polygon([sq], 6.0) is None  # collapses past inradius
    # eroded boundary strictly inside the original
    ang = np.linspace(0, 2 * np.pi, 9)
    octo = np.stack([np.cos(ang), np.sin(ang)], axis=1)
    e = geom.erode_ring(octo, 0.15)
    assert geom.points_in_ring(e[:-1, 0], e[:-1, 1], octo).all()


def test_disprop_allocation():
    df = pd.DataFrame(
        {
            "LANDCOVER": [1, 2, 3, 4],
            "area_scaled": [700, 200, 60, 40],
            "is_majority": [True, False, False, False],
        }
    )
    out = allocation.disprop_allocation(df, total_points=100, boost=2.0, min_points=5)
    assert out["suggested_points"].sum() == 100
    assert (out["suggested_points"] >= 5).all()
    # minority boost: class 2's allocation exceeds its proportional share
    assert out.loc[out.LANDCOVER == 2, "suggested_points"].iloc[0] > 20


def test_stratified_area_estimate_hand_oracle():
    from kaza_lcms_ray.pipelines.primitives import stratified_area_estimate

    # two strata, W1=0.6 W2=0.4; samples: stratum1 n=10 (8 ref=1, 2 ref=2),
    # stratum2 n=10 (3 ref=1, 7 ref=2)
    mapc = np.array([1] * 10 + [2] * 10)
    refc = np.array([1] * 8 + [2] * 2 + [1] * 3 + [2] * 7)
    out = stratified_area_estimate({1: 0.6, 2: 0.4}, mapc, refc, 1000.0)
    r1 = out[out.LANDCOVER == 1].iloc[0]
    want_p1 = 0.6 * 0.8 + 0.4 * 0.3
    assert np.isclose(r1.area_share, want_p1)
    want_var = 0.6**2 * 0.8 * 0.2 / 9 + 0.4**2 * 0.3 * 0.7 / 9
    assert np.isclose(r1.se, np.sqrt(want_var))
    assert np.isclose(r1.ci95, 1.96 * np.sqrt(want_var))
    assert np.isclose(r1.area_m2, want_p1 * 1000.0)
    # shares sum to 1 across classes
    assert np.isclose(out.area_share.sum(), 1.0)


def test_harmonic_fit_modes_recovers_planted_signal(ray_session):
    # planted two-mode signal on a dense year of observations
    doy = np.arange(1, 366)
    year = np.full(doy.shape, 2020)
    t = ((year - 1970) * 365 + (doy - 1)) / 365.0
    y = (
        5.0
        + 2.0 * np.cos(2 * np.pi * t - 1.0)
        + 0.5 * np.cos(4 * np.pi * t - 0.3)
    )
    df = pd.DataFrame(
        {
            "tile_id": 7,
            "year": year.astype(np.int32),
            "doy": doy.astype(np.int32),
            "c3": np.rint(y * 100).astype(np.int64),
        }
    )
    out = zonal.harmonic_fit_modes(
        rd.from_pandas(df), keys=("tile_id",), band=3, modes=(1, 2)
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert abs(r.amplitude_1 - 2.0) < 0.02
    assert abs(r.amplitude_2 - 0.5) < 0.02
    # A·cos w + B·sin w = 2·cos(w − 1) → A = 2cos1, B = 2sin1;
    # peak at w = 1 rad → doy = (1/2π)·365 + 1
    want_peak = (1.0 / (2 * np.pi)) * 365.0 + 1.0
    assert abs(r.peak_doy - want_peak) < 1.5


def test_sample_pts_pipeline_shapes(synth_small, ray_session):
    from kaza_lcms_ray.pipelines import sample_pts

    pts = sample_pts.sample_pts_pipeline(synth_small, n_points=20).to_pandas()
    assert set(pts.columns) == {"LON", "LAT", "PLOTID", "SAMPLEID", "LANDCOVER"}
    assert (pts.groupby("LANDCOVER").size() <= 20).all()
    assert pts.PLOTID.str.startswith("0_").all()
    assert (pts.PLOTID == pts.SAMPLEID).all()
    assert pts.PLOTID.is_unique


def test_ms_case_table_shape():
    from kaza_lcms_ray.stages import terrain

    tab = terrain._ms_case_table()
    assert len(tab) == 32
    for k, segs in tab.items():
        idx = k // 2
        n_above = bin(idx).count("1")
        if idx in (0, 15):
            assert segs == []
        elif idx in (5, 10):
            assert len(segs) == 2
        else:
            assert len(segs) == 1
        for e1, e2 in segs:
            assert 0 <= e1 < e2 <= 3


def test_dem_contours_points_on_level(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.state import cells as cellmod
    from kaza_lcms_ray.state.dem import elev
    from kaza_lcms_ray.stages import terrain

    # occupied cells across the AOI
    lon = np.linspace(20.0, 26.9, 60)
    lat = np.linspace(-19.9, -13.1, 60)
    cid = cellmod.encode(lon, lat, cellmod.CELL_LEVEL).astype(np.int64)
    geo = rd.from_arrow(pa.table({"cell_id": pa.array(np.unique(cid))}))
    out = terrain.dem_contours(geo, contour=0.0).to_pandas()
    assert len(out) > 0
    # every emitted endpoint interpolates the DEM to ~the contour level
    for x, y in [("x1", "y1"), ("x2", "y2")]:
        e = elev(out[x].to_numpy(), out[y].to_numpy())
        # linear interpolation of a smooth field across ~0.09 deg cells:
        # loose tolerance, but melts if the case table or interp is wrong
        assert np.abs(e).max() < 25.0
    # endpoints lie on the cell boundary (one coord at a grid line)
    n = float(1 << cellmod.CELL_LEVEL)
    for x, y in [("x1", "y1"), ("x2", "y2")]:
        gx = (out[x].to_numpy() + 180.0) / 360.0 * n
        gy = (out[y].to_numpy() + 90.0) / 180.0 * n
        on_x = np.abs(gx - np.round(gx)) < 1e-6
        on_y = np.abs(gy - np.round(gy)) < 1e-6
        assert (on_x | on_y).all()
