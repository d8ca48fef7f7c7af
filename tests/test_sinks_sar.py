"""Sinks (CSV/idempotent/metrics) and SAR kernels."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from kaza_lcms_ray.sources import sinks
from kaza_lcms_ray.stages import sar


def test_export_csv_projection(ray_session, tmp_path):
    ds = rd.from_pandas(pd.DataFrame({"a": [1, 2], "b": ["x", "y"], "c": [0.5, 0.25]}))
    out = str(tmp_path / "csv_out")
    sinks.export_csv(ds, out, selectors=["a", "c"])
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert files
    df = pd.concat([pd.read_csv(os.path.join(out, f)) for f in files])
    assert list(df.columns) == ["a", "c"] and len(df) == 2


def test_export_table_idempotent(ray_session, tmp_path):
    ds = rd.from_pandas(pd.DataFrame({"a": [1, 2, 3]}))
    out = str(tmp_path / "tbl_out")
    assert sinks.export_table(ds, out) is True
    assert sinks.export_table(ds, out) is False  # second call skips


def test_write_metrics(tmp_path):
    models = {
        1: {"oob": 0.1, "features": ["a", "b"], "importance": {"a": 3.0, "b": 1.0}},
        2: {"oob": 0.2, "features": ["a"], "importance": {"a": 2.0, "b": 0.5}},
    }
    report = {
        "classes": [1, 2],
        "matrix": np.array([[5, 1], [2, 4]]),
        "overall_accuracy": 0.75,
        "producers_accuracy": np.array([5 / 6, 4 / 6]),
        "users_accuracy": np.array([5 / 7, 4 / 5]),
        "f1": np.array([0.77, 0.73]),
    }
    out = sinks.write_metrics(models, report, str(tmp_path / "metrics"))
    for f in ("oob.csv", "confusion_matrix.csv", "accuracy_by_class.csv", "overall.txt", "importance_class1.csv"):
        assert os.path.exists(os.path.join(out, f)), f


def test_sar_scalar_kernels():
    t = pa.table({"vv": [0.0, 10.0, 20.0], "vh": [-5.0, 5.0, 10.0]})
    t = sar.to_natural_batch(t, "vv", "vv_nat")
    assert np.allclose(t.column("vv_nat").to_numpy(), [1.0, 10.0, 100.0])
    t = sar.to_db_batch(t, "vv_nat", "vv_db")
    assert np.allclose(t.column("vv_db").to_numpy(), [0.0, 10.0, 20.0])
    t = sar.add_ratio_batch(t, "vh", "vv", "r")
    assert t.column("r").to_numpy()[1] == 0.5


def test_terrain_correction_volumetric():
    t = pa.table(
        {
            "v": [1.0, 1.0, 1.0],
            "slope": [0.0, 80.0, 45.0],
            "aspect": [0.0, 180.0, 0.0],
        }
    )
    out = sar.terrain_correct_batch(t, "v", "slope", "aspect")
    g = out.column("gamma0_vol_db").to_numpy()
    inc = np.deg2rad(35.0)
    # flat terrain: volModel == 1 → pure γ0 conversion of the dB value
    assert np.isclose(g[0], 10 * np.log10((10**0.1) / np.cos(inc)))
    # steep away-facing slope: θ_lia = 115° > 85° → radar shadow (flag False)
    assert not out.column("shadow").to_numpy()[1]
    assert out.column("shadow").to_numpy()[0]
    # toward-sensor 45° slope at heading 0: α_r = slope; ≥ view angle → layover
    assert np.isclose(out.column("alpha_r_deg").to_numpy()[2], 45.0)
    assert not out.column("layover").to_numpy()[2]


def test_refined_lee_compose_and_coalesce():
    # three regimes: pure speckle (var≈0), low texture, high texture
    x = np.array([10.0, 10.0, 10.0])
    m = np.array([10.0, 10.0, 10.0])
    enl = 7.0
    cu = 1.0 / np.sqrt(enl)
    # ci = sqrt(v)/m → choose v for ci = 0.5·cu, 1.2·cu, 2·cu
    ci = np.array([0.5 * cu, 1.2 * cu, 2.0 * cu])
    v = (ci * m) ** 2
    t = pa.table({"x": x, "m": m, "v": v})
    out = sar.refined_lee_batch(t, "x", "m", "v", enl=enl)
    f = out.column("filtered").to_numpy()
    assert f[0] == 10.0  # pure speckle → mean
    assert f[2] == 10.0  # high texture → passthrough (x)
    # low-texture branch: the refined estimator formula
    alpha = (1 + cu * cu) / (ci[1] ** 2 - cu * cu)
    b = alpha - (enl + 1)
    d = m[1] ** 2 * b * b + 4 * alpha * enl * m[1] * x[1]
    want = (b * m[1] + np.sqrt(d)) / (2 * alpha)
    assert np.isclose(f[1], want)
    # A11 coalesce: first non-null wins
    t2 = pa.table({"p": [None, 2.0], "q": [1.0, 3.0]})
    got = sar.compose_coalesce_batch(t2, ["p", "q"], "out").column("out").to_pylist()
    assert got == [1.0, 2.0]


def test_lee_sigma_runs(ray_session):
    from kaza_lcms_ray.state import cells
    from kaza_lcms_ray.state.hashing import hash_unit

    n = 500
    ix = (hash_unit(8, "x", np.arange(n)) * 50).astype(np.int64) + 10
    iy = (hash_unit(8, "y", np.arange(n)) * 50).astype(np.int64) + 10
    cid = cells.morton(ix, iy)
    uniq, first = np.unique(cid, return_index=True)
    v = hash_unit(8, "v", np.arange(n))[first] * 100
    ds = rd.from_pandas(pd.DataFrame({"cell_id": uniq, "value": v}))
    out = sar.lee_sigma(ds, "value", level=10).to_pandas()
    assert len(out) == len(uniq)
    # filter pulls values toward the local mean (variance shrinks)
    assert out["filtered"].var() <= out["value"].var() + 1e-9


def test_csv_round_trip_via_ray_reader(ray_session, tmp_path):
    """Exported CSV reads back through ray.data.read_csv as an equal
    Dataset — the CSV source path a CEO-tool round trip uses."""
    src = pd.DataFrame(
        {
            "PLOTID": [f"kaza_{i}" for i in range(50)],
            "LON": np.linspace(20.0, 26.0, 50),
            "LAT": np.linspace(-20.0, -14.0, 50),
            "LANDCOVER": np.arange(50) % 8,
        }
    )
    out = str(tmp_path / "roundtrip")
    sinks.export_csv(rd.from_pandas(src).repartition(3), out)
    back = (
        rd.read_csv(out)
        .to_pandas()
        .sort_values("PLOTID")
        .reset_index(drop=True)
    )
    src_sorted = src.sort_values("PLOTID").reset_index(drop=True)
    assert list(back.columns) == list(src.columns)
    pd.testing.assert_frame_equal(back, src_sorted, check_dtype=False)


def test_flow_direction_bruteforce(ray_session, synth_small):
    """D8 codes are valid; every cell's winner matches a per-cell brute
    force over the 8 analytic neighbor gradients."""
    import math

    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import spans, terrain
    from kaza_lcms_ray.state import cells as C
    from kaza_lcms_ray.state import dem

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    out = terrain.flow_direction(geo).to_pandas()
    assert len(out) > 0
    valid = {0, 1, 2, 4, 8, 16, 32, 64, 128}
    assert set(out["flow_dir"].unique()).issubset(valid)
    assert (out.loc[out["flow_dir"] == 0, "grad"] == 0.0).all()
    assert (out.loc[out["flow_dir"] != 0, "grad"] > 0.0).all()
    nf = float(1 << C.CELL_LEVEL)

    def e_at(ix, iy):
        lon = (ix + 0.5) / nf * 360.0 - 180.0
        lat = (iy + 0.5) / nf * 180.0 - 90.0
        return float(dem.elev(np.float64(lon), np.float64(lat)))

    for _, r in out.head(50).iterrows():
        ix, iy = C.decode(np.array([r["cell_id"]]), C.CELL_LEVEL)
        ix, iy = int(ix[0]), int(iy[0])
        e0 = e_at(ix, iy)
        best_g, best_c = 0.0, 0
        for dx, dy, code in terrain.D8_OFFSETS:
            den = math.sqrt(2.0) if dx != 0 and dy != 0 else 1.0
            g = (e0 - e_at(ix + dx, iy + dy)) / den
            if g > best_g:
                best_g, best_c = g, code
        assert r["flow_dir"] == best_c
        assert r["grad"] == best_g
        assert r["elev"] == e0


def test_inflow_count_conservation(ray_session, synth_small):
    """Σ inflow = number of flowing cells whose D8 target is occupied;
    zero-inflow ridges exist."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import spans, terrain
    from kaza_lcms_ray.state import cells as C

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    out = terrain.inflow_count(geo).to_pandas()
    assert len(out) > 0
    occ = set(out["cell_id"].tolist())
    dxdy = {c: (dx, dy) for dx, dy, c in terrain.D8_OFFSETS}
    expected_total = 0
    for _, r in out.iterrows():
        if r["flow_dir"] == 0:
            continue
        ix, iy = C.decode(np.array([r["cell_id"]]), C.CELL_LEVEL)
        dx, dy = dxdy[int(r["flow_dir"])]
        tgt = int(C.morton(ix + dx, iy + dy)[0])
        if tgt in occ:
            expected_total += 1
    assert out["inflow"].sum() == expected_total
    assert (out["inflow"] == 0).any()


def test_hillshade_range_and_flat_surface(ray_session, synth_small):
    """Hillshade is in [0, 255]; a flat surface (slope 0) shades to
    255·cos(zenith) regardless of aspect."""
    import math

    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import spans, terrain
    from kaza_lcms_ray.stages.sar import RAD

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    out = terrain.hillshade_cells(geo).to_pandas()
    hs = out["hillshade"].to_numpy()
    assert len(out) > 0
    assert (hs >= 0.0).all() and (hs <= 255.0).all()
    # spot-check the formula on one row
    r = out.iloc[0]
    zen = 45.0 * RAD
    want = 255.0 * max(
        0.0,
        math.cos(zen) * math.cos(r["slope_deg"] * RAD)
        + math.sin(zen)
        * math.sin(r["slope_deg"] * RAD)
        * math.cos(315.0 * RAD - r["aspect_deg"] * RAD),
    )
    assert abs(r["hillshade"] - want) < 1e-9


def test_jsonl_round_trip_preserves_unicode(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.sources import sinks

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["plain", "newline\nand\ttab", "ünïcødé — em–dash ✓"],
            "n": [10, 20, 30],
        }
    )
    out = str(tmp_path / "jl")
    sinks.export_jsonl(rd.from_pandas(df), out, selectors=["doc_id", "text"])
    back = (
        sinks.read_jsonl(out, columns=["doc_id", "text"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert back["text"].tolist() == df["text"].tolist()
    assert list(back.columns) == ["doc_id", "text"]  # selector projected n away


def test_flow_accumulation_bruteforce(ray_session, synth_small):
    """acc equals the brute-force path-walk count: for every cell u,
    walk u's winner chain (occupied targets only) and +1 each visited
    ancestor; Σ acc = Σ path lengths; ridges have acc = 0."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import spans, terrain
    from kaza_lcms_ray.state import cells as C

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    out = terrain.flow_accumulation(geo).to_pandas()
    assert len(out) > 0
    dxdy = {c: (dx, dy) for dx, dy, c in terrain.D8_OFFSETS}
    fd = dict(zip(out["cell_id"].tolist(), out["flow_dir"].tolist()))
    expected = {c: 0 for c in fd}
    for u, d in fd.items():
        cur = u
        while True:
            d = fd[cur]
            if d == 0:
                break
            ix, iy = C.decode(np.array([cur]), C.CELL_LEVEL)
            dx, dy = dxdy[int(d)]
            tgt = int(C.morton(ix + dx, iy + dy)[0])
            if tgt not in fd:
                break
            expected[tgt] += 1
            cur = tgt
    got = dict(zip(out["cell_id"].tolist(), out["acc"].tolist()))
    assert got == expected
    assert (out["acc"] == 0).any()


def test_watershed_labels_bruteforce(ray_session, synth_small):
    """Every cell's basin equals its brute-force walk terminal; roots
    label themselves."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import spans, terrain
    from kaza_lcms_ray.state import cells as C

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    out = terrain.watershed_labels(geo).to_pandas()
    assert len(out) > 0
    dxdy = {c: (dx, dy) for dx, dy, c in terrain.D8_OFFSETS}
    fd = dict(zip(out["cell_id"].tolist(), out["flow_dir"].tolist()))

    def walk(u):
        while True:
            d = fd[u]
            if d == 0:
                return u
            ix, iy = C.decode(np.array([u]), C.CELL_LEVEL)
            dx, dy = dxdy[int(d)]
            t = int(C.morton(ix + dx, iy + dy)[0])
            if t not in fd:
                return u
            u = t

    got = dict(zip(out["cell_id"].tolist(), out["basin"].tolist()))
    for u in fd:
        assert got[u] == walk(u)
    roots = set(got.values())
    for r in roots:
        assert got[r] == r


def test_viewshed_bruteforce(ray_session, synth_small):
    """Observer + ring-1 visible; both classes occur; 50 sampled cells
    match a per-cell Python walk of the identical parametric samples."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import spans, terrain
    from kaza_lcms_ray.state import cells as C
    from kaza_lcms_ray.state import dem

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    out = terrain.viewshed_cells(geo).to_pandas()
    assert len(out) > 0
    assert set(out["visible"].unique()) == {0, 1}
    assert (out.loc[out["n_steps"] <= 1, "visible"] == 1).all()

    nf = float(1 << C.CELL_LEVEL)
    # observer = max elev, ties -> smallest cell id
    obs_row = out.sort_values(["elev", "cell_id"], ascending=[False, True]).iloc[0]
    ox, oy = C.decode(np.array([obs_row["cell_id"]], np.int64), C.CELL_LEVEL)
    ox, oy = int(ox[0]), int(oy[0])
    eo = float(obs_row["elev"]) + 10.0

    def e_at(x, y):
        lon = (x + 0.5) / nf * 360.0 - 180.0
        lat = (y + 0.5) / nf * 180.0 - 90.0
        return float(dem.elev(np.float64(lon), np.float64(lat)))

    for _, r in out.sample(50, random_state=7).iterrows():
        ix, iy = C.decode(np.array([r["cell_id"]], np.int64), C.CELL_LEVEL)
        dx, dy = int(ix[0]) - ox, int(iy[0]) - oy
        n = max(abs(dx), abs(dy))
        assert r["n_steps"] == n
        if n <= 1:
            assert r["visible"] == 1
            continue
        mx = -np.inf
        for t in range(1, n):
            xs = ox + (dx * t) / float(n)
            ys = oy + (dy * t) / float(n)
            mx = max(mx, (e_at(xs, ys) - eo) / float(t))
        want = 1 if (e_at(int(ix[0]), int(iy[0])) - eo) / float(n) > mx else 0
        assert r["visible"] == want, r["cell_id"]


def test_terrain_indexes_bruteforce(ray_session, synth_small):
    """TRI/TPI match a per-cell Python replay of the same 8-neighbor
    left-fold; TRI nonnegative; TPI sign varies over the AOI."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import spans, terrain
    from kaza_lcms_ray.state import cells as C
    from kaza_lcms_ray.state import dem

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    out = terrain.terrain_indexes(geo).to_pandas()
    assert len(out) > 0
    assert (out["tri"] >= 0).all()
    assert (out["tpi"] > 0).any() and (out["tpi"] < 0).any()
    nf = float(1 << C.CELL_LEVEL)

    def e_at(x, y):
        lon = (x + 0.5) / nf * 360.0 - 180.0
        lat = (y + 0.5) / nf * 180.0 - 90.0
        return float(dem.elev(np.float64(lon), np.float64(lat)))

    for _, r in out.sample(40, random_state=5).iterrows():
        ix, iy = C.decode(np.array([r["cell_id"]], np.int64), C.CELL_LEVEL)
        x, y = int(ix[0]), int(iy[0])
        e0 = e_at(x, y)
        tri = 0.0
        es = 0.0
        for dx, dy, _ in terrain.D8_OFFSETS:
            ek = e_at(x + dx, y + dy)
            tri = tri + abs(ek - e0)
            es = es + ek
        assert r["tri"] == tri / 8.0
        assert r["tpi"] == e0 - es / 8.0


def test_curvature_analytic_replay(synth_small, ray_session):
    """curvature_cells vs a direct numpy replay of the 9-point stencil
    for every occupied cell."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import spans, terrain, zonal
    from kaza_lcms_ray.state import cells, dem
    from kaza_lcms_ray.state.cells import CELL_LEVEL

    geo = spans.geo_obs(rd.read_parquet(f"{synth_small}/documents"))
    got = terrain.curvature_cells(
        spans.geo_obs(rd.read_parquet(f"{synth_small}/documents"))
    ).to_pandas().set_index("cell_id")
    occ = (
        zonal.zonal_sums(geo, keys=("cell_id",), bands=())
        .to_pandas()["cell_id"]
        .to_numpy(np.int64)
    )
    n = float(np.int64(1) << CELL_LEVEL)
    L = terrain.SLOPE_SCALE
    ix, iy = cells.decode(occ, CELL_LEVEL)
    ixf, iyf = ix.astype(np.float64), iy.astype(np.float64)

    def z(dx, dy):
        lon = (ixf + dx + 0.5) / n * 360.0 - 180.0
        lat = (iyf + dy + 0.5) / n * 180.0 - 90.0
        return dem.elev(lon, lat)

    z0 = z(0.0, 0.0)
    D = ((z(-1.0, 0.0) + z(1.0, 0.0)) / 2.0 - z0) / (L * L)
    E = ((z(0.0, 1.0) + z(0.0, -1.0)) / 2.0 - z0) / (L * L)
    G = (-z(-1.0, 0.0) + z(1.0, 0.0)) / (2.0 * L)
    H = (z(0.0, 1.0) - z(0.0, -1.0)) / (2.0 * L)
    tot = -2.0 * (D + E)
    sub = got.loc[occ]
    assert (sub["curv_total"].to_numpy() == tot).all()
    # spot a nonzero profile curvature exists (the surface is curved)
    assert (sub["curv_profile"].to_numpy() != 0.0).any()
    den = G * G + H * H
    assert ((den != 0.0) | (sub["curv_profile"].to_numpy() == 0.0)).all()
