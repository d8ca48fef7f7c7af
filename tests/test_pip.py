"""PIP join vs brute-force numpy oracle + rectangle-country SQL semantics."""

import duckdb
import numpy as np
import pyarrow.parquet as pq

from kaza_lcms_ray import synth
from kaza_lcms_ray.stages import pip, spans
from kaza_lcms_ray.state import geom


def _geo_points(synth_dir):
    tbl = pq.read_table(f"{synth_dir}/documents/part-00000.parquet")
    return spans.parse_geo_batch(tbl)


def _brute_force_pairs(px, py, ids, rings):
    out = []
    for pi, poly in enumerate(rings):
        inside = geom.points_in_polygon(px, py, poly)
        for j in np.nonzero(inside)[0]:
            out.append((int(j), ids[pi]))
    return sorted(out)


def test_join_points_matches_brute_force(synth_small):
    g = _geo_points(synth_small)
    px = g.column("lon").to_numpy()[:3000]
    py = g.column("lat").to_numpy()[:3000]
    ids, kinds, lc, rings = synth.make_polygons()
    index = geom.PolygonIndex(ids, kinds, lc, rings)
    pt, pl = index.join_points(px, py)
    got = sorted(zip(pt.tolist(), [ids[i] for i in pl]))
    assert got == _brute_force_pairs(px, py, ids, rings)
    assert len(got) > 3000  # AOI covers most points → join is non-trivial


def test_country_rectangles_match_sql_half_open(synth_small):
    """Rectangle countries tile the domain; ray-casting must agree with the
    half-open SQL predicate on every point, including shared borders."""
    g = _geo_points(synth_small)
    px = g.column("lon").to_numpy()
    py = g.column("lat").to_numpy()
    # inject exact border points
    px = np.concatenate([px, [23.5, 23.5, 22.0]])
    py = np.concatenate([py, [-16.5, -18.0, -16.5]])
    ids, kinds, lc, rings = synth.make_polygons()
    keep = kinds == "country"
    index = geom.PolygonIndex(ids[keep], kinds[keep], lc[keep], [r for r, k in zip(rings, keep) if k])
    pt, pl = index.join_points(px, py)
    assert len(pt) == len(px)  # exactly one country each (tiling + half-open)
    got = {int(a): index.poly_ids[b] for a, b in zip(pt, pl)}
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"i": np.arange(len(px)), "lon": px, "lat": py}))
    con.register("cty", pq.read_table(f"{synth_small}/polygons.parquet").to_pandas()[lambda d: d.kind == "country"][["poly_id", "bbox"]].assign(
        minx=lambda d: d.bbox.map(lambda b: b["minx"]),
        miny=lambda d: d.bbox.map(lambda b: b["miny"]),
        maxx=lambda d: d.bbox.map(lambda b: b["maxx"]),
        maxy=lambda d: d.bbox.map(lambda b: b["maxy"]),
    ).drop(columns="bbox"))
    sql = con.sql(
        "SELECT i, poly_id FROM pts JOIN cty ON lon >= minx AND lon < maxx AND lat >= miny AND lat < maxy"
    ).fetchall()
    assert {i: p for i, p in sql} == got


def test_pip_join_modes(synth_small, ray_session):
    import ray.data as rd

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    total = geo.count()
    inner = pip.pip_join(geo, f"{synth_small}/polygons.parquet", kinds=["protected_area"], mode="inner", concurrency=2)
    semi = pip.pip_join(geo, f"{synth_small}/polygons.parquet", kinds=["protected_area"], mode="semi", concurrency=2)
    anti = pip.pip_join(geo, f"{synth_small}/polygons.parquet", kinds=["protected_area"], mode="anti", concurrency=2)
    n_semi, n_anti = semi.count(), anti.count()
    assert n_semi + n_anti == total
    assert inner.count() >= n_semi > 0


def test_pip_label_deterministic(synth_small, ray_session):
    import ray.data as rd

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    lab = pip.pip_join(geo, f"{synth_small}/polygons.parquet", kinds=["reference"], mode="label", concurrency=2)
    df = lab.to_pandas().sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    df2 = lab.to_pandas().sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    assert (df["poly_id"].to_numpy() == df2["poly_id"].to_numpy()).all()
    assert (df["LANDCOVER"].to_numpy() == df2["LANDCOVER"].to_numpy()).all()
    assert (df.loc[df.poly_id != "", "LANDCOVER"] > 0).all()


def test_bbox_join_matches_brute_force(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages.pip import bbox_join

    rng = np.random.RandomState(7)

    def mk(n, prefix):
        x0 = rng.uniform(-30, 30, n)
        y0 = rng.uniform(-20, 20, n)
        w = rng.uniform(0.1, 8, n)
        h = rng.uniform(0.1, 8, n)
        tbl = pa.table(
            {
                "poly_id": pa.array([f"{prefix}{i}" for i in range(n)]),
                "bbox": pa.StructArray.from_arrays(
                    [pa.array(x0), pa.array(y0), pa.array(x0 + w), pa.array(y0 + h)],
                    names=["minx", "miny", "maxx", "maxy"],
                ),
            }
        )
        return tbl, x0, y0, x0 + w, y0 + h

    (A, ax0, ay0, ax1, ay1) = mk(60, "a")
    (B, bx0, by0, bx1, by1) = mk(90, "b")
    expected = {
        (f"a{i}", f"b{j}")
        for i in range(60)
        for j in range(90)
        if ax0[i] <= bx1[j] and bx0[j] <= ax1[i] and ay0[i] <= by1[j] and by0[j] <= ay1[i]
    }
    for parts_a, parts_b, cell in [(1, 1, 3.0), (4, 3, 3.0), (2, 5, 7.5)]:
        out = bbox_join(
            rd.from_arrow(A).repartition(parts_a),
            rd.from_arrow(B).repartition(parts_b),
            cell_deg=cell,
        ).to_pandas()
        got = list(zip(out["a_id"], out["b_id"]))
        # exactly-once under any partitioning and any cell size
        assert len(got) == len(set(got))
        assert set(got) == expected
        assert (out["overlap_w"] >= 0).all() and (out["overlap_h"] >= 0).all()


def test_bbox_join_empty_side(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages.pip import bbox_join

    A = pa.table(
        {
            "poly_id": pa.array(["a0"]),
            "bbox": pa.StructArray.from_arrays(
                [pa.array([0.0]), pa.array([0.0]), pa.array([1.0]), pa.array([1.0])],
                names=["minx", "miny", "maxx", "maxy"],
            ),
        }
    )
    B = A.slice(0, 0)
    out = bbox_join(rd.from_arrow(A), rd.from_arrow(B)).to_pandas()
    assert len(out) == 0


def test_nearest_poly_bbox_bruteforce(synth_small, ray_session):
    import ray.data as rd

    from kaza_lcms_ray.stages import pip, spans

    docs = rd.read_parquet(f"{synth_small}/documents").limit(400)
    geo = spans.geo_obs(docs)
    got = (
        pip.nearest_poly_bbox(
            geo, f"{synth_small}/polygons.parquet", kinds=["protected_area"]
        )
        .to_pandas()
        .sort_values(["doc_id", "span_idx"])
        .reset_index(drop=True)
    )
    import pyarrow.parquet as pq

    polys = pq.read_table(f"{synth_small}/polygons.parquet").to_pandas()
    polys = polys[polys["kind"] == "protected_area"].sort_values("poly_id")
    gdf = geo.to_pandas().sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    assert len(got) == len(gdf)
    bb = np.array([[b["minx"], b["miny"], b["maxx"], b["maxy"]] for b in polys["bbox"]])
    ids = polys["poly_id"].to_numpy()
    x = gdf["lon"].to_numpy()[:, None]
    y = gdf["lat"].to_numpy()[:, None]
    dx = np.maximum(np.maximum(bb[:, 0] - x, 0.0), x - bb[:, 2])
    dy = np.maximum(np.maximum(bb[:, 1] - y, 0.0), y - bb[:, 3])
    d = np.sqrt(dx * dx + dy * dy)
    j = np.argmin(d, axis=1)
    assert (got["poly_id"].to_numpy() == ids[j]).all()
    assert got["dist_deg"].to_numpy().tobytes() == d[np.arange(len(gdf)), j].tobytes()


def test_poly_centroid_square(ray_session, synth_small):
    """Centroid of a known square + orientation invariance of the formula."""
    import numpy as np
    import pyarrow as pa

    from kaza_lcms_ray.stages.allocation import polygon_centroid_batch

    sq = [{"x": 0.0, "y": 0.0}, {"x": 2.0, "y": 0.0}, {"x": 2.0, "y": 2.0},
          {"x": 0.0, "y": 2.0}, {"x": 0.0, "y": 0.0}]
    sq_rev = list(reversed(sq))
    t = pa.table(
        {
            "poly_id": pa.array(["a", "b"]),
            "LANDCOVER": pa.array([1, 1], pa.int32()),
            "rings": pa.array([[sq], [sq_rev]]),
        }
    )
    out = polygon_centroid_batch(t)
    assert out.column("cx").to_pylist() == [1.0, 1.0]
    assert out.column("cy").to_pylist() == [1.0, 1.0]


def test_cell_coverage_half_cell(ray_session, tmp_path):
    """A polygon covering exactly the left half of one cell must contain
    8 of the 16 sub-points (frac 0.5); a full-cover polygon all 16."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.state import cells as cellmod

    lvl = cellmod.CELL_LEVEL
    n = float(1 << lvl)
    # pick the cell containing (20.0, -18.0) (inside the KAZA-ish AOI)
    cid = int(cellmod.encode(np.array([20.0]), np.array([-18.0]), lvl)[0])
    ix, iy = cellmod.decode(np.array([cid], np.uint64), lvl)
    x0 = ix[0] / n * 360.0 - 180.0
    x1 = (ix[0] + 1) / n * 360.0 - 180.0
    y0 = iy[0] / n * 180.0 - 90.0
    y1 = (iy[0] + 1) / n * 180.0 - 90.0
    xm = x0 + (x1 - x0) / 2.0

    def rect(pid, a, b, c, d):
        ring = [
            {"x": a, "y": c}, {"x": b, "y": c}, {"x": b, "y": d},
            {"x": a, "y": d}, {"x": a, "y": c},
        ]
        return {
            "poly_id": pid, "kind": "reference", "LANDCOVER": 1,
            "rings": [ring],
            "bbox": {"minx": a, "miny": c, "maxx": b, "maxy": d},
        }

    polys = pa.Table.from_pylist([
        rect("half", x0 - 1e-9, xm, y0 - 1e-9, y1 + 1e-9),
        rect("full", x0 - 1e-9, x1 + 1e-9, y0 - 1e-9, y1 + 1e-9),
    ])
    ppath = str(tmp_path / "polys.parquet")
    pq.write_table(polys, ppath)

    geo = rd.from_arrow(pa.table({"cell_id": pa.array([cid] * 3, pa.int64())}))
    out = (
        pip.cell_coverage(geo, ppath, kinds=["reference"])
        .to_pandas()
        .set_index("poly_id")
    )
    assert out.loc["half", "covered"] == 8
    assert out.loc["half", "frac"] == 0.5
    assert out.loc["full", "covered"] == 16
    assert out.loc["full", "frac"] == 1.0


def test_poly_overlay_symmetry_and_coverage_bound(ray_session, synth_small):
    """overlay(A,B) equals overlay(B,A) with the columns swapped, and a
    pair's sub-point count never exceeds either polygon's own
    cell_coverage total."""
    import ray.data as rd

    from kaza_lcms_ray.stages import pip, spans

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    path = f"{synth_small}/polygons.parquet"
    ab = (
        pip.poly_overlay(geo, path, kind_a="reference", kind_b="country")
        .to_pandas()
        .sort_values(["poly_a", "poly_b"])
        .reset_index(drop=True)
    )
    ba = (
        pip.poly_overlay(geo, path, kind_a="country", kind_b="reference")
        .to_pandas()
        .rename(columns={"poly_a": "poly_b", "poly_b": "poly_a"})
        .sort_values(["poly_a", "poly_b"])
        .reset_index(drop=True)[ab.columns.tolist()]
    )
    assert len(ab) > 0
    assert ab.equals(ba)

    cov = (
        pip.cell_coverage(geo, path, kinds=["reference"])
        .to_pandas()
        .groupby("poly_id")["covered"]
        .sum()
    )
    for _, r in ab.iterrows():
        assert r["n_sub"] <= cov[r["poly_a"]]


def test_poly_majority_against_components(synth_small, ray_session):
    """poly_majority vs an independent pandas replay from the label-mode
    PIP attach: same first-polygon rule, majority with smallest-class
    ties, exact share."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage, pip
    from kaza_lcms_ray.state import cells
    from kaza_lcms_ray.state.cells import TILE_LEVEL

    prims = rd.read_parquet(f"{synth_small}/primitives.parquet")
    out = (
        pip.poly_majority(prims, f"{synth_small}/polygons.parquet", year=2022)
        .to_pandas()
        .set_index("poly_id")
    )
    labels = (
        assemblage.assemble_tile_labels(prims)
        .filter(expr="year == 2022")
        .select_columns(["tile_id", "LANDCOVER"])
        .to_pandas()
    )
    tid = labels["tile_id"].to_numpy(np.int64)
    lon, lat = cells.cell_center(tid, TILE_LEVEL)
    idx = pip.load_polygon_index(f"{synth_small}/polygons.parquet", ["reference"])
    pt, pl = idx.join_points(lon, lat)
    first = {}
    for t_i, p_i in zip(pt.tolist(), pl.tolist()):
        if t_i not in first or idx.poly_ids[p_i] < idx.poly_ids[first[t_i]]:
            first[t_i] = p_i
    from collections import Counter, defaultdict

    per_poly = defaultdict(Counter)
    for t_i, p_i in first.items():
        per_poly[idx.poly_ids[p_i]][int(labels["LANDCOVER"].iloc[t_i])] += 1
    assert len(out) == len(per_poly) > 0
    for pid, c in per_poly.items():
        best = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        assert out.loc[pid, "majority_class"] == best[0]
        assert out.loc[pid, "n_votes"] == best[1]
        assert out.loc[pid, "n_tiles"] == sum(c.values())
        assert out.loc[pid, "share"] == best[1] / sum(c.values())


def test_edge_distance_square_polygon(ray_session, tmp_path):
    """Hand polygon: unit square (0,0)-(4,0)-(4,4)-(0,4); a point at
    (1, 2) snaps to the left edge at (0, 2) with dist 1; a point at
    (2, 3.5) snaps to the top edge at (2, 4) with dist 0.5; an outside
    point emits nothing."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import pip

    ring = [
        {"x": 0.0, "y": 0.0}, {"x": 4.0, "y": 0.0}, {"x": 4.0, "y": 4.0},
        {"x": 0.0, "y": 4.0}, {"x": 0.0, "y": 0.0},
    ]
    polys = pa.table(
        {
            "poly_id": pa.array(["sq"], pa.string()),
            "kind": pa.array(["reference"], pa.string()),
            "LANDCOVER": pa.array([1], pa.int32()),
            "bbox": pa.array(
                [{"minx": 0.0, "miny": 0.0, "maxx": 4.0, "maxy": 4.0}]
            ),
            "rings": pa.array([[ring]]),
        }
    )
    import pyarrow.parquet as pq

    ppath = str(tmp_path / "polys.parquet")
    pq.write_table(polys, ppath)
    pts = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": ["d1", "d2", "d3"],
                "span_idx": np.array([0, 0, 0], np.int64),
                "lon": [1.0, 2.0, 9.0],
                "lat": [2.0, 3.5, 9.0],
            }
        )
    )
    out = (
        pip.edge_distance(pts, ppath, kinds=["reference"])
        .to_pandas()
        .set_index("doc_id")
    )
    assert len(out) == 2
    assert out.loc["d1", "dist"] == 1.0
    assert (out.loc["d1", "snap_lon"], out.loc["d1", "snap_lat"]) == (0.0, 2.0)
    assert out.loc["d2", "dist"] == 0.5
    assert (out.loc["d2", "snap_lon"], out.loc["d2", "snap_lat"]) == (2.0, 4.0)
