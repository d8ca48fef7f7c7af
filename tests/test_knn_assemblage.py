"""kNN join + argmax assemblage vs oracles."""

import duckdb
import numpy as np
import pyarrow.parquet as pq

import ray.data as rd

from kaza_lcms_ray.stages import assemblage, knn, spans


def test_knn_matches_brute_force_with_tiebreak(synth_small, ray_session):
    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    got = (
        knn.knn_join(geo, f"{synth_small}/training_plots.parquet", concurrency=2)
        .select_columns(["doc_id", "span_idx", "plot_id", "dist"])
        .to_pandas()
        .sort_values(["doc_id", "span_idx"])
        .reset_index(drop=True)
    )
    plots = pq.read_table(f"{synth_small}/training_plots.parquet").to_pandas()
    g = spans.parse_geo_batch(
        pq.read_table(f"{synth_small}/documents/part-00000.parquet")
    ).to_pandas()
    # oracle: full cross join in numpy with (d2, plot_id) lexicographic min
    plots_sorted = plots.sort_values("plot_id").reset_index(drop=True)
    px = g["lon"].to_numpy()[:2000]
    py = g["lat"].to_numpy()[:2000]
    dx = px[:, None] - plots_sorted["lon"].to_numpy()[None, :]
    dy = py[:, None] - plots_sorted["lat"].to_numpy()[None, :]
    d2 = dx * dx + dy * dy
    bi = np.argmin(d2, axis=1)
    sub = got.merge(
        g[["doc_id", "span_idx"]].iloc[:2000], on=["doc_id", "span_idx"], how="inner"
    )
    lookup = {(r.doc_id, r.span_idx): r.plot_id for r in got.itertuples()}
    for j in range(2000):
        key = (g["doc_id"].iloc[j], g["span_idx"].iloc[j])
        assert lookup[key] == plots_sorted["plot_id"].iloc[bi[j]]
    assert len(sub) == 2000


def test_knn_coincident_plots_tiebreak():
    """Two plots at the identical location: winner is the lower plot_id."""
    ids = np.array(["plot-b", "plot-a"], dtype=object)
    idx = knn.PlotIndex(ids, np.array([1.0, 1.0]), np.array([2.0, 2.0]))
    bi, dist = idx.nearest(np.array([1.0]), np.array([2.0]))
    assert idx.plot_ids[bi[0]] == "plot-a" and dist[0] == 0.0


def test_assemblage_matches_sql_argmax(synth_small, ray_session):
    prims = rd.read_parquet(f"{synth_small}/primitives.parquet")
    got = (
        assemblage.assemble_tile_labels(prims)
        .to_pandas()
        .sort_values(["tile_id", "year"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    exp = con.sql(
        f"""
        SELECT tile_id, "year", class AS LANDCOVER, prob FROM (
            SELECT *, row_number() OVER (
                PARTITION BY tile_id, "year" ORDER BY prob DESC, class ASC
            ) AS rn
            FROM read_parquet('{synth_small}/primitives.parquet')
        ) WHERE rn = 1 ORDER BY tile_id, "year"
        """
    ).df()
    assert len(got) == len(exp) > 0
    assert (got["tile_id"].to_numpy().astype(np.int64) == exp["tile_id"].to_numpy().astype(np.int64)).all()
    assert (got["LANDCOVER"].to_numpy() == exp["LANDCOVER"].to_numpy()).all()
    assert (got["prob"].to_numpy() == exp["prob"].to_numpy().astype(np.float32)).all()


def test_assemblage_tie_resolves_to_lowest_class(synth_small):
    """Synth injects equal-max ties on ~1% of tiles; verify the rule."""
    import pandas as pd

    prims = pq.read_table(f"{synth_small}/primitives.parquet").to_pandas()
    g = prims.groupby(["tile_id", "year"])
    ties = 0
    for (tid, yr), grp in g:
        mx = grp["prob"].max()
        winners = grp.loc[grp["prob"] == mx, "class"]
        if len(winners) > 1:
            ties += 1
    assert ties > 0  # fixture guarantees tie cases exist


def test_grid_index_equals_brute_force(synth_small):
    import pyarrow.parquet as pq

    from kaza_lcms_ray.stages.knn import PlotGridIndex, PlotIndex

    brute = PlotIndex.from_parquet(f"{synth_small}/training_plots.parquet")
    grid = PlotGridIndex.from_parquet(f"{synth_small}/training_plots.parquet")
    g = spans.parse_geo_batch(
        pq.read_table(f"{synth_small}/documents/part-00000.parquet")
    )
    px = g.column("lon").to_numpy()
    py = g.column("lat").to_numpy()
    bi, bd = brute.nearest(px, py)
    gi, gd = grid.nearest(px, py)
    assert (brute.plot_ids[bi] == grid.plot_ids[gi]).all()
    assert (bd == gd).all()  # bit-identical distances


def test_majority_smooth_mode_and_tiebreak(ray_session):
    """Hand grid: center tile outvoted by neighbors; tie -> smallest class."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.state.cells import morton

    # 3 tiles in a row: labels 5, 9, 5 -> middle smooths to 5 (2 votes vs 1)
    xs = np.array([100, 101, 102])
    ys = np.array([200, 200, 200])
    tids = morton(xs, ys)
    prims = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": np.asarray(tids, np.int64),
                    "year": [2022] * 3,
                    "class": np.array([5, 9, 5], np.int32),
                    "prob": np.array([0.9, 0.9, 0.9], np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    out = (
        assemblage.majority_smooth(prims, year=2022)
        .to_pandas()
        .set_index("tile_id")
    )
    mid = int(tids[1])
    assert out.loc[mid, "smooth_label"] == 5
    assert out.loc[mid, "n_votes"] == 2
    # edge tiles: 1 vote of 5 + 1 of 9 -> tie, smallest class (5) wins
    assert out.loc[int(tids[0]), "smooth_label"] == 5


def test_clump_sizes_hand_grid(ray_session):
    """Hand grid: an L-shaped 3-tile component, an isolated tile of the
    same label two steps away, a different-label tile adjacent to the L
    (label breaks the edge), and a same-label neighbor pair straddling a
    16x16 block boundary (the cap: must NOT merge)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.state.cells import morton

    # block boundary at x = 16k: (15, 0) and (16, 0) are grid-adjacent but
    # in different 16x16 blocks
    xs = np.array([1, 2, 2, 4, 2, 15, 16])
    ys = np.array([1, 1, 2, 1, 3, 0, 0])
    lc = np.array([5, 5, 5, 5, 9, 7, 7])
    tids = np.asarray(morton(xs, ys), np.int64)
    prims = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": tids,
                    "year": [2022] * len(tids),
                    "class": lc.astype(np.int32),
                    "prob": np.full(len(tids), 0.9, np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    out = (
        assemblage.clump_sizes(prims, year=2022, block_levels=4, mmu=3)
        .to_pandas()
        .set_index("tile_id")
    )
    l_comp = min(int(tids[i]) for i in (0, 1, 2))
    for i in (0, 1, 2):
        assert out.loc[int(tids[i]), "comp_id"] == l_comp
        assert out.loc[int(tids[i]), "comp_size"] == 3
        assert out.loc[int(tids[i]), "sieve"] == 0
    # isolated same-label tile: own singleton, sieved at mmu=3
    assert out.loc[int(tids[3]), "comp_size"] == 1
    assert out.loc[int(tids[3]), "sieve"] == 1
    # different label adjacent to the L: singleton
    assert out.loc[int(tids[4]), "comp_size"] == 1
    # block-boundary pair: grid-adjacent, same label, DIFFERENT blocks
    assert out.loc[int(tids[5]), "comp_size"] == 1
    assert out.loc[int(tids[6]), "comp_size"] == 1
    assert out.loc[int(tids[5]), "comp_id"] != out.loc[int(tids[6]), "comp_id"]


def test_landscape_diversity_uniform_is_zero(ray_session):
    """A uniform single-class raster has H = 0 everywhere; a mixed
    neighborhood has H > 0."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.state.cells import morton

    xs = np.array([300, 301, 302, 303])
    ys = np.array([400, 400, 400, 400])
    tids = np.asarray(morton(xs, ys), np.int64)
    prims = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": tids,
                    "year": [2022] * 4,
                    "class": np.array([1, 1, 1, 9], np.int32),
                    "prob": np.array([0.9] * 4, np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    out = (
        assemblage.landscape_diversity(prims, year=2022)
        .to_pandas()
        .set_index("tile_id")
    )
    # tile 0 sees only class-1 neighbors (itself + tile 1): H = 0
    assert out.loc[int(tids[0]), "shannon"] == 0.0
    assert out.loc[int(tids[0]), "n_labels"] == 1
    # tile 2 sees classes {1, 1, 9}: H > 0, two labels
    assert out.loc[int(tids[2]), "n_labels"] == 2
    assert out.loc[int(tids[2]), "shannon"] > 0.5


def test_label_pyramid_bruteforce(ray_session, synth_small):
    """Each parent's label is the modal child class (ties -> smallest);
    vote totals equal the child count; partition-invariant."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.state import cells as C

    prims = rd.read_parquet(f"{synth_small}/primitives.parquet")
    out = (
        assemblage.label_pyramid(prims, year=2022)
        .to_pandas()
        .sort_values(["level_up", "tile_id"])
        .reset_index(drop=True)
    )
    out2 = (
        assemblage.label_pyramid(prims.repartition(5), year=2022)
        .to_pandas()
        .sort_values(["level_up", "tile_id"])
        .reset_index(drop=True)
    )
    assert out.equals(out2)
    labels = (
        assemblage.assemble_tile_labels(prims)
        .filter(expr="year == 2022")
        .to_pandas()
    )
    ix, iy = C.decode(labels["tile_id"].to_numpy(np.int64), C.TILE_LEVEL)
    for k in (1, 2):
        par = C.morton(ix >> k, iy >> k).astype(np.int64)
        df = labels.assign(parent=par)
        want = {}
        for p, grp in df.groupby("parent"):
            vc = grp["LANDCOVER"].value_counts()
            best_n = vc.max()
            best = min(c for c, n in vc.items() if n == best_n)
            want[p] = (best, best_n)
        got = out[out["level_up"] == k]
        assert len(got) == len(want)
        for _, r in got.sample(min(50, len(got)), random_state=2).iterrows():
            b, n = want[r["tile_id"]]
            assert (r["LANDCOVER"], r["n_votes"]) == (b, n)


def test_class_shape_hand_grid(ray_session):
    """Hand grid: a 2x2 square of class 5 (area 4, perimeter 8), an
    isolated class-9 tile (area 1, perimeter 4), and a class-7 domino
    pair (area 2, perimeter 6); a corner tile at (0, 0) checks that the
    grid boundary counts as edge without wrapping."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.state.cells import morton

    xs = np.array([1, 2, 1, 2, 5, 0, 0])
    ys = np.array([1, 1, 2, 2, 5, 0, 1])
    lc = np.array([5, 5, 5, 5, 9, 7, 7])
    tids = np.asarray(morton(xs, ys), np.int64)
    prims = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": tids,
                    "year": [2022] * len(tids),
                    "class": lc.astype(np.int32),
                    "prob": np.full(len(tids), 0.9, np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    out = assemblage.class_shape(prims, year=2022).to_pandas().set_index("LANDCOVER")
    assert out.loc[5, "area"] == 4 and out.loc[5, "perimeter"] == 8
    assert out.loc[9, "area"] == 1 and out.loc[9, "perimeter"] == 4
    # domino at the corner: 2*4 - 2 directed same-adjacencies = 6 (the
    # out-of-grid sides at x=-1 / y=-1 are edges, not wraps)
    assert out.loc[7, "area"] == 2 and out.loc[7, "perimeter"] == 6
    assert abs(out.loc[5, "share"] - 4 / 7) < 1e-15
    assert abs(out.loc[5, "lsi"] - 8 * 0.25 / np.sqrt(4.0)) < 1e-15
    # reshard invariance: the bucketed combine must not depend on blocks
    out2 = (
        assemblage.class_shape(
            prims.repartition(5), year=2022
        )
        .to_pandas()
        .set_index("LANDCOVER")
    )
    assert out.sort_index().equals(out2.sort_index())


def test_core_area_brute_force(ray_session):
    """core_area vs an independent O(n·4) numpy replay: a contiguous
    square footprint plus a detached strip; zones come from the analytic
    DEM at tile centers, core = all four 4-neighbors in-bounds,
    on-footprint and same-zone."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.state import cells, dem
    from kaza_lcms_ray.state.cells import TILE_LEVEL, morton

    # a 20x20 block and a disjoint 1x30 strip (strip tiles can never be
    # core: the y-neighbors are off-footprint)
    gx, gy = np.meshgrid(np.arange(100, 120), np.arange(200, 220), indexing="ij")
    xs = np.concatenate([gx.ravel(), np.arange(500, 530)])
    ys = np.concatenate([gy.ravel(), np.full(30, 900)])
    tids = np.asarray(morton(xs, ys), np.int64)
    prims = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": tids,
                    "year": [2022] * len(tids),
                    "class": np.ones(len(tids), np.int32),
                    "prob": np.full(len(tids), 0.9, np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    out = assemblage.core_area(prims, year=2022).to_pandas()

    # brute force
    lon, lat = cells.cell_center(tids, TILE_LEVEL)
    zone = np.floor(dem.elev(lon, lat) / 100.0).astype(np.int64)
    zmap = dict(zip(tids.tolist(), zone.tolist()))
    hi = (1 << TILE_LEVEL) - 1
    exp_area: dict[int, int] = {}
    exp_core: dict[int, int] = {}
    for x, y, t, z in zip(xs, ys, tids.tolist(), zone.tolist()):
        exp_area[z] = exp_area.get(z, 0) + 1
        ok = True
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nx, ny = x + dx, y + dy
            if not (0 <= nx <= hi and 0 <= ny <= hi):
                ok = False
                break
            nt = int(morton(np.array([nx]), np.array([ny]))[0])
            if zmap.get(nt) != z:
                ok = False
                break
        exp_core[z] = exp_core.get(z, 0) + (1 if ok else 0)
    got = {int(r.zone): (int(r.area), int(r.core)) for r in out.itertuples()}
    assert got == {z: (exp_area[z], exp_core[z]) for z in exp_area}
    assert sum(c for _, c in got.values()) > 0  # the block has real cores
    for r in out.itertuples():
        assert r.cai == 100.0 * r.core / r.area
    # reshard invariance
    out2 = assemblage.core_area(prims.repartition(7), year=2022).to_pandas()
    assert out.equals(out2)


def test_iji_hand_grid(ray_session):
    """Hand grid: a 1x4 strip [5, 7, 5, 9] at y=0.  Directed cross-class
    edges: e_57 = 2 (5-7 and 7-5 boundaries at x=0/1 and x=1/2), e_59 = 1,
    e_79 = 0; m = 3 so ln(m-1) = ln 2."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.state.cells import morton

    xs = np.arange(4)
    ys = np.zeros(4, np.int64)
    lc = np.array([5, 7, 5, 9])
    tids = np.asarray(morton(xs, ys), np.int64)
    prims = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": tids,
                    "year": [2022] * 4,
                    "class": lc.astype(np.int32),
                    "prob": np.full(4, 0.9, np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    out = assemblage.iji(prims, year=2022).to_pandas().set_index("LANDCOVER")
    assert out.loc[5, "e_total"] == 3 and out.loc[5, "n_partners"] == 2
    assert out.loc[7, "e_total"] == 2 and out.loc[7, "n_partners"] == 1
    assert out.loc[9, "e_total"] == 1 and out.loc[9, "n_partners"] == 1
    # class 7 and 9: single partner -> r = 1, h_q = 0, IJI = 0
    assert out.loc[7, "iji"] == 0.0 and out.loc[9, "iji"] == 0.0
    # class 5: r = (2/3, 1/3); IJI = H/ln(2)*100 via the quantized terms
    Q = assemblage.IJI_SCALE
    hq = int(np.floor(-((2 / 3) * np.log(2 / 3)) * Q)) + int(
        np.floor(-((1 / 3) * np.log(1 / 3)) * Q)
    )
    assert out.loc[5, "h_q"] == hq
    assert out.loc[5, "iji"] == hq / Q / np.log(2.0) * 100.0
    # fewer than 3 classes present -> undefined -> empty
    import pyarrow.compute as pc

    two = prims.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("class"), 9)),
        batch_format="pyarrow",
    )
    assert assemblage.iji(two, year=2022).count() == 0
    # reshard invariance
    out2 = assemblage.iji(prims.repartition(3), year=2022).to_pandas()
    assert out.reset_index().equals(out2)


def test_patch_metrics_family_hand_grid(ray_session):
    """Patch table on the class_shape hand grid (one 16x16 block):
    class 5 = 2x2 square (a=4, p=8), class 9 = isolated (a=1, p=4),
    class 7 = corner domino (a=2, p=6); cohesion/pafrac recompute from
    the quantized-term definitions."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.state.cells import morton

    xs = np.array([1, 2, 1, 2, 5, 0, 0])
    ys = np.array([1, 1, 2, 2, 5, 0, 1])
    lc = np.array([5, 5, 5, 5, 9, 7, 7])
    tids = np.asarray(morton(xs, ys), np.int64)
    prims = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": tids,
                    "year": [2022] * len(tids),
                    "class": lc.astype(np.int32),
                    "prob": np.full(len(tids), 0.9, np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    pm = assemblage.patch_metrics(prims, year=2022).to_pandas()
    by_lc = pm.set_index("LANDCOVER")
    assert len(pm) == 3
    assert by_lc.loc[5, "a"] == 4 and by_lc.loc[5, "p"] == 8
    assert by_lc.loc[9, "a"] == 1 and by_lc.loc[9, "p"] == 4
    assert by_lc.loc[7, "a"] == 2 and by_lc.loc[7, "p"] == 6
    # comp_id = min tile_id of the component
    assert by_lc.loc[5, "comp_id"] == tids[:4].min()

    coh = assemblage.cohesion(prims, year=2022).to_pandas().set_index("LANDCOVER")
    S = assemblage.COHESION_SCALE
    A = 7.0
    for c, (a, p) in {5: (4, 8), 9: (1, 4), 7: (2, 6)}.items():
        q = int(np.floor((float(p) * np.sqrt(float(a))) * S))
        assert coh.loc[c, "p_sum"] == p and coh.loc[c, "paq_sum"] == q
        expect = (1.0 - p / (q / S)) / (1.0 - 1.0 / np.sqrt(A)) * 100.0
        assert coh.loc[c, "cohesion"] == expect
    # single-patch classes have zero ln-area variance -> dropped by pafrac
    assert assemblage.pafrac(prims, year=2022).count() == 0
    # two patches of different size -> defined: add a second class-5 tile
    xs2 = np.concatenate([xs, [9]])
    ys2 = np.concatenate([ys, [9]])
    lc2 = np.concatenate([lc, [5]])
    tids2 = np.asarray(morton(xs2, ys2), np.int64)
    prims2 = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": tids2,
                    "year": [2022] * len(tids2),
                    "class": lc2.astype(np.int32),
                    "prob": np.full(len(tids2), 0.9, np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    pf = assemblage.pafrac(prims2, year=2022).to_pandas()
    assert list(pf["LANDCOVER"]) == [5]
    Q = assemblage.PAFRAC_SCALE
    # patches (a=4, p=8) and (a=1, p=4): replay the quantized chain
    xa = [np.log(4.0), np.log(1.0)]
    ya = [np.log(8.0), np.log(4.0)]
    sxq = sum(int(np.floor(x * Q)) for x in xa)
    syq = sum(int(np.floor(y * Q)) for y in ya)
    sxxq = sum(int(np.floor((x * x) * Q)) for x in xa)
    sxyq = sum(int(np.floor((x * y) * Q)) for x, y in zip(xa, ya))
    nn, sx, sy, sxx, sxy = 2.0, sxq / Q, syq / Q, sxxq / Q, sxyq / Q
    expect = 2.0 / ((nn * sxy - sx * sy) / (nn * sxx - sx * sx))
    assert pf["pafrac"].iloc[0] == expect
    # reshard invariance of the patch table
    pm2 = assemblage.patch_metrics(prims.repartition(5), year=2022).to_pandas()
    key = ["comp_id", "LANDCOVER", "a", "p"]
    assert pm.sort_values(key).reset_index(drop=True).equals(
        pm2.sort_values(key).reset_index(drop=True)
    )


def test_contag_hand_grid(ray_session):
    """Strip [5, 7, 5, 9]: directed adjacencies g = {(5,7):2, (7,5):2,
    (5,9):1, (9,5):1}, no diagonal; replay the quantized-term chain."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage

    from kaza_lcms_ray.state.cells import morton

    xs = np.arange(4)
    ys = np.zeros(4, np.int64)
    lc = np.array([5, 7, 5, 9])
    tids = np.asarray(morton(xs, ys), np.int64)
    prims = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": tids,
                    "year": [2022] * 4,
                    "class": lc.astype(np.int32),
                    "prob": np.full(4, 0.9, np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    out = assemblage.contag(prims, year=2022).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert row["n_classes"] == 3 and row["area"] == 4 and row["g_total"] == 6
    Q = assemblage.IJI_SCALE
    terms = [
        (2 / 4) * (2 / 3),  # 5->7
        (2 / 4) * (1 / 3),  # 5->9
        (1 / 4) * (2 / 2),  # 7->5
        (1 / 4) * (1 / 1),  # 9->5
    ]
    s_q = sum(int(np.floor((r * np.log(r)) * Q)) for r in terms)
    assert row["s_q"] == s_q
    assert row["contag"] == (1.0 + (s_q / Q) / (2.0 * np.log(3.0))) * 100.0
    # single-class landscape -> undefined -> empty
    one = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": tids,
                    "year": [2022] * 4,
                    "class": np.full(4, 5, np.int32),
                    "prob": np.full(4, 0.9, np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    assert assemblage.contag(one, year=2022).count() == 0
    # reshard invariance
    out2 = assemblage.contag(prims.repartition(3), year=2022).to_pandas()
    assert out.equals(out2)


def test_mesh_hand_grid(ray_session):
    """Hand grid from the patch test: class 5 one patch a=4, classes
    7/9 patches a=2/a=1; A=7.  MESH = a2/A, DIVISION = 1 - a2/A^2."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.state.cells import morton

    xs = np.array([1, 2, 1, 2, 5, 0, 0])
    ys = np.array([1, 1, 2, 2, 5, 0, 1])
    lc = np.array([5, 5, 5, 5, 9, 7, 7])
    tids = np.asarray(morton(xs, ys), np.int64)
    prims = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": tids,
                    "year": [2022] * len(tids),
                    "class": lc.astype(np.int32),
                    "prob": np.full(len(tids), 0.9, np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    out = assemblage.mesh(prims, year=2022).to_pandas().set_index("LANDCOVER")
    A = 7.0
    for c, a2 in {5: 16, 7: 4, 9: 1}.items():
        assert out.loc[c, "a2_sum"] == a2
        assert out.loc[c, "mesh"] == a2 / A
        assert out.loc[c, "division"] == 1.0 - a2 / (A * A)
    assert list(out["n_patches"]) == [1, 1, 1]


def test_std_ellipse_hand_grid(ray_session):
    """Class 5 = horizontal 5-tile line (vy = 0, theta = 0, semi_minor
    = 0); class 9 = 2x2 square (isotropic: std_dist = sqrt(0.5),
    semi_major = semi_minor)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.state.cells import morton

    xs = np.array([10, 11, 12, 13, 14, 50, 51, 50, 51])
    ys = np.array([20, 20, 20, 20, 20, 70, 70, 71, 71])
    lc = np.array([5, 5, 5, 5, 5, 9, 9, 9, 9])
    tids = np.asarray(morton(xs, ys), np.int64)
    prims = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": tids,
                    "year": [2022] * len(tids),
                    "class": lc.astype(np.int32),
                    "prob": np.full(len(tids), 0.9, np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    out = assemblage.std_ellipse(prims, year=2022).to_pandas().set_index("LANDCOVER")
    line = out.loc[5]
    assert line["n"] == 5 and line["mean_x"] == 12.0 and line["mean_y"] == 20.0
    assert line["theta"] == 0.0 and line["semi_minor"] == 0.0
    assert line["std_dist"] == np.sqrt(2.0)  # var x = (4+1+0+1+4)/5 = 2
    assert line["semi_major"] == np.sqrt(2.0)
    sq = out.loc[9]
    assert sq["n"] == 4 and sq["mean_x"] == 50.5 and sq["mean_y"] == 70.5
    assert sq["std_dist"] == np.sqrt(0.5)
    assert sq["semi_major"] == sq["semi_minor"] == np.sqrt(0.25)
    # reshard invariance
    out2 = (
        assemblage.std_ellipse(prims.repartition(4), year=2022)
        .to_pandas()
        .set_index("LANDCOVER")
    )
    assert out.equals(out2)


def test_join_counts_hand_grid(ray_session):
    """Strip [5, 5, 7]: m = 2 undirected edges, BB_5 = 1, BW_5 = 1,
    BW_7 = 1; E[BB_5] = 2*(2*1)/(3*2) = 2/3 -> ratio 1.5."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.state.cells import morton

    xs = np.arange(3)
    ys = np.zeros(3, np.int64)
    lc = np.array([5, 5, 7])
    tids = np.asarray(morton(xs, ys), np.int64)
    prims = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": tids,
                    "year": [2022] * 3,
                    "class": lc.astype(np.int32),
                    "prob": np.full(3, 0.9, np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    out = assemblage.join_counts(prims, year=2022).to_pandas().set_index("LANDCOVER")
    assert out.loc[5, "n_b"] == 2 and out.loc[5, "bb"] == 1
    assert out.loc[5, "bw"] == 1 and out.loc[7, "bw"] == 1
    assert out.loc[7, "bb"] == 0
    exp5 = 2.0 * (2.0 * 1.0) / (3.0 * 2.0)
    assert out.loc[5, "exp_bb"] == exp5
    assert out.loc[5, "ratio"] == 1.0 / exp5
    # reshard invariance
    out2 = (
        assemblage.join_counts(prims.repartition(3), year=2022)
        .to_pandas()
        .set_index("LANDCOVER")
    )
    assert out.equals(out2)


def test_label_stability_hand(ray_session):
    """Tile A: years 2020/2021/2022 labeled 5,5,7 -> modal 5 (2 years),
    3 years, 2 labels, unstable.  Tile B: 9 both years -> stable.
    Tie case: tile C labels 3,8 one year each -> modal = smallest (3)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.state.cells import morton

    ta, tb, tc = (
        int(morton(np.array([1]), np.array([1]))[0]),
        int(morton(np.array([2]), np.array([2]))[0]),
        int(morton(np.array([3]), np.array([3]))[0]),
    )
    rows = [
        (ta, 2020, 5), (ta, 2021, 5), (ta, 2022, 7),
        (tb, 2020, 9), (tb, 2021, 9),
        (tc, 2020, 8), (tc, 2021, 3),
    ]
    prims = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": np.array([r[0] for r in rows], np.int64),
                    "year": np.array([r[1] for r in rows], np.int32),
                    "class": np.array([r[2] for r in rows], np.int32),
                    "prob": np.full(len(rows), 0.9, np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    out = (
        assemblage.label_stability(prims).to_pandas().set_index("tile_id")
    )
    assert out.loc[ta, "n_years"] == 3 and out.loc[ta, "n_labels"] == 2
    assert out.loc[ta, "modal_label"] == 5 and out.loc[ta, "modal_years"] == 2
    assert out.loc[ta, "stable"] == 0
    assert out.loc[tb, "stable"] == 1 and out.loc[tb, "modal_label"] == 9
    assert out.loc[tc, "modal_label"] == 3  # tie -> smallest class
    out2 = assemblage.label_stability(prims.repartition(4)).to_pandas().set_index(
        "tile_id"
    )
    assert out.sort_index().equals(out2.sort_index())


def test_patch_gini_hand(ray_session):
    """Class 5: patches of sizes 1 and 3 (Gini of [1,3] = 0.25 by the
    rank identity); class 9: two equal singletons (Gini 0)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.state.cells import morton

    # class 5: L-tromino at (1,1),(2,1),(2,2) + isolated (5,5)
    xs = np.array([1, 2, 2, 5, 8, 10])
    ys = np.array([1, 1, 2, 5, 8, 8])
    lc = np.array([5, 5, 5, 5, 9, 9])
    tids = np.asarray(morton(xs, ys), np.int64)
    prims = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": tids,
                    "year": [2022] * len(tids),
                    "class": lc.astype(np.int32),
                    "prob": np.full(len(tids), 0.9, np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    out = assemblage.patch_gini(prims, year=2022).to_pandas().set_index("LANDCOVER")
    assert out.loc[5, "n_patches"] == 2 and out.loc[5, "area"] == 4
    # sorted sizes [1, 3]: sum i*x = 1*1 + 2*3 = 7; G = 2*7/(2*4) - 3/2 = 0.25
    assert out.loc[5, "gini"] == 2.0 * 7 / (2.0 * 4.0) - 3.0 / 2.0
    assert out.loc[9, "gini"] == 2.0 * 3 / (2.0 * 2.0) - 3.0 / 2.0  # = 0
    assert out.loc[9, "gini"] == 0.0


def test_isolation_index_hand(ray_session):
    """Two parent cells: cell A all class 5 (4 tiles), cell B mixed
    5/9 (2+2).  N_5 = 6, N_9 = 2, T_A = 4, T_B = 4.
    P*_55 = (4/6)(4/4) + (2/6)(2/4) = 5/6; P*_99 = (2/2)(2/4) = 1/2."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.state.cells import morton

    # tiles at CELL parent (0,0): tile coords 0..3 in each axis quadrant;
    # parent cell = tile >> 4 bits (2 levels), i.e. tile coords 0-3 -> cell 0,
    # coords 4-7 -> cell 1
    xs = np.array([0, 1, 2, 3, 4, 5, 6, 7])
    ys = np.array([0, 0, 0, 0, 0, 0, 0, 0])
    lc = np.array([5, 5, 5, 5, 5, 5, 9, 9])
    tids = np.asarray(morton(xs, ys), np.int64)
    prims = rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "tile_id": tids,
                    "year": [2022] * len(tids),
                    "class": lc.astype(np.int32),
                    "prob": np.full(len(tids), 0.9, np.float32),
                }
            ),
            preserve_index=False,
        )
    )
    out = (
        assemblage.isolation_index(prims, year=2022)
        .to_pandas()
        .set_index("LANDCOVER")
    )
    S = float(1 << 40)
    q5 = int(np.floor((4 / 6) * (4 / 4) * S)) + int(np.floor((2 / 6) * (2 / 4) * S))
    q9 = int(np.floor((2 / 2) * (2 / 4) * S))
    assert out.loc[5, "iso_q"] == q5 and out.loc[9, "iso_q"] == q9
    assert out.loc[5, "isolation"] == q5 / S
    assert out.loc[5, "share"] == 6.0 / 8.0
    out2 = (
        assemblage.isolation_index(prims.repartition(4), year=2022)
        .to_pandas()
        .set_index("LANDCOVER")
    )
    assert out.equals(out2)


def test_dissimilarity_hand(ray_session):
    """Cells A = all class 5, B = all class 9 (complete separation:
    D = 1); adding a mixed cell C (2x5 + 2x9) lowers D."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.state.cells import morton

    def mk(xs, ys, lc):
        tids = np.asarray(morton(np.array(xs), np.array(ys)), np.int64)
        return rd.from_arrow(
            pa.Table.from_pandas(
                pd.DataFrame(
                    {
                        "tile_id": tids,
                        "year": [2022] * len(tids),
                        "class": np.array(lc, np.int32),
                        "prob": np.full(len(tids), 0.9, np.float32),
                    }
                ),
                preserve_index=False,
            )
        )

    # cell (0,0): tiles 0-3; cell (1,0): tiles 4-7
    sep = mk([0, 1, 4, 5], [0, 0, 0, 0], [5, 5, 9, 9])
    out = assemblage.dissimilarity_index(sep, year=2022).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["class_a"], r["class_b"]) == (5, 9)
    assert r["dissimilarity"] == 1.0
    mixed = mk(
        [0, 1, 4, 5, 8, 9, 10, 11],
        [0] * 8,
        [5, 5, 9, 9, 5, 5, 9, 9],
    )
    out2 = assemblage.dissimilarity_index(mixed, year=2022).to_pandas()
    assert out2["dissimilarity"].iloc[0] < 1.0


def test_theil_h_extremes(ray_session):
    """Complete separation (each cell single-class) gives H = ~1 (up to
    floor quanta); an evenly-mixed landscape gives H = ~0."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.state.cells import morton

    def mk(xs, ys, lc):
        tids = np.asarray(morton(np.array(xs), np.array(ys)), np.int64)
        return rd.from_arrow(
            pa.Table.from_pandas(
                pd.DataFrame(
                    {
                        "tile_id": tids,
                        "year": [2022] * len(tids),
                        "class": np.array(lc, np.int32),
                        "prob": np.full(len(tids), 0.9, np.float32),
                    }
                ),
                preserve_index=False,
            )
        )

    # cells (0,0) and (1,0): separated = all-5 cell + all-9 cell
    sep = assemblage.theil_h(
        mk([0, 1, 4, 5], [0, 0, 0, 0], [5, 5, 9, 9]), year=2022
    ).to_pandas()
    assert abs(sep["theil_h"].iloc[0] - 1.0) < 1e-6
    # both cells half-5 half-9: cell entropy == landscape entropy -> 0
    mix = assemblage.theil_h(
        mk([0, 1, 4, 5], [0, 0, 0, 0], [5, 9, 5, 9]), year=2022
    ).to_pandas()
    assert abs(mix["theil_h"].iloc[0]) < 1e-6
    # single class -> undefined -> empty
    one = assemblage.theil_h(
        mk([0, 1], [0, 0], [5, 5]), year=2022
    )
    assert one.count() == 0


def test_class_aspect_shares_and_octants(synth_small, ray_session):
    """class_aspect: octants in 0..7, per-class shares sum to 1, and a
    spot tile's octant matches a direct atan2 replay."""
    import math

    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage
    from kaza_lcms_ray.stages.sar import DEG
    from kaza_lcms_ray.state import cells, dem
    from kaza_lcms_ray.state.cells import TILE_LEVEL

    prims = rd.read_parquet(f"{synth_small}/primitives.parquet")
    out = assemblage.class_aspect(prims, year=2022).to_pandas()
    assert out["octant"].between(0, 7).all()
    sums = out.groupby("LANDCOVER")["share"].sum()
    assert np.allclose(sums.to_numpy(), 1.0, atol=1e-12)
    assert out["n"].sum() > 0 and out["octant"].nunique() > 1


def test_hypsometric_consistency(synth_small, ray_session):
    """Cumulative areas are monotone, final share is exactly 1, and the
    zone set matches core_area's area margins."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage

    prims = rd.read_parquet(f"{synth_small}/primitives.parquet")
    out = assemblage.hypsometric(prims, year=2022).to_pandas()
    assert (np.diff(out["cum_area"].to_numpy(np.int64)) > 0).all()
    assert out["cum_share"].iloc[-1] == 1.0
    ca = assemblage.core_area(prims, year=2022).to_pandas()
    assert set(out["zone"]) == set(ca["zone"])
    merged = out.merge(ca, on="zone")
    assert (merged["area_x"] == merged["area_y"]).all()


def test_class_elevation_margins(synth_small, ray_session):
    """Per-class shares sum to 1; zone margins summed over classes match
    the hypsometric areas."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import assemblage

    prims = rd.read_parquet(f"{synth_small}/primitives.parquet")
    out = assemblage.class_elevation(prims, year=2022).to_pandas()
    sums = out.groupby("LANDCOVER")["share"].sum()
    assert np.allclose(sums.to_numpy(), 1.0, atol=1e-12)
    hy = assemblage.hypsometric(prims, year=2022).to_pandas()
    zm = out.groupby("zone")["n"].sum()
    assert {int(k): int(v) for k, v in zm.items()} == {
        int(r.zone): int(r.area) for r in hy.itertuples()
    }
