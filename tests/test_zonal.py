"""Zonal aggregates vs DuckDB oracle (exact scaled-int arithmetic)."""

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from kaza_lcms_ray.stages import spans, zonal


def _geo_df(synth_dir):
    import pyarrow.parquet as pq

    frames = []
    import glob

    for f in sorted(glob.glob(f"{synth_dir}/documents/part-*.parquet")):
        frames.append(spans.parse_geo_batch(pq.read_table(f)).to_pandas())
    return pd.concat(frames, ignore_index=True)


def test_zonal_counts_match_duckdb(synth_small, ray_session):
    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    got = (
        zonal.zonal_counts(geo, keys=("cell_id", "year"), bands=(0, 3))
        .to_pandas()
        .sort_values(["cell_id", "year"])
        .reset_index(drop=True)
    )
    oracle_df = _geo_df(synth_small)
    con = duckdb.connect()
    con.register("geo", oracle_df)
    exp = con.sql(
        """
        SELECT cell_id, "year", COUNT(*) AS n,
               CAST(SUM(c0) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 100) AS mean_b0,
               CAST(SUM(c3) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) * 100) AS mean_b3
        FROM geo GROUP BY cell_id, "year" ORDER BY cell_id, "year"
        """
    ).df()
    assert len(got) == len(exp)
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    # bit-exact: integer sums → one identical double division on both sides
    assert (got["mean_b0"].to_numpy() == exp["mean_b0"].to_numpy()).all()
    assert (got["mean_b3"].to_numpy() == exp["mean_b3"].to_numpy()).all()


def test_zonal_percentiles_match_duckdb(synth_small, ray_session):
    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    got = (
        zonal.zonal_percentiles(geo, keys=("cell_id", "year"), band=3)
        .to_pandas()
        .sort_values(["cell_id", "year"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("geo", _geo_df(synth_small))
    exp = con.sql(
        """
        SELECT cell_id, "year", COUNT(*) AS n,
               quantile_cont(CAST(c3 AS DOUBLE), 0.10) AS p10,
               quantile_cont(CAST(c3 AS DOUBLE), 0.50) AS p50,
               quantile_cont(CAST(c3 AS DOUBLE), 0.90) AS p90
        FROM geo GROUP BY cell_id, "year" ORDER BY cell_id, "year"
        """
    ).df()
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    for p, col in ((10, "p10"), (50, "p50"), (90, "p90")):
        g = got[f"p{p}_b3"].to_numpy()
        e = exp[col].to_numpy()
        assert (g == e).all(), (p, np.abs(g - e).max())  # bit-exact


def test_harmonic_fit_runs_and_is_deterministic(synth_small, ray_session):
    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    # coarse key (year only) → few groups, well-conditioned fits
    fit = zonal.harmonic_fit(geo, keys=("year",), band=3).to_pandas().sort_values("year")
    assert len(fit) == 3 and fit["n"].sum() == geo.count()
    # independent oracle: lstsq fit on (t = day/365, y = cents·0.01); the
    # engine's Cramer solve must agree to numerical tolerance (bit-exactness
    # is checked against the DuckDB replay in the driver contract)
    df = _geo_df(synth_small)
    for _, row in fit.iterrows():
        sub = df[df["year"] == row["year"]]
        t = (
            (sub["year"].to_numpy().astype(np.int64) - 1970) * 365
            + (sub["doy"].to_numpy().astype(np.int64) - 1)
        ) / 365.0
        y = sub["c3"].to_numpy().astype(np.float64)
        w = 2.0 * np.pi * t
        X = np.stack([np.ones_like(t), t, np.cos(w), np.sin(w)], axis=1)
        coef = np.linalg.lstsq(X, y, rcond=None)[0]
        phase = np.arctan2(coef[2], coef[3])
        amp = np.hypot(coef[2], coef[3]) * 0.01
        assert abs(row["b3_phase"] - phase) < 1e-8
        assert abs(row["b3_amplitude"] - amp) < 1e-8 * max(1.0, amp)
    # deterministic across runs
    fit2 = zonal.harmonic_fit(geo, keys=("year",), band=3).to_pandas().sort_values("year")
    assert (fit2["b3_phase"].to_numpy() == fit["b3_phase"].to_numpy()).all()


def test_area_by_class(synth_small, ray_session):
    from kaza_lcms_ray.stages import assemblage

    prims = rd.read_parquet(f"{synth_small}/primitives.parquet")
    labels = assemblage.assemble_tile_labels(prims)
    area = zonal.area_by_class(labels, level=14).to_pandas()
    assert set(area["LANDCOVER"]) <= set(range(1, 9))
    assert (area["n_tiles"] > 0).all() and (area["area_m2"] > 0).all()
    assert area["n_tiles"].sum() == labels.count()


def test_approx_percentiles_within_bin_error(synth_small, ray_session):
    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    exact = (
        zonal.zonal_percentiles(geo, keys=("year",), band=3)
        .to_pandas()
        .sort_values("year")
        .reset_index(drop=True)
    )
    approx = (
        zonal.approx_percentiles(geo, keys=("year",), band=3)
        .to_pandas()
        .sort_values("year")
        .reset_index(drop=True)
    )
    assert (approx["n"].to_numpy() == exact["n"].to_numpy()).all()
    width = 1_000_000.0 / 4096
    for p in (10, 25, 50, 75, 90):
        err = np.abs(approx[f"p{p}_b3"].to_numpy() - exact[f"p{p}_b3"].to_numpy())
        assert (err <= 2 * width + 1e-9).all(), (p, err.max())
    # deterministic across repartitioning
    approx2 = (
        zonal.approx_percentiles(geo.repartition(7), keys=("year",), band=3)
        .to_pandas()
        .sort_values("year")
        .reset_index(drop=True)
    )
    assert approx.equals(approx2)


def test_harmonic_rgb_conversion(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import zonal

    # phase -pi -> hue 0 (pure red at s=1); phase ~ +pi/3 -> hue 2/3 (blue)
    df = pd.DataFrame(
        {
            "b3_phase": [-np.pi, -np.pi / 3, np.pi / 3, 0.0],
            "b3_amplitude": [0.4, 0.4, 0.4, 0.0],  # s=1,1,1,0
        }
    )
    out = zonal.harmonic_rgb(rd.from_pandas(df)).to_pandas()
    rgb = out[["r", "g", "b"]].to_numpy()
    assert ((rgb >= 0) & (rgb <= 1)).all()
    assert np.allclose(rgb[0], [1, 0, 0])        # hue 0 -> red
    assert np.allclose(rgb[1], [0, 1, 0])        # hue 1/3 -> green
    assert np.allclose(rgb[2], [0, 0, 1])        # hue 2/3 -> blue
    assert np.allclose(rgb[3], [1, 1, 1])        # s=0 -> white (v=1)


def test_value_histogram_clamps_and_sums(ray_session):
    """Histogram counts sum to the row count; out-of-range values clamp to
    edge bins; reshard-invariant integer counts."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages.zonal import value_histogram

    vals = np.array([-5.0, 0.0, 0.49, 0.5, 0.99, 1.0, 7.0])
    ds = rd.from_arrow(pa.table({"v": vals}))
    for d in (ds, ds.repartition(4)):
        out = value_histogram(d, "v", 0.0, 1.0, 2).to_pandas().sort_values("bin")
        assert out["bin"].tolist() == [0, 1]
        assert out["n"].tolist() == [3, 4]  # low: -5(clamp),0,0.49; high: 0.5,0.99,1.0(clamp),7(clamp)
        assert out["n"].sum() == len(vals)


def test_kring_smooth_matches_bruteforce(synth_small, ray_session):
    from kaza_lcms_ray.state.cells import CELL_LEVEL, decode, morton

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    got = (
        zonal.kring_smooth(geo, band=3, k=1)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    # brute force: per-cell exact sums, then python-dict 3x3 window
    df = _geo_df(synth_small)
    agg = df.groupby("cell_id", as_index=False).agg(
        n=("c3", "size"), s=("c3", "sum")
    )
    n_grid = 1 << CELL_LEVEL
    ix, iy = decode(agg["cell_id"].to_numpy(), CELL_LEVEL)
    by_xy = {
        (int(x), int(y)): (int(n), int(s))
        for x, y, n, s in zip(ix, iy, agg["n"], agg["s"])
    }
    rows = []
    for (x, y), _ in by_xy.items():
        tn = ts = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tx, ty = x + dx, y + dy
                if 0 <= tx < n_grid and 0 <= ty < n_grid and (tx, ty) in by_xy:
                    nn, ss = by_xy[(tx, ty)]
                    tn += nn
                    ts += ss
        rows.append((int(morton(np.array([x]), np.array([y]))[0]), tn, ts))
    exp = pd.DataFrame(rows, columns=["cell_id", "nbr_n", "s"]).sort_values(
        "cell_id"
    ).reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["cell_id"].to_numpy() == exp["cell_id"].to_numpy()).all()
    assert (got["nbr_n"].to_numpy() == exp["nbr_n"].to_numpy()).all()
    want = exp["s"].to_numpy(np.float64) / (exp["nbr_n"].to_numpy(np.float64) * 100)
    assert got["smooth_b3"].to_numpy().tobytes() == want.tobytes()


def test_cell_trend_matches_bruteforce(synth_small, ray_session):
    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    got = (
        zonal.cell_trend(geo, band=3)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    df = _geo_df(synth_small)
    df["x"] = df["year"].astype(np.int64) - zonal.TREND_BASE_YEAR
    df["y"] = df["c3"].astype(np.int64)
    df["xy"] = df["x"] * df["y"]
    df["xx"] = df["x"] * df["x"]
    agg = df.groupby("cell_id").agg(
        n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
        sxy=("xy", "sum"), sxx=("xx", "sum"),
    )
    f = agg.astype(np.float64)
    den = f["n"] * f["sxx"] - f["sx"] * f["sx"]
    keep = den != 0.0
    slope = (f["n"] * f["sxy"] - f["sx"] * f["sy"])[keep] / den[keep]
    exp = slope.sort_index()
    assert len(got) == len(exp)
    assert (got["cell_id"].to_numpy() == exp.index.to_numpy()).all()
    assert got["slope_b3"].to_numpy().tobytes() == exp.to_numpy().tobytes()


def test_local_morans_matches_bruteforce(synth_small, ray_session):
    from kaza_lcms_ray.state.cells import CELL_LEVEL, decode, morton

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    got = (
        zonal.local_morans(geo, band=3, k=1)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    df = _geo_df(synth_small)
    agg = df.groupby("cell_id", as_index=False).agg(v=("c3", "sum"))
    n_cells = len(agg)
    v_sum = int(agg["v"].sum())
    vbar = v_sum / n_cells
    S = float(zonal.MORAN_SCALE_INT)
    z = (agg["v"].to_numpy(np.float64) - vbar) / vbar
    den_q = int(np.floor(z * z * S).astype(np.int64).sum())
    n_grid = 1 << CELL_LEVEL
    ix, iy = decode(agg["cell_id"].to_numpy(), CELL_LEVEL)
    by_xy = {
        (int(x), int(y)): int(v) for x, y, v in zip(ix, iy, agg["v"])
    }
    rows = []
    for (x, y), v in by_xy.items():
        zi = (v - vbar) / vbar
        li_q = w = s_src = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                tx, ty = x + dx, y + dy
                if 0 <= tx < n_grid and 0 <= ty < n_grid and (tx, ty) in by_xy:
                    vj = by_xy[(tx, ty)]
                    zj = (vj - vbar) / vbar
                    li_q += int(np.floor(np.float64(zi * zj) * S))
                    w += 1
                    s_src += vj
        if w == 0:
            continue
        hi = v * n_cells > v_sum
        lag_hi = n_cells * s_src > w * v_sum
        quad = ("HH" if lag_hi else "HL") if hi else ("LH" if lag_hi else "LL")
        cid = int(morton(np.array([x]), np.array([y]))[0])
        rows.append((cid, w, li_q, quad, float(li_q) * n_cells / den_q))
    exp = (
        pd.DataFrame(rows, columns=["cell_id", "w", "li_q", "quad", "local_i"])
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["cell_id"].to_numpy() == exp["cell_id"].to_numpy()).all()
    assert (got["w"].to_numpy() == exp["w"].to_numpy()).all()
    assert (got["li_q"].to_numpy() == exp["li_q"].to_numpy()).all()
    assert (got["quad"].to_numpy() == exp["quad"].to_numpy()).all()
    assert got["local_i"].to_numpy().tobytes() == exp["local_i"].to_numpy().tobytes()
    # every quadrant's sign convention: HH/LL contribute positive local_i
    hh = got[got["quad"].isin(["HH", "LL"])]
    assert (hh["li_q"].to_numpy() >= 0).any()


def test_idw_fill_matches_bruteforce(synth_small, ray_session):
    from kaza_lcms_ray.state.cells import CELL_LEVEL, decode, morton

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    got = (
        zonal.idw_fill(geo, band=3, max_ring=2)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    df = _geo_df(synth_small)
    agg = df.groupby("cell_id", as_index=False).agg(
        n=("c3", "size"), s=("c3", "sum")
    )
    Q = zonal.IDW_SCALE_INT
    n_grid = 1 << CELL_LEVEL
    ix, iy = decode(agg["cell_id"].to_numpy(), CELL_LEVEL)
    by_xy = {
        (int(x), int(y)): (int(s) * Q) // int(n)
        for x, y, n, s in zip(ix, iy, agg["n"], agg["s"])
    }
    acc = {}
    for (x, y), mq in by_xy.items():
        for dx in range(-2, 3):
            for dy in range(-2, 3):
                if dx == 0 and dy == 0:
                    continue
                tx, ty = x + dx, y + dy
                if not (0 <= tx < n_grid and 0 <= ty < n_grid):
                    continue
                if (tx, ty) in by_xy:
                    continue
                wq = Q // (dx * dx + dy * dy)
                num, den, ns = acc.get((tx, ty), (0, 0, 0))
                acc[(tx, ty)] = (num + mq * wq, den + wq, ns + 1)
    rows = [
        (
            int(morton(np.array([x]), np.array([y]))[0]),
            ns,
            num,
            den,
            float(num) / float(den),
        )
        for (x, y), (num, den, ns) in acc.items()
    ]
    exp = (
        pd.DataFrame(rows, columns=["cell_id", "n_src", "num_q", "den_q", "idw"])
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ("cell_id", "n_src", "num_q", "den_q"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all()
    assert got["idw"].to_numpy().tobytes() == exp["idw"].to_numpy().tobytes()
    # gap cells only: no output cell is an occupied cell
    occ = set(agg["cell_id"].to_numpy().tolist())
    assert not (set(got["cell_id"].to_numpy().tolist()) & occ)


def test_raster_upsample_matches_bruteforce(synth_small, ray_session):
    from kaza_lcms_ray.state.cells import CELL_LEVEL, decode, morton

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    got = (
        zonal.raster_upsample(geo, band=3)
        .to_pandas()
        .sort_values("fine_cell_id")
        .reset_index(drop=True)
    )
    df = _geo_df(synth_small)
    agg = df.groupby("cell_id", as_index=False).agg(
        n=("c3", "size"), s=("c3", "sum")
    )
    Q = zonal.IDW_SCALE_INT
    n_fine = 1 << (CELL_LEVEL + 1)
    ix, iy = decode(agg["cell_id"].to_numpy(), CELL_LEVEL)
    acc = {}
    ax = [(-1, 1), (0, 3), (1, 3), (2, 1)]
    for x, y, n, s in zip(ix, iy, agg["n"], agg["s"]):
        mq = (int(s) * Q) // int(n)
        for fdx, wx in ax:
            for fdy, wy in ax:
                tx, ty = 2 * int(x) + fdx, 2 * int(y) + fdy
                if not (0 <= tx < n_fine and 0 <= ty < n_fine):
                    continue
                num, den, ns = acc.get((tx, ty), (0, 0, 0))
                acc[(tx, ty)] = (num + mq * wx * wy, den + wx * wy, ns + 1)
    rows = [
        (
            int(morton(np.array([x]), np.array([y]))[0]),
            ns,
            num,
            den,
            float(num) / float(den),
        )
        for (x, y), (num, den, ns) in acc.items()
    ]
    exp = (
        pd.DataFrame(
            rows, columns=["fine_cell_id", "n_src", "num_q", "den_w", "value"]
        )
        .sort_values("fine_cell_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ("fine_cell_id", "n_src", "num_q", "den_w"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all()
    assert got["value"].to_numpy().tobytes() == exp["value"].to_numpy().tobytes()
    # interior fine cells carry the full 16-weight stencil
    assert (got["den_w"].to_numpy() <= 16).all()
    assert (got["den_w"].to_numpy() == 16).any()


def test_getis_ord_matches_bruteforce(synth_small, ray_session):
    from kaza_lcms_ray.state.cells import CELL_LEVEL, decode, morton

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    got = (
        zonal.getis_ord(geo, band=3, k=1)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    df = _geo_df(synth_small)
    agg = df.groupby("cell_id", as_index=False).agg(v=("c3", "sum"))
    n = len(agg)
    s1 = int(agg["v"].sum())
    s2 = int((agg["v"].to_numpy(np.int64) ** 2).sum())
    n_grid = 1 << CELL_LEVEL
    ix, iy = decode(agg["cell_id"].to_numpy(), CELL_LEVEL)
    by_xy = {(int(x), int(y)): int(v) for x, y, v in zip(ix, iy, agg["v"])}
    rows = []
    for (x, y) in by_xy:
        lag = w = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tx, ty = x + dx, y + dy
                if 0 <= tx < n_grid and 0 <= ty < n_grid and (tx, ty) in by_xy:
                    lag += by_xy[(tx, ty)]
                    w += 1
        num = n * lag - w * s1
        den = np.sqrt(
            np.float64(n) * np.float64(s2) - np.float64(s1) * np.float64(s1)
        ) * np.sqrt(
            (np.float64(n) * np.float64(w) - np.float64(w) * np.float64(w))
            / (np.float64(n) - 1.0)
        )
        cid = int(morton(np.array([x]), np.array([y]))[0])
        rows.append((cid, w, lag, num, float(np.float64(num) / den)))
    exp = (
        pd.DataFrame(rows, columns=["cell_id", "w", "lag", "num_scaled", "gi_z"])
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ("cell_id", "w", "lag", "num_scaled"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all()
    assert got["gi_z"].to_numpy().tobytes() == exp["gi_z"].to_numpy().tobytes()
    # the self term is in: every cell has w >= 1 and lag includes own value
    assert (got["w"].to_numpy() >= 1).all()


def test_ripley_k_and_quadrat_match_bruteforce(synth_small, ray_session):
    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    got = (
        zonal.ripley_k(geo, max_ring=2)
        .to_pandas()
        .sort_values("ring")
        .reset_index(drop=True)
    )
    from kaza_lcms_ray.state.cells import CELL_LEVEL, decode

    df = _geo_df(synth_small)
    agg = df.groupby("cell_id", as_index=False).agg(n=("c3", "size"))
    ix, iy = decode(agg["cell_id"].to_numpy(), CELL_LEVEL)
    pos = {(int(x), int(y)): int(n) for x, y, n in zip(ix, iy, agg["n"])}
    C = len(pos)
    P = sum(pos.values())
    by_ring = [0, 0, 0]
    by_ring[0] = sum(n * (n - 1) for n in pos.values())
    for (x, y), n in pos.items():
        for dx in range(-2, 3):
            for dy in range(-2, 3):
                r = max(abs(dx), abs(dy))
                if r == 0 or r > 2:
                    continue
                if (x + dx, y + dy) in pos:
                    by_ring[r] += n * pos[(x + dx, y + dy)]
    cum = np.cumsum(by_ring)
    assert got["pairs_at_ring"].tolist() == by_ring
    assert got["cum_pairs"].tolist() == cum.tolist()
    want = (np.float64(C) * cum.astype(np.float64)) / (
        np.float64(P) * (np.float64(P) - 1.0)
    )
    assert got["k_hat"].to_numpy().tobytes() == want.tobytes()

    qt = zonal.quadrat_test(geo).to_pandas()
    num = sum((C * n - P) ** 2 for n in pos.values())
    assert qt["n_cells"].tolist() == [C]
    assert qt["n_points"].tolist() == [P]
    assert qt["chi2_num"].tolist() == [num]
    assert qt["df"].tolist() == [C - 1]
    assert qt["chi2"].to_numpy().tobytes() == np.array(
        [np.float64(num) / (np.float64(C) * np.float64(P))]
    ).tobytes()


def test_trimmed_mean_matches_bruteforce(synth_small, ray_session):
    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    got = (
        zonal.trimmed_mean(geo, band=3)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    df = _geo_df(synth_small)
    rows = []
    for cid, grp in df.groupby("cell_id"):
        v = np.sort(grp["c3"].to_numpy(np.int64))
        n = len(v)
        k = (n * 10) // 100
        kept = v[k : n - k]
        rows.append((cid, n, len(kept), int(kept.sum()),
                     float(kept.sum()) / float(len(kept))))
    exp = (
        pd.DataFrame(rows, columns=["cell_id", "n", "kept", "trim_sum",
                                    "trimmed_mean"])
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ("cell_id", "n", "kept", "trim_sum"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all()
    assert got["trimmed_mean"].to_numpy().tobytes() == exp[
        "trimmed_mean"
    ].to_numpy().tobytes()


def test_mann_kendall_matches_bruteforce(synth_small, ray_session):
    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    got = (
        zonal.mann_kendall(geo, band=3)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    df = _geo_df(synth_small)
    yearly = (
        df.groupby(["cell_id", "year"])["c3"].sum().reset_index(name="v")
    )
    rows = []
    for cid, grp in yearly.groupby("cell_id"):
        v = grp.sort_values("year")["v"].to_numpy(np.int64)
        k = len(v)
        s = sum(
            int(np.sign(v[j] - v[i]))
            for i in range(k)
            for j in range(i + 1, k)
        )
        rows.append((cid, k, k * (k - 1) // 2, s, int(np.sign(s))))
    exp = (
        pd.DataFrame(
            rows, columns=["cell_id", "n_years", "n_pairs", "s_stat", "trend"]
        )
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in exp.columns:
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # a real multi-year series must exist, else the test is vacuous
    assert (exp["n_pairs"] > 0).any()


def test_raster_pyramid_conserves_mass(synth_small, ray_session):
    """Each pyramid level's n and cent sums total exactly the base
    raster's; parents are the bit-shift of their children."""
    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    pyr = zonal.raster_pyramid(geo, band=3).to_pandas()
    df = _geo_df(synth_small)
    n_obs = len(df)
    s_tot = int(df["c3"].sum())
    for lu in (1, 2):
        lvl = pyr[pyr["level_up"] == lu]
        assert int(lvl["n"].sum()) == n_obs
        assert int(lvl["s_c3"].sum()) == s_tot
    # level-2 cells are exactly the level-1 parents
    l1 = set((pyr.loc[pyr["level_up"] == 1, "cell_id"] // 4).tolist())
    l2 = set(pyr.loc[pyr["level_up"] == 2, "cell_id"].tolist())
    assert l1 == l2
    # mean is the pinned division
    r = pyr.iloc[0]
    assert r["mean_b3"] == float(r["s_c3"]) / (float(r["n"]) * 100.0)


def test_dist_transform_matches_bruteforce(synth_small, ray_session):
    from kaza_lcms_ray.state import cells as C

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    got = (
        zonal.dist_transform(geo, band=3, thresh_q=480_000, max_ring=3)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    df = _geo_df(synth_small)
    agg = df.groupby("cell_id")["c3"].agg(["sum", "count"]).reset_index()
    cid = agg["cell_id"].to_numpy(np.int64)
    mask = agg["sum"].to_numpy(np.int64) > 480_000 * agg["count"].to_numpy(np.int64)
    ix, iy = C.decode(cid, C.CELL_LEVEL)
    mx, my = ix[mask].astype(np.int64), iy[mask].astype(np.int64)
    dist = np.full(len(cid), 4, np.int64)
    if len(mx):
        for i in range(len(cid)):
            d = np.maximum(np.abs(mx - ix[i]), np.abs(my - iy[i])).min()
            dist[i] = min(int(d), 4)
    exp = (
        pd.DataFrame(
            {"cell_id": cid, "in_mask": mask.astype(np.int64), "dist": dist}
        )
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    for c in ("cell_id", "in_mask", "dist"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    # the mask and at least one positive-distance cell must exist
    assert exp["in_mask"].sum() > 0 and (exp["dist"] > 0).any()


def test_psi_drift_identical_years_near_zero(synth_small, ray_session):
    """PSI of a distribution against itself is ~0 (only smoothing noise);
    counts are exact."""
    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    same = zonal.psi_drift(geo, band=3, year_a=2021, year_b=2021).to_pandas()
    assert len(same) == zonal.PSI_BINS
    assert (same["n_a"] == same["n_b"]).all()
    assert np.abs(same["psi_term"]).max() == 0.0
    drift = zonal.psi_drift(geo, band=3).to_pandas()
    df = _geo_df(synth_small)
    for y, col in ((2020, "n_a"), (2022, "n_b")):
        v = df.loc[df["year"] == y, "c3"].to_numpy(np.int64)
        b = np.minimum(np.maximum(v, 0) * zonal.PSI_BINS // zonal.PSI_HI,
                       zonal.PSI_BINS - 1)
        want = np.bincount(b, minlength=zonal.PSI_BINS)
        assert (drift[col].to_numpy() == want).all()


def test_grouped_weighted_quantile_hand_case(ray_session):
    import pyarrow as pa

    # group A: values 1,2,3 with weights 1,1,10 -> weighted median = 3
    #          (cum 1, 2, 12 cents-scaled; threshold 2*cw >= tot=12 at v=3)
    # group B: values 5,6 with equal weights -> lower median rule picks 5
    df = pd.DataFrame(
        {
            "g": ["A", "A", "A", "B", "B"],
            "v": [1.0, 2.0, 3.0, 5.0, 6.0],
            "w": [1.0, 1.0, 10.0, 2.0, 2.0],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = (
        zonal.grouped_weighted_quantile(ds, ["g"], "v", "w")
        .to_pandas()
        .set_index("g")["wq_c"]
    )
    assert out["A"] == 300
    assert out["B"] == 500


def test_grouped_weighted_quantile_reshard_and_q75(ray_session):
    import pyarrow as pa

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 3, 500).astype(str),
            "v": rng.uniform(0, 100, 500).round(2),
            "w": rng.uniform(0, 10, 500).round(2),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False)

    def oracle(q_num, q_den):
        res = {}
        for g, sub in df.groupby("g"):
            vc = (sub["v"] * 100).round().astype(np.int64)
            wc = (sub["w"] * 100).round().astype(np.int64)
            agg = pd.DataFrame({"v": vc, "w": wc}).groupby("v")["w"].sum().sort_index()
            cw = agg.cumsum()
            tot = int(cw.iloc[-1])
            res[g] = int(cw.index[(cw * q_den >= q_num * tot).argmax()])
        return res

    for q_num, q_den in ((1, 2), (3, 4)):
        a = (
            zonal.grouped_weighted_quantile(
                rd.from_arrow(t), ["g"], "v", "w", q_num, q_den
            )
            .to_pandas()
            .set_index("g")["wq_c"]
            .to_dict()
        )
        b = (
            zonal.grouped_weighted_quantile(
                rd.from_arrow(t).repartition(9), ["g"], "v", "w", q_num, q_den
            )
            .to_pandas()
            .set_index("g")["wq_c"]
            .to_dict()
        )
        want = oracle(q_num, q_den)
        assert a == want
        assert b == want


def test_compact_cells_invariants(ray_session, synth_small):
    """Uncompacting the cover reproduces EXACTLY the occupied set;
    the cover is minimal (no complete sibling quad survives at any
    level) and disjoint (no cell is an ancestor of another)."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import spans, zonal
    from kaza_lcms_ray.state.cells import CELL_LEVEL

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    occ = np.unique(
        zonal.zonal_sums(geo, keys=("cell_id",), bands=())
        .to_pandas()["cell_id"]
        .to_numpy(np.int64)
    )
    out = zonal.compact_cells(geo).to_pandas()
    assert len(out) > 0
    # some compaction actually happened
    assert (out["level"] < CELL_LEVEL).any()

    # uncompact: expand every (cell, level) to its CELL_LEVEL descendants
    expanded = []
    for cid, lvl in zip(out["cell_id"].to_numpy(np.int64), out["level"]):
        k = int(CELL_LEVEL - lvl)
        base = cid << np.int64(2 * k)
        expanded.append(base + np.arange(4**k, dtype=np.int64))
    got = np.sort(np.concatenate(expanded))
    assert got.shape == occ.shape and (got == occ).all()

    # minimality: no level has a complete sibling quad
    for lvl, grp in out.groupby("level"):
        ids = grp["cell_id"].to_numpy(np.int64)
        _, cnt = np.unique(ids >> 2, return_counts=True)
        assert (cnt < 4).all()


def test_geodesic_dist_bfs_properties(synth_small, ray_session):
    """Sources are dist 0; every reached cell at d>0 has a passable rook
    neighbor at d-1; obstacles are -1; BFS respects obstacles (a Python
    replay over the collected cell table agrees exactly)."""
    from kaza_lcms_ray.state import cells as C

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    got = (
        zonal.geodesic_dist(geo)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    assert (got.loc[got["passable"] == 0, "dist"] == -1).all()
    ids = got["cell_id"].to_numpy(np.int64)
    dist = got["dist"].to_numpy(np.int64)
    passable = got["passable"].to_numpy(np.int64).astype(bool)
    pos_of = {int(c): i for i, c in enumerate(ids)}
    ix, iy = C.decode(ids, C.CELL_LEVEL)
    reached = np.flatnonzero(passable & (dist > 0))
    assert len(reached) > 0 and (dist == 0).sum() > 0
    for i in reached[:200]:
        best = None
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            j = pos_of.get(int(C.morton(
                np.array([ix[i] + dx]), np.array([iy[i] + dy]))[0]))
            if j is not None and passable[j] and dist[j] >= 0:
                best = dist[j] if best is None else min(best, dist[j])
        assert best is not None and dist[i] == best + 1


def test_medoid_composite_bruteforce(synth_small, ray_session):
    """Winner per cell equals a per-cell brute force of the pinned rule
    (rank-ceil(n/2) medians, integer squared distance, (d2, doc, span)
    tiebreak); repartition-invariant."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import spans as spans_mod
    from kaza_lcms_ray.stages import zonal

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans_mod.geo_obs(docs)
    out = (
        zonal.medoid_composite(geo)
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    out2 = (
        zonal.medoid_composite(spans_mod.geo_obs(docs.repartition(5)))
        .to_pandas()
        .sort_values("cell_id")
        .reset_index(drop=True)
    )
    assert out.equals(out2)
    g = geo.to_pandas()
    rng = np.random.default_rng(1)
    cells = rng.choice(g["cell_id"].unique(), size=30, replace=False)
    for cid in cells:
        d = g[g["cell_id"] == cid]
        V = d[[f"c{b}" for b in range(6)]].to_numpy(np.int64)
        med = np.array(
            [np.sort(V[:, b])[(len(d) + 1) // 2 - 1] for b in range(6)]
        )
        d2 = ((V - med) ** 2).sum(axis=1)
        frame = d.assign(d2=d2).sort_values(
            ["d2", "doc_id", "span_idx"], kind="mergesort"
        )
        want = frame.iloc[0]
        got = out[out["cell_id"] == int(cid)].iloc[0]
        assert got["doc_id"] == want["doc_id"]
        assert got["span_idx"] == want["span_idx"]


def test_emerging_hotspots_hand_case(ray_session):
    """Planted space-time dynamics on a 10×10 occupied block: one cell
    whose value explodes only in the last year must classify new_hot (a
    single spike needs n ≫ w to clear z=1.96: max z = (n−w)/(√n·√((nw−w²)/
    (n−1))) ≈ 3.2 at n=100, w=9); background cells far from it stay
    'none'; every (n_hot, category) pair obeys the CASE chain."""
    from kaza_lcms_ray.state.cells import CELL_LEVEL, morton

    rows = []
    hot_xy = (12, 12)
    for year in (2020, 2021, 2022):
        for x in range(10, 20):
            for y in range(10, 20):
                v = 100
                if (x, y) == hot_xy and year == 2022:
                    v = 100_000  # last-year spike → new_hot at the center
                rows.append(
                    {
                        "cell_id": int(morton(np.array([x]), np.array([y]))[0]),
                        "year": year,
                        "c3": v,
                    }
                )
    geo = rd.from_pandas(pd.DataFrame(rows))
    got = (
        zonal.emerging_hotspots(geo, band=3, k=1)
        .to_pandas()
        .set_index("cell_id")
        .sort_index()
    )
    hot_cell = int(morton(np.array([hot_xy[0]]), np.array([hot_xy[1]]))[0])
    assert got.loc[hot_cell, "category"] == "new_hot"
    assert got.loc[hot_cell, "n_hot"] == 1
    assert got.loc[hot_cell, "hot_last"] == 1
    # a corner cell, not adjacent to the spike: never hot, never cold
    corner = int(morton(np.array([10]), np.array([10]))[0])
    assert got.loc[corner, "category"] == "none"
    # 2020/2021 are constant-valued → zero variance → z undefined → only
    # 2022 contributes (the den > 0 exclusion rule)
    assert (got["n_years"] == 1).all()
    # rule coherence: any *_hot category requires n_hot ≥ 1, 'none' requires 0
    hot_cats = got["category"].str.endswith("_hot")
    assert (got.loc[hot_cats, "n_hot"] >= 1).all()
    assert (got.loc[got["category"] == "none", "n_hot"] == 0).all()
    assert (got.loc[got["category"] == "none", "n_cold"] == 0).all()


def test_emerging_hotspots_single_cell_year_excluded(ray_session):
    """A year with exactly one occupied cell carries zero variance and is
    excluded: a series that only exists in such years yields no output."""
    from kaza_lcms_ray.state.cells import morton

    cid = int(morton(np.array([5]), np.array([5]))[0])
    geo = rd.from_pandas(
        pd.DataFrame(
            [{"cell_id": cid, "year": 2020, "c3": 100},
             {"cell_id": cid, "year": 2021, "c3": 200}]
        )
    )
    got = zonal.emerging_hotspots(geo, band=3, k=1).to_pandas()
    assert len(got) == 0


def test_focal_median_brute_force(synth_small, ray_session):
    """focal_median vs a direct numpy replay on the sf0.001 cell table:
    lower median of the 3x3 occupied-neighbor cent totals."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import spans, zonal
    from kaza_lcms_ray.state.cells import CELL_LEVEL, decode, morton

    geo = spans.geo_obs(rd.read_parquet(f"{synth_small}/documents"))
    cells = zonal.zonal_sums(geo, keys=["cell_id"], bands=(3,)).to_pandas()
    got = zonal.focal_median(
        spans.geo_obs(rd.read_parquet(f"{synth_small}/documents")), band=3, k=1
    ).to_pandas()
    cid = cells["cell_id"].to_numpy(np.int64)
    val = cells["s_c3"].to_numpy(np.int64)
    lut = dict(zip(cid.tolist(), val.tolist()))
    ix, iy = decode(cid, CELL_LEVEL)
    hi = (1 << CELL_LEVEL) - 1
    exp = {}
    for j, c in enumerate(cid.tolist()):
        vals = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tx, ty = int(ix[j]) + dx, int(iy[j]) + dy
                if 0 <= tx <= hi and 0 <= ty <= hi:
                    nb = int(morton(np.array([tx]), np.array([ty]))[0])
                    if nb in lut:
                        vals.append(lut[nb])
        vals.sort()
        exp[c] = (len(vals), vals[(len(vals) - 1) // 2])
    got_d = {
        int(r.cell_id): (int(r.nbr_n), int(r.med_cents)) for r in got.itertuples()
    }
    assert got_d == exp
    assert (got["med_b3"].to_numpy() == got["med_cents"].to_numpy() / 100.0).all()
    # reshard invariance
    got2 = zonal.focal_median(
        spans.geo_obs(rd.read_parquet(f"{synth_small}/documents")).repartition(7),
        band=3,
        k=1,
    ).to_pandas()
    key = ["cell_id"]
    assert (
        got.sort_values(key).reset_index(drop=True)
        .equals(got2.sort_values(key).reset_index(drop=True))
    )


def test_bivariate_moran_self_equals_univariate(synth_small, ray_session):
    """I_xx (band 3 vs itself) must equal univariate Moran's I exactly:
    identical num/den quantized sums."""
    import ray.data as rd

    from kaza_lcms_ray.stages import spans, zonal

    def geo():
        return spans.geo_obs(rd.read_parquet(f"{synth_small}/documents"))

    bi = zonal.morans_bivariate(geo(), band_x=3, band_y=3, k=1).to_pandas()
    uni = zonal.morans_i(geo(), band=3, k=1).to_pandas()
    assert bi["num_q"].iloc[0] == uni["num_q"].iloc[0]
    assert bi["denx_q"].iloc[0] == bi["deny_q"].iloc[0] == uni["den_q"].iloc[0]
    assert bi["w_pairs"].iloc[0] == uni["w_pairs"].iloc[0]
    assert bi["bimoran"].iloc[0] != 0.0
    # cross-band value is a different statistic
    x34 = zonal.morans_bivariate(geo(), band_x=3, band_y=4, k=1).to_pandas()
    assert x34["bimoran"].iloc[0] != bi["bimoran"].iloc[0]


def test_change_year_brute_force(synth_small, ray_session):
    """change_year vs a direct pandas replay of n*S_k on the (cell,
    year) totals: same peak, earliest-year ties, year-after rule."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import spans, zonal

    def geo():
        return spans.geo_obs(rd.read_parquet(f"{synth_small}/documents"))

    got = zonal.change_year(geo(), band=3).to_pandas().set_index("cell_id")
    cy = (
        zonal.zonal_sums(geo(), keys=["cell_id", "year"], bands=(3,))
        .to_pandas()
        .sort_values(["cell_id", "year"])
    )
    n_checked = 0
    for cid, g in cy.groupby("cell_id"):
        x = g["s_c3"].to_numpy(np.int64)
        yr = g["year"].to_numpy(np.int64)
        n = len(x)
        if n < 2:
            assert cid not in got.index
            continue
        tot = x.sum()
        best = None
        for k in range(1, n):
            mag = abs(n * x[:k].sum() - k * tot)
            if best is None or mag > best[0]:
                best = (mag, yr[k])
        assert got.loc[cid, "peak_q"] == best[0]
        assert got.loc[cid, "change_year"] == best[1]
        assert got.loc[cid, "n_years"] == n
        n_checked += 1
    assert n_checked > 100


def test_band_corr_vs_numpy(synth_small, ray_session):
    """band_corr vs np.corrcoef on the raw cent columns (tolerance-based
    cross-check; the pinned chain itself is certified by the gate)."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import spans, zonal

    geo = spans.geo_obs(rd.read_parquet(f"{synth_small}/documents"))
    out = zonal.band_corr(
        spans.geo_obs(rd.read_parquet(f"{synth_small}/documents"))
    ).to_pandas()
    df = geo.select_columns([f"c{b}" for b in range(6)]).to_pandas()
    C = np.corrcoef(df.to_numpy(np.float64).T)
    assert len(out) == 15
    for r in out.itertuples():
        assert abs(r.r - C[int(r.band_a), int(r.band_b)]) < 1e-9
