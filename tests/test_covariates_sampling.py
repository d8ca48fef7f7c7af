"""Covariate kernels vs hand formulas; sampling/split/near-dedup semantics."""

import numpy as np
import pyarrow as pa

from kaza_lcms_ray.config import ALL_INDICES, PipelineConfig
from kaza_lcms_ray.stages import covariates, sampling


def _batch(n=100, seed=9):
    from kaza_lcms_ray.state.hashing import hash_unit

    cols = {}
    for i in range(6):
        cols[f"b{i}"] = pa.array(hash_unit(seed, f"b{i}", np.arange(n)) * 10000.0)
    return pa.table(cols)


def test_all_indices_compute_and_match_formulas():
    cfg = PipelineConfig(indices=tuple(ALL_INDICES), add_tassel_cap=True)
    t = _batch()
    out = covariates.covariates_batch(t, cfg)
    s = cfg.scale_factor
    blue = t.column("b0").to_numpy() * s
    green = t.column("b1").to_numpy() * s
    red = t.column("b2").to_numpy() * s
    nir = t.column("b3").to_numpy() * s
    swir1 = t.column("b4").to_numpy() * s
    ndvi = out.column("ND_nir_red").to_numpy()
    assert np.allclose(ndvi, (nir - red) / (nir + red), rtol=0, atol=0)
    evi = out.column("EVI").to_numpy()
    assert np.allclose(evi, 2.5 * ((nir - red) / (nir + 6 * red - 7.5 * blue + 1)))
    savi = out.column("SAVI").to_numpy()
    assert np.allclose(savi, (nir - red) * 1.5 / (nir + red + 0.5))
    # tasseled cap brightness = first TC row dot bands
    x = np.stack([blue, green, red, nir, swir1, t.column("b5").to_numpy() * s], axis=1)
    br = x @ covariates.TC_COEF[0]
    assert np.allclose(out.column("brightness").to_numpy(), br)
    assert (out.column("tcDistBG").to_numpy() >= 0).all()
    # config validation
    try:
        PipelineConfig(indices=("NOPE",))
        assert False
    except ValueError:
        pass


def test_feature_names_cover_outputs():
    cfg = PipelineConfig(indices=("EVI", "SAVI", "IBI"), add_tassel_cap=True)
    out = covariates.covariates_batch(_batch(), cfg)
    for name in covariates.feature_names(cfg):
        assert name in out.schema.names, name


def test_split_deterministic_across_parallelism(synth_small, ray_session):
    import ray.data as rd

    from kaza_lcms_ray.stages import spans

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs).select_columns(["doc_id", "span_idx"])
    tr1, te1 = sampling.split_train_test(geo, ["doc_id", "span_idx"])
    tr2, te2 = sampling.split_train_test(geo.repartition(7), ["doc_id", "span_idx"])
    a = set(map(tuple, tr1.to_pandas()[["doc_id", "span_idx"]].to_numpy()))
    b = set(map(tuple, tr2.to_pandas()[["doc_id", "span_idx"]].to_numpy()))
    assert a == b  # identical membership under different partitioning
    n_tr, n_te = len(a), te1.count()
    assert abs(n_tr / (n_tr + n_te) - 0.8) < 0.02


def test_spatial_near_dedup_matches_reference_greedy(ray_session):
    """Engine near-dedup vs a brute-force replay of the reference's iterate
    semantics (src/utils/sampling.py:37-49)."""
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.state.hashing import hash_unit

    n = 500
    lon = 20 + hash_unit(3, "x", np.arange(n)) * 2.0
    lat = -20 + hash_unit(3, "y", np.arange(n)) * 2.0
    ids = np.array([f"p{i:04d}" for i in range(n)], dtype=object)
    dist = 0.05
    ds = rd.from_pandas(pd.DataFrame({"pid": ids, "lon": lon, "lat": lat}))
    dropped, pairs = sampling.spatial_near_dedup(ds, "pid", dist)

    # oracle: EE iterate replay — process features in id order, accumulate
    # neighbor ids of not-yet-listed features
    d2 = (lon[:, None] - lon[None, :]) ** 2 + (lat[:, None] - lat[None, :]) ** 2
    np.fill_diagonal(d2, np.inf)
    listed: set = set()
    for i in range(n):  # ids are already in sorted order
        if ids[i] in listed:
            continue
        nbrs = np.nonzero(d2[i] <= dist * dist)[0]
        listed.update(ids[j] for j in nbrs)
    assert dropped == listed
    assert len(dropped) > 0  # fixture dense enough to have collisions


def test_random_points_in_polygons_deterministic():
    from kaza_lcms_ray import synth

    ids, kinds, lc, rings = synth.make_polygons()
    polys = [
        (ids[i], int(lc[i]), rings[i])
        for i in range(len(ids))
        if kinds[i] == "reference"
    ][:10]
    a = sampling.random_points_in_polygons(polys, 5)
    b = sampling.random_points_in_polygons(polys, 5)
    assert a.equals(b)
    assert len(a) == 50
    # all points actually inside their polygon
    from kaza_lcms_ray.state.geom import points_in_polygon

    by_poly = {p[0]: p[2] for p in polys}
    for r in a.itertuples():
        assert points_in_polygon(
            np.array([r.lon]), np.array([r.lat]), by_poly[r.poly_id]
        )[0]


def test_spatial_near_dedup_pair_guard(ray_session):
    """A pathologically dense point set must refuse clearly instead of
    collecting an unbounded pair list to the driver."""
    import pandas as pd
    import pytest
    import ray.data as rd

    pts = pd.DataFrame(
        {
            "plot_id": [f"p{i:03d}" for i in range(200)],
            "lon": np.full(200, 23.0),
            "lat": np.full(200, -18.0),
        }
    )
    with pytest.raises(ValueError, match="max_pairs"):
        sampling.spatial_near_dedup(
            rd.from_pandas(pts), "plot_id", 0.01, max_pairs=1000
        )


def test_read_documents_block_rule(synth_small, ray_session):
    """blocks = min(max(2xCPUs, one per file), ceil(bytes/1MiB)): small
    inputs never splinter past their bytes, large inputs split for
    occupancy, many-file inputs never merge files into oversized blocks."""
    import glob
    import math

    from kaza_lcms_ray.sources import storage
    from kaza_lcms_ray.sources.storage import _input_bytes

    files = sorted(glob.glob(f"{synth_small}/documents/part-*.parquet"))
    ds = storage.read_documents(f"{synth_small}/documents")
    import ray

    cpus = int(ray.cluster_resources()["CPU"])

    def rule(path):
        occupancy = max(2 * cpus, storage._n_files(path))
        return min(occupancy, max(1, math.ceil(_input_bytes(path) / (1 << 20))))

    assert ds.materialize().num_blocks() == rule(f"{synth_small}/documents")
    # a long file list follows the same rule (one block per file once the
    # bytes justify it; a tiny list never splinters)
    many = storage.read_documents(files * 40)
    assert many.materialize().num_blocks() == rule(files * 40)


def test_sample_k_uniform_reservoir(ray_session):
    """sample_k: k rows, reshard-invariant membership, and the sample IS
    the k smallest seeded priorities (brute-force replay)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.state.hashing import hash_key, hash_unit

    ids = np.arange(1000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "v": ids * 2}))
    out = sampling.sample_k(ds, ["doc_id"], 25).to_pandas()
    assert len(out) == 25
    # brute-force: priority = hash_unit(seed, tag, _row_key(id))
    rk = hash_key(np.zeros(1000, np.uint64), ids.astype(np.uint64))
    pri = hash_unit(sampling.DEFAULT_SEED, sampling.SAMPLE_TAG, rk)
    expect = set(ids[np.argsort(pri, kind="stable")[:25]].tolist())
    assert set(out["doc_id"]) == expect
    out2 = sampling.sample_k(ds.repartition(13), ["doc_id"], 25).to_pandas()
    assert set(out2["doc_id"]) == expect
    assert np.allclose(np.sort(out["priority"]), out["priority"])  # sorted


def test_kfold_disjoint_exhaustive_balanced(ray_session):
    """kfold_assign: every row gets exactly one fold in [0,k); folds are
    reshard-invariant and roughly balanced."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    ids = np.arange(5000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids}))
    f1 = sampling.kfold_assign(ds, ["doc_id"], 4).to_pandas().sort_values("doc_id")
    f2 = (
        sampling.kfold_assign(ds.repartition(11), ["doc_id"], 4)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert (f1["fold"].to_numpy() == f2["fold"].to_numpy()).all()
    assert set(f1["fold"]) == {0, 1, 2, 3}
    counts = f1["fold"].value_counts()
    assert counts.min() > 0.8 * counts.max()  # balanced within 20%


def test_weighted_sample_k_properties(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import sampling as S

    n = 2000
    # two strata: heavy rows (weight 100) vs light rows (weight 1)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "w": np.where(np.arange(n) % 2 == 0, 100, 1).astype(np.int64),
        }
    )
    outs = []
    for nblocks in (1, 8):
        got = (
            S.weighted_sample_k(
                rd.from_pandas(df).repartition(nblocks), ["doc_id"], "w", 200
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert len(got) == 200
        assert got["doc_id"].is_unique  # without replacement
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # reshard-invariant
    # heavy rows (100x weight) must dominate the sample
    heavy = (outs[0]["doc_id"] % 2 == 0).mean()
    assert heavy > 0.8


def test_poisson_bootstrap_weights_and_invariance(ray_session):
    """Weight stream is Poisson(1)-shaped (mean ~1, support 0..8), the
    replicate table is repartition-invariant, and the replicate spread
    approximates the analytic SE of the mean."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import sampling

    n = 20_000
    rng = np.random.default_rng(11)
    x = rng.integers(50, 5000, size=n).astype(np.int64)
    tbl = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "n_chars": pa.array(x)})
    ds = rd.from_arrow(tbl)
    out = (
        sampling.bootstrap_mean(ds, "n_chars")
        .to_pandas().sort_values("rep").reset_index(drop=True)
    )
    out2 = (
        sampling.bootstrap_mean(rd.from_arrow(tbl).repartition(7), "n_chars")
        .to_pandas().sort_values("rep").reset_index(drop=True)
    )
    assert out.equals(out2)
    assert len(out) == sampling.BOOT_REPS
    # Poisson(1): total weight per replicate ~ n ± ~3 sqrt(n)
    assert (np.abs(out["n_eff"].to_numpy() - n) < 5 * np.sqrt(n)).all()
    # replicate spread vs analytic SE (very loose band: 32 reps)
    se_boot = out["mean_x"].std(ddof=1)
    se_true = x.std(ddof=1) / np.sqrt(n)
    assert 0.4 * se_true < se_boot < 2.5 * se_true
    # thresholds really are the Poisson(1) CDF
    import math

    cdf = 0.0
    pmf = math.exp(-1.0)
    for k, t in enumerate(sampling.POIS1_T):
        cdf += pmf
        assert t == int(math.floor(cdf * 2.0**53))
        pmf /= k + 1


def test_spatial_folds_checkerboard(synth_small, ray_session):
    """Folds are block-constant (all spans in one Morton block share a
    fold), interleave spatially (all k folds occur), and follow the
    (bx + by) mod k rule exactly."""
    import numpy as np
    import ray.data as rd

    from kaza_lcms_ray.stages import sampling, spans
    from kaza_lcms_ray.state.cells import CELL_LEVEL, decode

    geo = spans.geo_obs(rd.read_parquet(f"{synth_small}/documents"))
    out = sampling.spatial_folds(geo, k=5).to_pandas()
    cid = out["cell_id"].to_numpy(np.int64)
    ix, iy = decode(cid, CELL_LEVEL)
    expect = ((ix.astype(np.int64) >> 4) + (iy.astype(np.int64) >> 4)) % 5
    assert (out["fold"].to_numpy(np.int64) == expect).all()
    assert set(out["fold"]) == {0, 1, 2, 3, 4}
