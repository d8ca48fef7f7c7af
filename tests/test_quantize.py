"""int8 embedding quantization: bounds, reconstruction error, SQL replay."""

import duckdb
import numpy as np
import pyarrow as pa

from kaza_lcms_ray.stages import ann


def test_quantize_embeddings(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(3)
    vecs = rng.randn(50, 16).astype(np.float32)
    vecs[7] = 0.0  # all-zero vector edge case
    lists = [list(v) for v in vecs]
    lists[-1] = []  # trailing EMPTY list (reduceat edge case)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(50, dtype=np.int64)),
            "embedding": pa.array(lists, type=pa.list_(pa.float32())),
        }
    )
    out = (
        ann.quantize_embeddings(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values(["vec_id", "dim"])
        .reset_index(drop=True)
    )
    assert len(out) == 49 * 16  # empty vector emits no rows
    assert out["code"].abs().max() <= 127
    z = out[out["vec_id"] == 7]
    assert (z["code"] == 0).all() and (z["scale"] == 0.0).all()

    # reconstruction error bounded by scale/2 per element
    nz = out[out["vec_id"] != 7]
    recon = nz["code"].to_numpy() * nz["scale"].to_numpy()
    orig = np.delete(vecs, [7, 49], axis=0).astype(np.float64).ravel()
    assert np.abs(recon - orig).max() <= nz["scale"].max() / 2 + 1e-12

    con = duckdb.connect()
    con.register("emb_t", tbl)
    want = (
        con.execute(
            ann.quantize_embeddings_sql("SELECT vec_id, embedding FROM emb_t")
        )
        .df()
        .sort_values(["vec_id", "dim"])
        .reset_index(drop=True)
    )
    for c in ("vec_id", "dim", "code"):
        np.testing.assert_array_equal(
            out[c].to_numpy(np.int64), want[c].to_numpy(np.int64), err_msg=c
        )
    np.testing.assert_array_equal(out["scale"].to_numpy(), want["scale"].to_numpy())


def test_gram_quantized_matches_bruteforce(ray_session):
    """Distributed Σ codeᵀcode equals the single-matrix numpy product, and
    is invariant to block composition (exact integer partials)."""
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import ann

    rng = np.random.RandomState(7)
    raw = rng.randn(300, 16).astype(np.float32)
    raw[17] = 0.0  # zero vector: scale 0 -> all-zero codes
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(300, dtype=np.int64)),
            "embedding": pa.array(list(raw), type=pa.list_(pa.float32())),
        }
    )
    mat = raw.astype(np.float64)
    scale = (np.abs(mat).max(axis=1) / 127.0)[:, None]
    code = np.where(scale > 0, np.floor(mat / scale + 0.5), 0.0).astype(np.int64)
    g = code.T @ code
    for nblocks in (1, 7):
        ds = rd.from_arrow(t).repartition(nblocks)
        got = ann.gram_quantized(ds).to_pandas().sort_values(["i", "j"])
        d = mat.shape[1]
        iu, ju = np.triu_indices(d)
        assert len(got) == len(iu)
        assert (got["s"].to_numpy() == g[iu, ju]).all()


def test_pca_project_matches_numpy(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import ann

    rng = np.random.RandomState(19)
    # anisotropic cloud so eigenvalues are well separated
    raw = (rng.randn(400, 12) * np.linspace(8, 0.5, 12)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(400, dtype=np.int64)),
            "embedding": pa.array(list(raw), type=pa.list_(pa.float32())),
        }
    )
    mat = raw.astype(np.float64)
    scale = (np.abs(mat).max(axis=1) / 127.0)[:, None]
    code = np.where(scale > 0, np.floor(mat / scale + 0.5), 0.0)
    mu = code.mean(axis=0)
    C = (code - mu).T @ (code - mu) / code.shape[0]
    w, v = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:4]
    comps = v[:, order]
    flip = np.abs(comps).argmax(axis=0)
    comps = comps * np.sign(comps[flip, np.arange(4)])
    want = (code - mu) @ comps
    for nblocks in (1, 6):
        ds = rd.from_arrow(t).repartition(nblocks)
        got = (
            ann.pca_project(ds, k=4)
            .to_pandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        gm = got[[f"pc{c}" for c in range(4)]].to_numpy()
        assert np.allclose(gm, want, atol=1e-8)
    # variance ordering: pc0 carries the most variance
    var = gm.var(axis=0)
    assert (np.diff(var) <= 1e-9).all()


def test_hard_negatives_excludes_same_label_and_matches_bruteforce(ray_session):
    """The mined negative is the brute-force argmax cosine among
    different-label vectors; the query's own label never appears."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import ann

    rng = np.random.default_rng(7)
    n, d = 60, 8
    mat = rng.normal(size=(n, d))
    labels = (np.arange(n) % 3).astype(np.int32)
    emb = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [row.astype(np.float32).tolist() for row in mat],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels),
            }
        )
    )
    out = (
        ann.hard_negatives(emb, k=1, rows_per_block=16)
        .to_pandas()
        .set_index("qid")
        .sort_index()
    )
    # brute force with the engine's own float32->normalized float path
    m = mat.astype(np.float32).astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    for q in range(n):
        s = sims[q].copy()
        s[labels == labels[q]] = -2.0
        best = np.lexsort((np.arange(n), -s))[0]
        assert out.loc[q, "nid"] == best
        assert labels[out.loc[q, "nid"]] != labels[q]


def test_embed_profile_matches_numpy(ray_session):
    """Per-dim n/min/max/mean agree with a dense numpy computation; the
    quantized mean is within one quantum; reshard-invariant."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages.ann import EMBED_PROFILE_SCALE, embed_profile

    rng = np.random.default_rng(5)
    M = rng.standard_normal((300, 8)).astype(np.float32)
    tbl = pa.table(
        {"embedding": pa.array(list(M), pa.list_(pa.float32()))}
    )
    out = (
        embed_profile(rd.from_arrow(tbl).repartition(4))
        .to_pandas().sort_values("dim").reset_index(drop=True)
    )
    assert out["n"].tolist() == [300] * 8
    Md = M.astype(np.float64)
    assert np.array_equal(out["mn"].to_numpy(), Md.min(axis=0))
    assert np.array_equal(out["mx"].to_numpy(), Md.max(axis=0))
    assert np.allclose(
        out["mean"].to_numpy(), Md.mean(axis=0),
        atol=1.0 / EMBED_PROFILE_SCALE,
    )
    out2 = (
        embed_profile(rd.from_arrow(tbl))
        .to_pandas().sort_values("dim").reset_index(drop=True)
    )
    assert out.equals(out2)
