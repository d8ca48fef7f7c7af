"""Distributed k-means + IVF-flat search (stages/cluster.py)."""

import numpy as np
import pandas as pd

import ray.data as rd

from kaza_lcms_ray.stages import ann, cluster


def _corpus(n=120, d=16, seed=3):
    from kaza_lcms_ray.state.hashing import hash_unit

    mat = hash_unit(seed, "cl", np.arange(n * d)).reshape(n, d) - 0.5
    return pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(mat)}
    ), mat


def test_kmeans_partitioning_invariant(ray_session):
    df, _ = _corpus()
    a1 = (
        cluster.kmeans(rd.from_pandas(df).repartition(1), k=4, iters=2)[1]
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    a7 = (
        cluster.kmeans(rd.from_pandas(df).repartition(7), k=4, iters=2)[1]
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a1, a7)
    assert set(a1["cluster"]).issubset(set(range(1, 5)))
    assert a1["cluster"].nunique() > 1  # spread vectors land in >1 cell


def test_kmeans_improves_inertia(ray_session):
    """Each Lloyd iteration must not increase total within-cluster cost."""
    df, mat = _corpus()
    ds = rd.from_pandas(df).repartition(3)
    q = cluster.quantize(mat.astype(np.float64))

    def inertia(iters):
        cent, assign = cluster.kmeans(ds, k=4, iters=iters)
        a = assign.to_pandas().sort_values("vec_id")["cluster"].to_numpy() - 1
        return float(((q - cent[a]) ** 2).sum())

    i0, i2 = inertia(0), inertia(2)
    assert i2 <= i0


def test_ivf_topk_self_and_recall(ray_session):
    df, mat = _corpus()
    ds = rd.from_pandas(df).repartition(4)
    qids = np.arange(5, dtype=np.int64)
    qmat = mat[:5].astype(np.float64)
    got = (
        cluster.ivf_topk(ds, qids, qmat, k_neighbors=3, n_clusters=4, nprobe=2)
        .to_pandas()
        .sort_values(["qid", "rank"])
        .reset_index(drop=True)
    )
    # each query's own cell is its top probe -> rank-1 hit is itself (d=0)
    r1 = got[got["rank"] == 1]
    assert (r1["vec_id"].to_numpy() == r1["qid"].to_numpy()).all()
    # nprobe = n_clusters == exact: matches brute-force integer-L2 top-k
    exact = (
        cluster.ivf_topk(ds, qids, qmat, k_neighbors=3, n_clusters=4, nprobe=4)
        .to_pandas()
    )
    q = cluster.quantize(qmat)
    qq = cluster.quantize(mat.astype(np.float64))
    for qi in qids:
        dd = ((qq - q[qi][None, :]) ** 2).sum(axis=1)
        want = np.lexsort((np.arange(len(dd)), dd))[:3]
        got_ids = (
            exact[exact["qid"] == qi].sort_values("rank")["vec_id"].to_numpy()
        )
        assert list(got_ids) == list(want)


def test_quantize_matches_sql_convention():
    """floor(v*2^20 + 0.5): half-up, negative-safe, float32-widen exact."""
    v = np.array([0.0, -0.5, 0.25, -1 / 3, 1 / 3], dtype=np.float32).astype(
        np.float64
    )
    q = cluster.quantize(v.reshape(1, -1))[0]
    want = np.floor(v * 1048576.0 + 0.5).astype(np.int64)
    assert (q == want).all()


def test_semdedup_brute_force_and_reshard(ray_session):
    """semdedup == the quantized rule applied brute-force per final
    cluster; identical under any input partitioning."""
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.RandomState(11)
    base = rng.uniform(-0.5, 0.5, size=(40, 8))
    # plant near-dup groups: rows 40..49 are tiny perturbations of rows 0..9
    dups = base[:10] + rng.uniform(-1e-3, 1e-3, size=(10, 8))
    mat = np.vstack([base, dups])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
            "embedding": pa.array(list(mat.astype(np.float32))),
        }
    )
    k, iters, seed, (tn, td) = 4, 2, 9, (7, 20)
    out = (
        cluster.semdedup(rd.from_arrow(tbl), k=k, iters=iters, tau=(tn, td), seed=seed)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # every planted duplicate of a same-cluster original must be dropped
    clus = dict(zip(out["vec_id"], out["cluster"]))
    keep = dict(zip(out["vec_id"], out["keep"]))
    for j in range(40, 50):
        if clus[j] == clus[j - 40]:
            assert keep[j] == 0

    # brute force: final centroids -> assignment -> quantized pair rule
    cent, assign = cluster.kmeans(
        rd.from_arrow(tbl), k=k, iters=iters, seed=seed
    )
    a = assign.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    q = np.floor(mat.astype(np.float64) * 1024.0 + 0.5).astype(np.int64)
    nn = (q * q).sum(axis=1)
    want_keep = np.ones(len(mat), dtype=np.int64)
    for j in range(len(mat)):
        for i in range(j):
            if a[i] != a[j]:
                continue
            dot = int(q[i] @ q[j])
            if dot > 0 and td * td * dot * dot >= tn * tn * int(nn[i]) * int(nn[j]):
                want_keep[j] = 0
                break
    assert list(out["keep"]) == list(want_keep)
    assert list(out["cluster"]) == list(a)

    out2 = (
        cluster.semdedup(
            rd.from_arrow(tbl).repartition(7), k=k, iters=iters, tau=(tn, td), seed=seed
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert out.equals(out2)


def test_pq_encode_reshard_invariant_and_in_range(ray_session):
    """PQ codes: 1..k_sub per subspace, identical under repartitioning
    (the training pass is a driver-combined integer reduce)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages.cluster import pq_encode, pq_train

    rng = np.random.RandomState(3)
    n, d, m, ks = 120, 16, 4, 4
    mat = rng.randn(n, d)
    ds = rd.from_arrow(
        pa.table({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(mat)})
    )
    c1 = pq_train(ds, m=m, k_sub=ks, iters=2)
    c2 = pq_train(ds.repartition(7), m=m, k_sub=ks, iters=2)
    assert (c1 == c2).all() and c1.shape == (m, ks, d // m)
    codes = pq_encode(ds, c1).to_pandas().sort_values("vec_id")
    for s in range(m):
        assert codes[f"code{s}"].between(1, ks).all()
    codes2 = pq_encode(ds.repartition(5), c1).to_pandas().sort_values("vec_id")
    assert (codes.to_numpy() == codes2.to_numpy()).all()


def test_pq_topk_matches_brute_force_adc(ray_session):
    """pq_topk equals the brute-force ADC ranking (same codebooks, same
    integer distance tables, (dist, id) order) computed in numpy."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages.cluster import pq_encode, pq_topk, pq_train, quantize

    rng = np.random.RandomState(11)
    n, d, m, ks, k = 90, 16, 4, 4, 5
    mat = rng.randn(n, d)
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"vec_id": ids, "embedding": list(mat)}))
    qids, qmat = ids[:3], mat[:3]

    out = (
        pq_topk(ds, qids, qmat, k_neighbors=k, m=m, k_sub=ks, iters=2)
        .to_pandas()
        .sort_values(["qid", "rank"])
    )

    cents = pq_train(ds, m=m, k_sub=ks, iters=2)
    dsub = d // m
    codes = (
        pq_encode(ds, cents)
        .to_pandas()
        .sort_values("vec_id")[[f"code{s}" for s in range(m)]]
        .to_numpy()
        - 1
    )
    qq = quantize(qmat).reshape(-1, m, dsub)
    dt = ((qq[:, :, None, :] - cents[None]) ** 2).sum(axis=3)
    for qi, qid in enumerate(qids):
        dist = np.zeros(n, np.int64)
        for s in range(m):
            dist += dt[qi, s][codes[:, s]]
        expect = ids[np.lexsort((ids, dist))[:k]]
        got = out[out["qid"] == qid].sort_values("rank")["vec_id"].to_numpy()
        assert (got == expect).all()


def test_ivf_nprobe_full_is_exact(ray_session):
    """nprobe = n_clusters scans every cell, so IVF equals brute-force
    integer-L2 top-k — the exactness premise of the recall harness."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages.cluster import ivf_topk, quantize

    rng = np.random.RandomState(4)
    n, d, k = 80, 8, 5
    mat = rng.randn(n, d)
    ids = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"vec_id": ids, "embedding": list(mat)}))
    qids, qmat = ids[:3], mat[:3]
    out = (
        ivf_topk(ds, qids, qmat, k_neighbors=k, n_clusters=4, nprobe=4, iters=1)
        .to_pandas()
        .sort_values(["qid", "rank"])
    )
    q = quantize(qmat)
    c = quantize(mat)
    for qi, qid in enumerate(qids):
        dist = ((c - q[qi][None, :]) ** 2).sum(axis=1)
        expect = ids[np.lexsort((ids, dist))[:k]]
        got = out[out["qid"] == qid].sort_values("rank")["vec_id"].to_numpy()
        assert (got == expect).all()


def _dbscan_brute(ids, xs, ys, eps, min_pts):
    import numpy as np

    n = len(ids)
    dx = xs[:, None] - xs[None, :]
    dy = ys[:, None] - ys[None, :]
    close = (dx * dx + dy * dy) <= eps * eps
    np.fill_diagonal(close, False)
    cnt = close.sum(1)
    core = cnt >= min_pts
    # components over core-core edges, label = min id
    parent = {i: i for i in range(n) if core[i]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        if not core[i]:
            continue
        for j in range(i + 1, n):
            if core[j] and close[i, j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    # min ID STRING per component
    comp_members: dict = {}
    for i in range(n):
        if core[i]:
            comp_members.setdefault(find(i), []).append(i)
    lab = {}
    for root, members in comp_members.items():
        m = min(ids[i] for i in members)
        for i in members:
            lab[i] = m
    out = {}
    for i in range(n):
        if core[i]:
            out[ids[i]] = (lab[i], 1)
        else:
            cores_near = [lab[j] for j in range(n) if core[j] and close[i, j]]
            out[ids[i]] = (min(cores_near) if cores_near else "", 0)
    return out


def test_dbscan_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import cluster as cl

    rng = np.random.default_rng(9)
    # two dense blobs straddling grid-cell boundaries + sprinkled noise
    n1, n2, nn = 40, 30, 25
    xs = np.concatenate(
        [
            rng.normal(20.0, 0.01, n1),      # near a cell corner
            rng.normal(20.35, 0.012, n2),
            rng.uniform(19.5, 21.0, nn),
        ]
    )
    ys = np.concatenate(
        [
            rng.normal(-15.0, 0.01, n1),
            rng.normal(-15.2, 0.012, n2),
            rng.uniform(-15.8, -14.5, nn),
        ]
    )
    n = len(xs)
    df = pd.DataFrame(
        {
            "doc_id": [f"d{i:04d}" for i in range(n)],
            "span_idx": np.zeros(n, np.int32),
            "lon": xs,
            "lat": ys,
        }
    )
    eps, min_pts = 0.05, 5
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = cl.dbscan(ds, eps=eps, min_pts=min_pts).to_pandas()
    got = {r.id: (r.label, r.is_core) for r in out.itertuples()}
    ids = np.array([f"d{i:04d}#0" for i in range(n)])
    want = _dbscan_brute(ids, xs, ys, eps, min_pts)
    assert got == want
    # reshard invariance
    out2 = (
        cl.dbscan(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(6),
            eps=eps,
            min_pts=min_pts,
        )
        .to_pandas()
    )
    got2 = {r.id: (r.label, r.is_core) for r in out2.itertuples()}
    assert got2 == want


def test_silhouette_two_blobs(ray_session):
    """Two tight, well-separated 1-D blobs with k=2: every point's own
    distance is tiny vs the cross distance, so mean_s -> near 1 for both
    clusters; the quantized chain is replayed for one hand point."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import cluster

    vecs = [[0.0, 0.01], [0.0, -0.01], [0.0, 0.0], [1.0, 0.01],
            [1.0, -0.01], [1.0, 0.0]]
    df = pd.DataFrame(
        {
            "vec_id": np.arange(6, dtype=np.int64),
            "embedding": [np.array(v, np.float32) for v in vecs],
        }
    )
    out = cluster.silhouette(rd.from_pandas(df), k=2, iters=2).to_pandas()
    assert out["n"].sum() == 6
    # independent numpy replay from the SAME kmeans outputs
    cent, _ = cluster.kmeans(rd.from_pandas(df), k=2, iters=2)
    q = cluster.quantize(np.array(vecs, np.float64))
    d2 = (
        (q * q).sum(1)[:, None] - 2 * (q @ cent.T) + (cent * cent).sum(1)[None, :]
    )
    own = np.argmin(-2 * (q @ cent.T) + (cent * cent).sum(1)[None, :], axis=1)
    rows = np.arange(6)
    a2 = d2[rows, own]
    m = d2.copy()
    m[rows, own] = np.iinfo(np.int64).max
    b2 = m.min(1)
    sa, sb = np.sqrt(a2.astype(float)), np.sqrt(b2.astype(float))
    den = np.maximum(sa, sb)
    sq = np.floor(
        np.where(den == 0.0, 0.0, (sb - sa) / np.where(den == 0.0, 1.0, den))
        * cluster.SIL_SCALE
    ).astype(np.int64)
    exp = {}
    for c in np.unique(own):
        msk = own == c
        exp[int(c) + 1] = (int(msk.sum()), int(sq[msk].sum()))
    got = {int(r.cluster): (int(r.n), int(r.s_q_sum)) for r in out.itertuples()}
    assert got == exp
    for r in out.itertuples():
        assert r.mean_s == r.s_q_sum / cluster.SIL_SCALE / r.n
    # reshard invariance
    out2 = cluster.silhouette(
        rd.from_pandas(df).repartition(3), k=2, iters=2
    ).to_pandas()
    assert out.equals(out2)


def test_label_separation_hand(ray_session):
    """Two labels at (0,...) and (1, 0...): centroid distance in the
    quantized space is exactly QSCALE on the first dim."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import cluster

    df = pd.DataFrame(
        {
            "vec_id": np.arange(4, dtype=np.int64),
            "embedding": [
                np.array([0.0, 0.0], np.float32),
                np.array([0.0, 0.0], np.float32),
                np.array([1.0, 0.0], np.float32),
                np.array([1.0, 0.0], np.float32),
            ],
            "label": np.array([1, 1, 2, 2], np.int32),
        }
    )
    out = cluster.label_separation(rd.from_pandas(df)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    Q = int(cluster.QSCALE)
    assert (r["label_a"], r["label_b"]) == (1, 2)
    assert r["d2"] == Q * Q
    assert r["dist"] == float(Q)
    out2 = cluster.label_separation(rd.from_pandas(df).repartition(3)).to_pandas()
    assert out.equals(out2)
