"""Distributed k-means over an embedding column + IVF-flat top-k search.

The training-data-pipeline clustering / "IVF variant" scale path for
similarity search (ann.py holds the LSH variant).  Reference analog: the
per-class model/assemblage discipline of /root/reference/src/utils/
primitives.py (deterministic seeds, replayable artifacts) applied to
vector clustering.

Everything is EXACTLY replayable in SQL (the driver's correctness gate):

* coordinates are quantized to int64 (floor(v·2^20 + 0.5) — the repo's
  pinned half-up convention, identical doubles on both sides), so every
  distance is an exact integer and every argmin has a total order
  (distance asc, cluster asc);
* seeded init: the k vectors with the smallest (splitmix64(seed,'km',id),
  id) — the same hash_key chain state/sqlhash mirrors;
* centroid updates are floor(sum/n + 0.5) on exact int64 sums (empty
  cluster keeps its previous centroid);
* IVF probes rank clusters, and in-cluster candidates rank, by the same
  integer metric.

Scale shape: each Lloyd iteration is ONE streaming pass — a stateless
map_batches emits per-(batch, cluster) integer partial sums (k·B tiny
rows; the only thing that ever reaches the driver), centroids re-broadcast
per iteration.  Assignment / search are stateless map_batches with the
k×d int64 centroid matrix in the object store; the merge is the bucketed
grouped top-k from ann.py.  No shuffle anywhere but the final merge.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ..state.hashing import hash_key
from .ann import _embed_matrix

QSCALE = 1 << 20  # |q| ≤ ~2^21 ⇒ d·diff² ≤ 2^48 at d=64: int64-safe


def quantize(mat: np.ndarray) -> np.ndarray:
    """float64 (n, d) → int64, floor(v·2^20 + 0.5) (half-up, SQL-identical)."""
    return np.floor(mat * float(QSCALE) + 0.5).astype(np.int64)


def _quantized_batch(batch: pa.Table, id_col: str, embed_col: str):
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    return ids, quantize(_embed_matrix(batch, embed_col))


def _assign(q: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Nearest centroid per row by exact integer L2; ties → lowest cid.

    argmin over (−2·q·cᵀ + ‖c‖²) — the ‖q‖² term is constant per row.
    Products ≤ d·2^42 ≪ 2^63, exact in int64."""
    scores = -2 * (q @ cent.T) + (cent * cent).sum(axis=1)[None, :]
    return np.argmin(scores, axis=1)  # first min = lowest cid


def seeded_init(ds, k: int, id_col: str, embed_col: str, seed: int) -> np.ndarray:
    """Initial centroids: the k vectors with the smallest
    (hash_key(seed,'km',id), id) — partitioning-invariant, SQL-replayable.
    Returns the quantized (k, d) int64 matrix (cluster i = rank-i vector,
    1-based in outputs)."""
    from .joins import top_k

    def add_rank(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        h = hash_key(seed, "km", ids.astype(np.int64))
        return t.append_column("_kmr", pa.array(h.astype(np.int64)))

    ranked = ds.select_columns([id_col, embed_col]).map_batches(
        add_rank, batch_format="pyarrow"
    )
    # int64 two's-complement order == uint64 order shifted, but consistent
    # on BOTH sides (the SQL mirror compares the same to_i64 values)
    seeds_df = top_k(ranked, "_kmr", k, id_col, descending=False).to_pandas()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in seeds_df[embed_col]])
    return quantize(mat)


def kmeans(
    ds,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    embed_col: str = "embedding",
    seed: int = 77,
):
    """Lloyd's k-means, ``iters`` centroid updates after seeded init.

    Returns (centroids int64 (k, d), assignments Dataset[id_col, cluster])
    where cluster is the 1-based init rank and assignments are the FINAL
    argmin against the returned centroids."""
    cent = seeded_init(ds, k, id_col, embed_col, seed)
    d = cent.shape[1]
    proj = ds.select_columns([id_col, embed_col])

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partial(t: pa.Table, _ref=cent_ref) -> pa.Table:
            c = ray.get(_ref)
            _, q = _quantized_batch(t, id_col, embed_col)
            a = _assign(q, c)
            cols: dict = {"cid": [], "n": []}
            sums = []
            for ci in np.unique(a):
                m = a == ci
                cols["cid"].append(int(ci))
                cols["n"].append(int(m.sum()))
                sums.append(q[m].sum(axis=0))
            out = {
                "cid": pa.array(np.asarray(cols["cid"], dtype=np.int64)),
                "n": pa.array(np.asarray(cols["n"], dtype=np.int64)),
            }
            sm = np.stack(sums) if sums else np.zeros((0, q.shape[1]), np.int64)
            for j in range(q.shape[1]):
                out[f"s{j}"] = pa.array(sm[:, j])
            return pa.table(out)

        # k·B partial rows — bounded by block count, combined on the driver
        pdf = proj.map_batches(partial, batch_format="pyarrow").to_pandas()
        new = cent.copy()  # empty cluster keeps its previous centroid
        if len(pdf):
            g = pdf.groupby("cid", sort=True).sum()
            n = g["n"].to_numpy().astype(np.int64)
            s = g[[f"s{j}" for j in range(d)]].to_numpy().astype(np.int64)
            upd = np.floor(s.astype(np.float64) / n[:, None] + 0.5).astype(np.int64)
            new[g.index.to_numpy()] = upd
        cent = new

    cent_ref = ray.put(cent)

    def assign_batch(t: pa.Table, _ref=cent_ref) -> pa.Table:
        c = ray.get(_ref)
        ids, q = _quantized_batch(t, id_col, embed_col)
        a = _assign(q, c) + 1  # 1-based cluster ids (init rank)
        return pa.table({id_col: pa.array(ids), "cluster": pa.array(a.astype(np.int64))})

    return cent, proj.map_batches(assign_batch, batch_format="pyarrow")


def ivf_topk(
    ds,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k_neighbors: int = 5,
    n_clusters: int = 8,
    nprobe: int = 2,
    iters: int = 2,
    id_col: str = "vec_id",
    embed_col: str = "embedding",
    seed: int = 77,
):
    """IVF-flat search: route each query to its ``nprobe`` nearest k-means
    cells, exact integer-L2 top-k among the vectors assigned to those
    cells.  One extra streaming pass after training; per-task state is the
    (k, d) centroid matrix + the query block.  Approximate by design: a
    true neighbor assigned to an unprobed cell is missed (recall grows
    with nprobe — nprobe=k is exact)."""
    from .ann import _bucketed_topk_merge

    cent, _ = kmeans(ds, n_clusters, iters, id_col, embed_col, seed)
    qq = quantize(np.asarray(query_mat, dtype=np.float64))
    # probe sets: nprobe nearest centroids per query (dist asc, cid asc)
    dists = ((qq[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    probe = np.argsort(dists, kind="stable", axis=1)[:, :nprobe]  # ties → low cid
    side_ref = ray.put({"cent": cent, "qids": np.asarray(query_ids), "qq": qq, "probe": probe})

    def search(t: pa.Table, _ref=side_ref) -> pa.Table:
        side = ray.get(_ref)
        ids, q = _quantized_batch(t, id_col, embed_col)
        a = _assign(q, side["cent"])
        out_q, out_n, out_s = [], [], []
        for qi in range(side["qq"].shape[0]):
            m = np.isin(a, side["probe"][qi])
            if not m.any():
                continue
            cand, cid = q[m], ids[m]
            dd = ((cand - side["qq"][qi][None, :]) ** 2).sum(axis=1)
            kk = min(k_neighbors, dd.shape[0])
            part = np.lexsort((cid, dd))[:kk]
            out_q.append(np.full(kk, side["qids"][qi]))
            out_n.append(cid[part])
            out_s.append(-dd[part])  # merge ranks by "sim" desc = dist asc
        if not out_q:
            return pa.table(
                {
                    "qid": pa.array([], type=pa.int64()),
                    "nid": pa.array([], type=pa.int64()),
                    "sim": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "nid": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    partial = ds.select_columns([id_col, embed_col]).map_batches(
        search, batch_format="pyarrow"
    )
    return _bucketed_topk_merge(partial, k_neighbors, id_col)


SEM_QSCALE = 1 << 10  # dedup-test quantization: dot ≤ d·2^20 keeps
# TAU_DEN²·dot² and TAU_NUM²·n1·n2 inside int64 for d ≤ 64, |v| ≤ ~1


def semdedup(
    ds,
    k: int = 8,
    iters: int = 2,
    tau: tuple[int, int] = (7, 20),
    id_col: str = "vec_id",
    embed_col: str = "embedding",
    seed: int = 77,
):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means cluster the
    embedding space, then within each cluster drop every item that has a
    SMALLER-ID semantic near-duplicate — the same keeper rule as the
    repo's MinHash fuzzy dedup (stages/dedup.near_dedup_filter), so the
    two paths compose.

    The near-dup test is the QUANTIZED integer cosine rule (pinned on both
    engine and oracle sides, the hll_distinct pattern): with q =
    floor(v·2^10 + 0.5) per coordinate and τ = tn/td, items i<j in the
    same cluster are near-dups iff dot(qᵢ,qⱼ) > 0 and
    td²·dot² ≥ tn²·‖qᵢ‖²·‖qⱼ‖².  All quantities stay inside int64 for
    d ≤ 64, |v| ≤ ~1 (dot ≤ 2^26 → td²·dot² ≤ 2^61 at τ = 7/20).

    Scale shape: one streaming pass attaches the cluster id (centroids
    broadcast), ONE shuffle co-locates each cluster's vectors, and the
    pairwise test runs vectorized per cluster in row-chunks that bound the
    (chunk × n) dot matrix.  Per-task rows = cluster size — SemDeDup's own
    contract is that k GROWS with the corpus so clusters stay bounded
    (the paper uses k ≈ N/100); pass the bigger k at scale.

    Returns Dataset[id, cluster, keep] over every input row."""
    tn, td = tau
    cent, _ = kmeans(ds, k, iters, id_col, embed_col, seed)
    cent_ref = ray.put(cent)
    proj = ds.select_columns([id_col, embed_col])

    def assign_batch(t: pa.Table, _ref=cent_ref) -> pa.Table:
        c = ray.get(_ref)
        _, q = _quantized_batch(t, id_col, embed_col)
        a = _assign(q, c) + 1  # 1-based cluster ids (init rank)
        return t.append_column("cluster", pa.array(a.astype(np.int64)))

    def group_dedup(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _embed_matrix(g, embed_col)
        q = np.floor(mat * float(SEM_QSCALE) + 0.5).astype(np.int64)
        if np.abs(q).max(initial=0) > 4 * SEM_QSCALE:
            raise ValueError("semdedup: |embedding| too large for the int64 rule")
        # process rows in chunks so the (chunk × n) dot matrix stays bounded
        order = np.argsort(ids, kind="mergesort")
        q = q[order]
        sid = ids[order]
        nn = (q * q).sum(axis=1)
        n = len(sid)
        dup = np.zeros(n, dtype=bool)
        chunk = max(1, 8_000_000 // max(n, 1))
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            dots = q[s:e] @ q.T  # (chunk, n) int64, ≤ 2^26 each
            rhs = np.int64(tn) * np.int64(tn) * (nn[s:e][:, None] * nn[None, :])
            hit = (dots > 0) & (
                np.int64(td) * np.int64(td) * dots * dots >= rhs
            )
            # near-dup with any SMALLER-id row (strictly earlier in sorted
            # order) ⇒ dropped
            lower = np.arange(n)[None, :] < (s + np.arange(e - s))[:, None]
            dup[s:e] |= (hit & lower).any(axis=1)
        cluster = g.column("cluster").to_numpy(zero_copy_only=False)[order]
        return pa.table(
            {
                id_col: pa.array(sid),
                "cluster": pa.array(cluster.astype(np.int64)),
                "keep": pa.array((~dup).astype(np.int64)),
            }
        )

    return (
        proj.map_batches(assign_batch, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(group_dedup, batch_format="pyarrow")
    )


# ------------------------------------------------------- product quantization

PQ_SEED = 91


def pq_train(
    ds,
    m: int = 4,
    k_sub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    embed_col: str = "embedding",
    seed: int = PQ_SEED,
) -> np.ndarray:
    """Product-quantization codebooks: split d dims into ``m`` contiguous
    subspaces and run integer Lloyd's independently in each — the memory
    scale path for ANN (d float64s → m uint8-sized codes per vector,
    ~64× smaller candidate scans).

    Same pinned arithmetic as ``kmeans`` (quantized int64 coordinates,
    exact integer argmin, floor(sum/n + .5) updates, empty cluster keeps
    its centroid), and the same seeded init — the k_sub hash-smallest
    vectors seed EVERY subspace with their sub-slices, so one top-k pass
    initializes all m codebooks.  Each Lloyd iteration is ONE streaming
    pass over the corpus: the per-batch partial emits ≤ m·k_sub integer
    sum rows per block (the only thing that reaches the driver).

    Returns int64 codebooks of shape (m, k_sub, d/m)."""
    seeds = seeded_init(ds, k_sub, id_col, embed_col, seed)
    d = seeds.shape[1]
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    dsub = d // m
    cents = np.ascontiguousarray(
        seeds.reshape(k_sub, m, dsub).transpose(1, 0, 2)
    )  # (m, k_sub, dsub)
    proj = ds.select_columns([id_col, embed_col])

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            _, q = _quantized_batch(t, id_col, embed_col)
            qs = q.reshape(q.shape[0], m, dsub)
            subs, cids, ns, sums = [], [], [], []
            for s in range(m):
                a = _assign(qs[:, s], c[s])
                for ci in np.unique(a):
                    mask = a == ci
                    subs.append(s)
                    cids.append(int(ci))
                    ns.append(int(mask.sum()))
                    sums.append(qs[mask, s].sum(axis=0))
            out = {
                "sub": pa.array(np.asarray(subs, np.int64)),
                "cid": pa.array(np.asarray(cids, np.int64)),
                "n": pa.array(np.asarray(ns, np.int64)),
            }
            sm = np.stack(sums) if sums else np.zeros((0, dsub), np.int64)
            for j in range(dsub):
                out[f"s{j}"] = pa.array(sm[:, j])
            return pa.table(out)

        pdf = proj.map_batches(partial, batch_format="pyarrow").to_pandas()
        new = cents.copy()
        if len(pdf):
            g = pdf.groupby(["sub", "cid"], sort=True).sum()
            scols = [f"s{j}" for j in range(dsub)]
            n = g["n"].to_numpy().astype(np.int64)
            s = g[scols].to_numpy().astype(np.int64)
            upd = np.floor(s.astype(np.float64) / n[:, None] + 0.5).astype(np.int64)
            idx = np.asarray(list(g.index))
            new[idx[:, 0], idx[:, 1]] = upd
        cents = new
    return cents


def pq_encode(ds, cents: np.ndarray, id_col: str = "vec_id", embed_col: str = "embedding"):
    """Encode each vector to its per-subspace nearest-codeword ids
    (1-based, matching the kmeans init-rank convention).  Stateless
    map_batches against the broadcast (m, k_sub, d/m) codebooks; returns
    Dataset[id_col, code0..code{m-1}]."""
    m, _, dsub = cents.shape
    ref = ray.put(cents)

    def encode(t: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        ids, q = _quantized_batch(t, id_col, embed_col)
        qs = q.reshape(q.shape[0], m, dsub)
        cols = {id_col: pa.array(ids)}
        for s in range(m):
            cols[f"code{s}"] = pa.array((_assign(qs[:, s], c[s]) + 1).astype(np.int64))
        return pa.table(cols)

    return ds.select_columns([id_col, embed_col]).map_batches(
        encode, batch_format="pyarrow"
    )


def pq_topk(
    ds,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k_neighbors: int = 5,
    m: int = 4,
    k_sub: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    embed_col: str = "embedding",
    seed: int = PQ_SEED,
):
    """Asymmetric-distance (ADC) PQ search: per query precompute the
    (m, k_sub) integer distance table to every codeword, then scan the
    CODES (not the vectors) summing m table lookups per candidate — the
    classic IVF-PQ inner loop, exactly integer so the SQL oracle replays
    it.  Approximate by design (quantization error); ranked by
    (approx distance asc, id asc) through the bucketed top-k merge."""
    from .ann import _bucketed_topk_merge

    cents = pq_train(ds, m, k_sub, iters, id_col, embed_col, seed)
    dsub = cents.shape[2]
    qq = quantize(np.asarray(query_mat, dtype=np.float64)).reshape(-1, m, dsub)
    # (nq, m, k_sub) exact int64 subspace distances
    dt = ((qq[:, :, None, :] - cents[None]) ** 2).sum(axis=3)
    side_ref = ray.put({"qids": np.asarray(query_ids), "dt": dt})
    codes = pq_encode(ds, cents, id_col, embed_col)

    def search(t: pa.Table, _ref=side_ref) -> pa.Table:
        side = ray.get(_ref)
        dtab, qids = side["dt"], side["qids"]
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        code = np.stack(
            [t.column(f"code{s}").to_numpy(zero_copy_only=False) for s in range(m)],
            axis=1,
        ) - 1  # back to 0-based for table lookup
        nq, nc = qids.shape[0], ids.shape[0]
        d = np.zeros((nq, nc), dtype=np.int64)
        for s in range(m):
            d += dtab[:, s, :][:, code[:, s]]
        kk = min(k_neighbors, nc)
        out_q, out_n, out_s = [], [], []
        for qi in range(nq):
            part = np.lexsort((ids, d[qi]))[:kk]
            out_q.append(np.full(kk, qids[qi]))
            out_n.append(ids[part])
            out_s.append(-d[qi][part])  # merge ranks by sim desc = dist asc
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                "nid": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    partial = codes.map_batches(search, batch_format="pyarrow")
    return _bucketed_topk_merge(partial, k_neighbors, id_col)


def dbscan(
    geo,
    eps: float,
    min_pts: int,
    id_cols: tuple[str, str] = ("doc_id", "span_idx"),
    lon_col: str = "lon",
    lat_col: str = "lat",
    driver_pair_limit: int = 2_000_000,
):
    """Exact planar DBSCAN over geo points — density clustering, the
    spatial complement of k-means (centroid) and IVF (routing).

    Rules (all mirrored verbatim in the SQL oracle):
      * neighbor: q ≠ p with (Δlon² + Δlat²) ≤ eps² (planar degrees);
      * core: ≥ ``min_pts`` neighbors;
      * cluster: connected component of core points under the eps-edge,
        labeled by the component's MIN core id;
      * border: non-core with ≥1 core neighbor → MIN label among its core
        neighbors;  * noise: everything else, label ''.

    Scale shape: points fan out to their 3×3 grid ring at the finest
    level whose cell side ≥ eps (the withinDistance machinery,
    sampling.spatial_near_dedup); each unordered eps-pair is emitted
    EXACTLY ONCE (in the smaller-id point's home cell), so neighbor
    counts are two-phase pair-side sums — never an n² pass.  Core-core
    edges flow into the spanning-forest CC (dedup.min_label_clusters);
    border labels are a two-phase grouped MIN.  Only the (bounded) pair
    list is ever driver-side, guarded like spatial_near_dedup.

    Output: (id:string, label:string, is_core:int64) for EVERY input
    point; id = '{doc_id}#{span_idx}'.
    """
    import pandas as pd

    import ray.data as rd

    from ..state import cells
    from .dedup import exact_pairs_distinct, min_label_clusters
    from .sampling import _level_for_distance

    level = _level_for_distance(eps)
    d2max = eps * eps
    ncell = np.int64(1) << level

    def mk_id(t: pa.Table) -> pa.Table:
        did = t.column(id_cols[0]).cast(pa.string())
        six = t.column(id_cols[1]).cast(pa.string())
        pid = pc.binary_join_element_wise(did, six, "#")
        return pa.table(
            {
                "id": pid,
                lon_col: t.column(lon_col),
                lat_col: t.column(lat_col),
            }
        )

    pts = geo.select_columns(list(id_cols) + [lon_col, lat_col]).map_batches(
        mk_id, batch_format="pyarrow"
    )

    def fanout(t: pa.Table) -> pa.Table:
        lon = t.column(lon_col).to_numpy(zero_copy_only=False)
        lat = t.column(lat_col).to_numpy(zero_copy_only=False)
        ids = t.column("id")
        ix, iy = cells.grid_coords(lon, lat, level)
        cell_l, idx_l, home_l = [], [], []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                jx, jy = ix + dx, iy + dy
                ok = (jx >= 0) & (jx < ncell) & (jy >= 0) & (jy < ncell)
                cell_l.append(cells.morton(jx[ok], jy[ok]))
                idx_l.append(np.nonzero(ok)[0])
                home_l.append(
                    np.full(int(ok.sum()), dx == 0 and dy == 0, dtype=bool)
                )
        take = pa.array(np.concatenate(idx_l))
        return pa.table(
            {
                "cell": pa.array(np.concatenate(cell_l)),
                "id": ids.take(take),
                lon_col: pa.array(lon[np.concatenate(idx_l)]),
                lat_col: pa.array(lat[np.concatenate(idx_l)]),
                "home": pa.array(np.concatenate(home_l)),
            }
        )

    fan = pts.map_batches(fanout, batch_format="pyarrow")

    def cell_pairs(g: pd.DataFrame) -> pd.DataFrame:
        lon = g[lon_col].to_numpy()
        lat = g[lat_col].to_numpy()
        ids = g["id"].to_numpy()
        home = g["home"].to_numpy()
        dx = lon[:, None] - lon[None, :]
        dy = lat[:, None] - lat[None, :]
        close = (dx * dx + dy * dy) <= d2max
        # emit exactly once: smaller id must be HOME in this cell
        lt = ids[:, None] < ids[None, :]
        ii, jj = np.nonzero(close & lt & home[:, None])
        if ii.size == 0:
            return pd.DataFrame({"a": ids[:0], "b": ids[:0]})
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]}).drop_duplicates()

    pair_ds = exact_pairs_distinct(
        fan.groupby("cell").map_groups(cell_pairs, batch_format="pandas")
    ).materialize()

    # neighbor count per id = pair rows touching it (each eps-pair once)
    def cnt_partial(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [
                t.column("a").combine_chunks().cast(pa.large_string()),
                t.column("b").combine_chunks().cast(pa.large_string()),
            ]
        )
        out = (
            pa.table({"id": both}).group_by("id").aggregate([([], "count_all")])
        )
        return out.rename_columns(["id", "cnt"])

    from .zonal import bucketed_sum

    # unbounded string ids → the hash-bucket exchange, not the native
    # sort aggregate
    counts = bucketed_sum(
        pair_ds.map_batches(cnt_partial, batch_format="pyarrow"),
        ["id"],
        ["cnt"],
    )
    # gate BEFORE collecting: the core set is ≤ 2·pairs ids, so check the
    # pair bound first rather than materializing an oversized core table
    if pair_ds.count() > driver_pair_limit:
        raise ValueError(
            f"dbscan: pair list exceeds driver_pair_limit={driver_pair_limit}"
        )
    from ..runtime import bounded_collect

    core_df = bounded_collect(
        counts.filter(expr=f"cnt >= {int(min_pts)}"),
        2 * driver_pair_limit,
        "dbscan core ids: ≤ 2·driver_pair_limit",
    )
    # sorted unicode key arrays -> every membership / label probe below is
    # a vectorized searchsorted, never a per-row Python hash lookup
    ck = np.sort(core_df["id"].to_numpy().astype("U"))
    core_ref = ray.put(ck)

    def _probe(keys: np.ndarray, ids: np.ndarray):
        if keys.size == 0:
            return np.zeros(ids.shape[0], bool), np.zeros(ids.shape[0], np.int64)
        pos = np.searchsorted(keys, ids)
        pos_c = np.clip(pos, 0, keys.shape[0] - 1)
        return keys[pos_c] == ids, pos_c

    def core_edges(t: pa.Table) -> pa.Table:
        keys = ray.get(core_ref)
        a = t.column("a").to_numpy(zero_copy_only=False).astype("U")
        b = t.column("b").to_numpy(zero_copy_only=False).astype("U")
        ha, _ = _probe(keys, a)
        hb, _ = _probe(keys, b)
        return t.filter(pa.array(ha & hb))

    ce = pair_ds.map_batches(core_edges, batch_format="pyarrow")
    cl = min_label_clusters(ce).to_pandas()  # (node, cluster) for cores in edges
    label_of = dict(zip(cl["node"], cl["cluster"]))
    cv = np.array([label_of.get(k, k) for k in ck], dtype="U") if ck.size else ck
    # (isolated cores — no core-core edge — label themselves)
    label_ref = ray.put((ck, cv))

    # border: non-core endpoint of a pair whose other endpoint is core
    def border_partial(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(label_ref)
        a = t.column("a").to_numpy(zero_copy_only=False).astype("U")
        b = t.column("b").to_numpy(zero_copy_only=False).astype("U")
        out_id, out_lab = [], []
        for x, y in ((a, b), (b, a)):
            hx, _ = _probe(keys, x)
            hy, py = _probe(keys, y)
            m = (~hx) & hy
            out_id.append(x[m])
            out_lab.append(vals[py[m]] if keys.size else x[m][:0])
        ids_a = np.concatenate(out_id)
        labs_a = np.concatenate(out_lab)
        out = (
            pa.table(
                {
                    "id": pa.array(ids_a.astype(object), pa.string()),
                    "lab": pa.array(labs_a.astype(object), pa.string()),
                }
            )
            .group_by("id")
            .aggregate([("lab", "min")])
        )
        return out.rename_columns(["id", "lab"])

    from .zonal import bucketed_combine

    border = bucketed_combine(
        pair_ds.map_batches(border_partial, batch_format="pyarrow"),
        ["id"],
        {"lab": "min"},
    ).to_pandas()
    if len(border) == 0 or "id" not in border.columns:
        # empty Dataset.to_pandas() loses its column names (known Ray quirk)
        bk = np.empty(0, dtype="U1")
        bv = np.empty(0, dtype="U1")
    else:
        bids = border["id"].to_numpy().astype("U")
        order = np.argsort(bids)
        bk = bids[order]
        bv = border["lab"].to_numpy().astype("U")[order]
    border_ref = ray.put((bk, bv))

    def finalize(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(label_ref)
        bkeys, bvals = ray.get(border_ref)
        ids = t.column("id").to_numpy(zero_copy_only=False).astype("U")
        hc, pc_ = _probe(keys, ids)
        hb, pb = _probe(bkeys, ids)
        lab = np.full(ids.shape[0], "", object)
        if keys.size:
            lab[hc] = vals[pc_[hc]]
        if bkeys.size:
            sel = hb & ~hc
            lab[sel] = bvals[pb[sel]]
        return pa.table(
            {
                "id": t.column("id"),
                "label": pa.array(lab, pa.string()),
                "is_core": pa.array(hc.astype(np.int64)),
            }
        )

    return pts.map_batches(finalize, batch_format="pyarrow")


def dbscan_sql(points_sql: str, eps: float, min_pts: int) -> str:
    """Oracle twin of :func:`dbscan` — brute-force O(n²) eps-join +
    recursive-CTE components over a bounded point subset.  ``points_sql``
    must yield (id, lon, lat).  Returns a CTE fragment + final SELECT to
    embed after ``WITH RECURSIVE`` (the dreach CTE is recursive)."""
    return f"""
        dbp AS MATERIALIZED (
            SELECT * FROM ({points_sql})
        ),
        de AS MATERIALIZED (
            SELECT a.id AS ia, b.id AS ib
            FROM dbp a JOIN dbp b ON a.id < b.id
             AND ((a.lon - b.lon) * (a.lon - b.lon)
                + (a.lat - b.lat) * (a.lat - b.lat)) <= {eps!r} * {eps!r}
        ),
        dcnt AS (
            SELECT id, COUNT(*) AS cnt FROM (
                SELECT ia AS id FROM de UNION ALL SELECT ib FROM de
            ) GROUP BY id
        ),
        dcore AS MATERIALIZED (
            SELECT id FROM dcnt WHERE cnt >= {int(min_pts)}
        ),
        dce AS MATERIALIZED (
            SELECT ia, ib FROM de
            WHERE ia IN (SELECT id FROM dcore)
              AND ib IN (SELECT id FROM dcore)
        ),
        dund AS MATERIALIZED (
            SELECT ia AS x, ib AS y FROM dce UNION SELECT ib, ia FROM dce
        ),
        dreach AS (
            SELECT x AS node, x AS r FROM (SELECT DISTINCT x FROM dund)
            UNION
            SELECT u.x AS node, dreach.r
            FROM dund u JOIN dreach ON dreach.node = u.y
        ),
        dlab AS (
            SELECT c.id, COALESCE(m.lbl, c.id) AS label
            FROM dcore c LEFT JOIN (
                SELECT node, MIN(r) AS lbl FROM dreach GROUP BY node
            ) m ON m.node = c.id
        ),
        dborder AS (
            SELECT t.id, MIN(l.label) AS label FROM (
                SELECT ia AS id, ib AS nb FROM de
                UNION ALL SELECT ib, ia FROM de
            ) t
            JOIN dlab l ON l.id = t.nb
            WHERE t.id NOT IN (SELECT id FROM dcore)
            GROUP BY t.id
        )
        SELECT p.id,
               COALESCE(cl.label, bl.label, '') AS label,
               CAST(CASE WHEN cl.id IS NULL THEN 0 ELSE 1 END AS BIGINT)
                   AS is_core
        FROM dbp p
        LEFT JOIN dlab cl ON cl.id = p.id
        LEFT JOIN dborder bl ON bl.id = p.id"""


SIL_SCALE = float(1 << 40)  # silhouette-term quantum (|s| ≤ 1)


def silhouette(
    ds,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    embed_col: str = "embedding",
    seed: int = 77,
):
    """Simplified silhouette score per k-means cluster — the standard
    clustering-quality report (s = (b−a)/max(a,b) with a = distance to
    the OWN centroid and b = distance to the nearest OTHER centroid;
    +1 tight and well-separated, 0 boundary, −1 misassigned), using the
    centroid-based simplification that makes it one streaming pass
    instead of O(n²) pairwise.

    Exactness: squared distances are exact int64 in the quantized
    embedding space (the :func:`kmeans` discipline, same tie rule);
    per-point s floor-quantizes at 2⁴⁰ so cluster sums are order-free;
    mean_s is ONE pinned s_q/2⁴⁰/n chain.  Scale shape: centroids
    broadcast once; one stateless pass emits ≤k rows per batch.

    Output: (cluster:int64, n:int64, s_q_sum:int64, mean_s:f64),
    clusters sorted.
    """
    import ray.data as rd

    from ray.data.aggregate import Sum

    cent, _ = kmeans(ds, k=k, iters=iters, id_col=id_col, embed_col=embed_col, seed=seed)
    cent_ref = ray.put(cent)

    def partial(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        _, q = _quantized_batch(t, id_col, embed_col)
        if q.shape[0] == 0:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "s_q_sum": pa.array([], pa.int64()),
                }
            )
        d2 = (
            (q * q).sum(axis=1)[:, None]
            - 2 * (q @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        own = np.argmin(
            -2 * (q @ c.T) + (c * c).sum(axis=1)[None, :], axis=1
        )  # the _assign tie rule (first min = lowest cid)
        rows = np.arange(q.shape[0])
        a2 = d2[rows, own]
        masked = d2.copy()
        masked[rows, own] = np.iinfo(np.int64).max
        b2 = masked.min(axis=1)
        sa = np.sqrt(a2.astype(np.float64))
        sb = np.sqrt(b2.astype(np.float64))
        den = np.maximum(sa, sb)
        s = np.where(den == 0.0, 0.0, (sb - sa) / np.where(den == 0.0, 1.0, den))
        sq = np.floor(s * SIL_SCALE).astype(np.int64)
        g = (
            pa.table(
                {
                    "cluster": pa.array(own.astype(np.int64) + 1),
                    "n": pa.array(np.ones(len(own), np.int64)),
                    "s_q_sum": pa.array(sq),
                }
            )
            .group_by(["cluster"])
            .aggregate([("n", "sum"), ("s_q_sum", "sum")])
        )
        return g.rename_columns(["cluster", "n", "s_q_sum"])

    from .zonal import bucketed_sum

    agg = bucketed_sum(
        ds.select_columns([id_col, embed_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["cluster"],
        ["n", "s_q_sum"],
        max_keys_hint=1 << 20,  # ≤ k clusters — tree reduce
    ).to_pandas()  # ≤ k rows
    agg = agg.sort_values("cluster", kind="mergesort").reset_index(drop=True)
    sq = agg["s_q_sum"].to_numpy(np.int64)
    n = agg["n"].to_numpy(np.int64)
    mean_s = sq.astype(np.float64) / SIL_SCALE / n.astype(np.float64)
    return rd.from_arrow(
        pa.table(
            {
                "cluster": pa.array(agg["cluster"].to_numpy(np.int64)),
                "n": pa.array(n, pa.int64()),
                "s_q_sum": pa.array(sq, pa.int64()),
                "mean_s": pa.array(mean_s, pa.float64()),
            }
        )
    )


def label_separation(ds, id_col: str = "vec_id", embed_col: str = "embedding", label_col: str = "label"):
    """Inter-class separation matrix over labeled embeddings — the
    class-separability report (how far apart the label centroids sit;
    near-zero pairs flag labels a classifier cannot distinguish):
    per-label centroids in the quantized integer space (the
    :func:`kmeans` floor(sum/n + .5) discipline) and EXACT int64
    pairwise squared distances.

    Scale shape: one pass of per-batch (label, n, Σq) integer partials;
    everything after is the |labels|-bounded centroid table.

    Output: (label_a:int64, label_b:int64, d2:int64, dist:f64) for a<b,
    sorted; dist = √d2 (IEEE, exact both sides).
    """
    import math

    import ray.data as rd

    def partial(t: pa.Table) -> pa.Table:
        _, q = _quantized_batch(t, id_col, embed_col)
        lab = t.column(label_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cols: dict = {"lab": [], "n": []}
        sums = []
        for lv in np.unique(lab):
            m = lab == lv
            cols["lab"].append(int(lv))
            cols["n"].append(int(m.sum()))
            sums.append(q[m].sum(axis=0))
        out = {
            "lab": pa.array(np.asarray(cols["lab"], np.int64)),
            "n": pa.array(np.asarray(cols["n"], np.int64)),
        }
        sm = np.stack(sums) if sums else np.zeros((0, q.shape[1]), np.int64)
        for j in range(sm.shape[1]):
            out[f"s{j}"] = pa.array(sm[:, j])
        return pa.table(out)

    pp = (
        ds.select_columns([id_col, embed_col, label_col])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    empty = pa.table(
        {
            "label_a": pa.array([], pa.int64()),
            "label_b": pa.array([], pa.int64()),
            "d2": pa.array([], pa.int64()),
            "dist": pa.array([], pa.float64()),
        }
    )
    if len(pp) == 0:
        return rd.from_arrow(empty)
    scols = [c for c in pp.columns if c.startswith("s")]
    g = pp.groupby("lab", as_index=False)[["n"] + scols].sum()
    g = g.sort_values("lab", kind="mergesort").reset_index(drop=True)
    labs = g["lab"].to_numpy(np.int64)
    n = g["n"].to_numpy(np.int64)
    S = g[scols].to_numpy(np.int64)
    # kmeans centroid rule: floor(sum/n + .5) == (2*sum + n) // (2*n) for
    # positive n, but sums may be negative — use floor division directly
    cent = np.floor(S.astype(np.float64) / n[:, None].astype(np.float64) + 0.5).astype(np.int64)
    rows = []
    for i in range(len(labs)):
        for j in range(i + 1, len(labs)):
            d = cent[i] - cent[j]
            d2 = int((d * d).sum())
            rows.append((int(labs[i]), int(labs[j]), d2, math.sqrt(float(d2))))
    return rd.from_arrow(
        pa.table(
            {
                "label_a": pa.array([r[0] for r in rows], pa.int64()),
                "label_b": pa.array([r[1] for r in rows], pa.int64()),
                "d2": pa.array([r[2] for r in rows], pa.int64()),
                "dist": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
    )
