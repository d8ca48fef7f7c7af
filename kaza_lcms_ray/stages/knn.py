"""kNN lookup of nearest training plots (SURVEY.md T4/J2-analog).

Reference analog: the ``withinDistance`` spatial self-join of sample points
(src/utils/sampling.py:12-28) and the "nearest training plot" semantics of
sample extraction.  Here: the plots table is small (thousands–millions of
rows; tiny next to 10^12 documents), so it is broadcast once via the object
store and each actor holds the search structure in memory — no shuffle.

The exact kernel is chunked brute force over direct coordinate differences
(``dx*dx + dy*dy`` — the same expression the DuckDB oracle evaluates, so
distances are bit-identical; no matmul expansion, which would change the
floating-point rounding).  Tie-break: nearest by (d2, plot_id) — plots are
pre-sorted by plot_id so the first minimum wins.  For very large plot tables
the scale path is the cell-grid index (bucket plots by cell, probe k_ring
neighbors); the brute-force kernel stays the per-bucket inner loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


class PlotIndex:
    def __init__(self, plot_ids: np.ndarray, lon: np.ndarray, lat: np.ndarray):
        order = np.argsort(plot_ids, kind="stable")  # tie-break order
        self.plot_ids = plot_ids[order]
        self.lon = lon[order].astype(np.float64)
        self.lat = lat[order].astype(np.float64)

    @classmethod
    def from_parquet(cls, path: str) -> "PlotIndex":
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["plot_id", "lon", "lat"])
        return cls(
            np.asarray(t.column("plot_id").to_pylist(), dtype=object),
            t.column("lon").to_numpy(),
            t.column("lat").to_numpy(),
        )

    def nearest(self, px: np.ndarray, py: np.ndarray, chunk: int = 2048):
        """1-NN: returns (plot_idx, dist).  dist = sqrt(dx²+dy²) in degrees."""
        n = px.shape[0]
        best_idx = np.empty(n, dtype=np.int64)
        best_d2 = np.empty(n, dtype=np.float64)
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            dx = px[s:e, None] - self.lon[None, :]
            dy = py[s:e, None] - self.lat[None, :]
            d2 = dx * dx + dy * dy
            # argmin returns the FIRST minimum → min plot_id on exact ties
            bi = np.argmin(d2, axis=1)
            best_idx[s:e] = bi
            best_d2[s:e] = d2[np.arange(e - s), bi]
        return best_idx, np.sqrt(best_d2)


class PlotGridIndex(PlotIndex):
    """Exact grid-accelerated 1-NN: plots bucketed by cell, queries probe
    expanding Chebyshev rings and verify with a distance bound.

    The scale path for large plot tables (brute force is O(plots) per
    query; this is O(local density)).  Exactness: after the first ring r
    with candidates, rings are extended to ⌊d_best / cell_side⌋ + 1 —
    no plot outside that radius can beat d_best.  Tie-break identical to
    brute force: candidates are gathered in plot_id-sorted order and
    np.argmin takes the first minimum.
    """

    def __init__(self, plot_ids, lon, lat, level: int | None = None):
        super().__init__(plot_ids, lon, lat)
        from ..state import cells as C

        n = self.lon.shape[0]
        # ~1 plot per cell on average, clamped
        if level is None:
            level = int(np.clip(np.ceil(np.log2(max(2.0, np.sqrt(n) * 4))), 6, 18))
        self.level = level
        self.cell_side = 180.0 / (1 << level)  # lat extent of one cell (deg)
        ix, iy = C.grid_coords(self.lon, self.lat, level)
        order = np.lexsort((np.arange(n), iy, ix))  # stable: plot_id order within cell
        self.order = order
        self.ix, self.iy = ix[order], iy[order]
        key = self.ix * (np.int64(1) << np.int64(level)) + self.iy
        self.uk, self.starts = np.unique(key, return_index=True)
        self.ends = np.append(self.starts[1:], n)

    def _cell_candidates(self, cx: int, cy: int) -> np.ndarray:
        key = np.int64(cx) * (np.int64(1) << np.int64(self.level)) + np.int64(cy)
        pos = np.searchsorted(self.uk, key)
        if pos < self.uk.shape[0] and self.uk[pos] == key:
            return self.order[self.starts[pos] : self.ends[pos]]
        return np.empty(0, dtype=np.int64)

    def _ring_candidates(self, cx: int, cy: int, r: int) -> np.ndarray:
        out = []
        n_side = np.int64(1) << self.level
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                if max(abs(dx), abs(dy)) != r:
                    continue
                jx, jy = cx + dx, cy + dy
                if 0 <= jx < n_side and 0 <= jy < n_side:
                    out.append(self._cell_candidates(int(jx), int(jy)))
        return np.concatenate(out) if out else np.empty(0, dtype=np.int64)

    def nearest(self, px: np.ndarray, py: np.ndarray, chunk: int = 2048):
        from ..state import cells as C

        n = px.shape[0]
        best_idx = np.empty(n, dtype=np.int64)
        best_d2 = np.empty(n, dtype=np.float64)
        qx, qy = C.grid_coords(px, py, self.level)
        qkey = qx * (np.int64(1) << np.int64(self.level)) + qy
        order = np.argsort(qkey, kind="stable")
        bounds = np.nonzero(np.diff(qkey[order]))[0] + 1
        for seg in np.split(order, bounds):
            cx, cy = int(qx[seg[0]]), int(qy[seg[0]])
            cand = self._cell_candidates(cx, cy)
            r = 0
            while cand.shape[0] == 0:
                r += 1
                cand = self._ring_candidates(cx, cy, r)
            # gather rings until the bound guarantees exactness
            sx, sy = px[seg], py[seg]
            while True:
                dx = sx[:, None] - self.lon[cand][None, :]
                dy = sy[:, None] - self.lat[cand][None, :]
                d2 = dx * dx + dy * dy
                bi = np.argmin(d2, axis=1)
                d_best = np.sqrt(d2[np.arange(seg.shape[0]), bi].max())
                # worst-case reach from anywhere in this cell
                r_needed = int(d_best / self.cell_side) + 1
                if r_needed <= r:
                    break
                extra = [self._ring_candidates(cx, cy, rr) for rr in range(r + 1, r_needed + 1)]
                r = r_needed
                extra = [e for e in extra if e.shape[0]]
                if not extra:
                    break
                cand = np.sort(np.concatenate([cand] + extra))
            # candidates sorted by plot index == plot_id order → first-min tie-break
            cand = np.sort(cand)
            dx = sx[:, None] - self.lon[cand][None, :]
            dy = sy[:, None] - self.lat[cand][None, :]
            d2 = dx * dx + dy * dy
            bi = np.argmin(d2, axis=1)
            best_idx[seg] = cand[bi]
            best_d2[seg] = d2[np.arange(seg.shape[0]), bi]
        return best_idx, np.sqrt(best_d2)


class KNNJoiner:
    """Actor-pool callable: geo_obs batch → + (plot_id, dist) columns."""

    def __init__(self, index_ref):
        self.index: PlotIndex = (
            ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch.column("lon").to_numpy(zero_copy_only=False)
        py = batch.column("lat").to_numpy(zero_copy_only=False)
        bi, dist = self.index.nearest(px, py)
        return batch.append_column(
            "plot_id", pa.array(self.index.plot_ids[bi].astype(object), type=pa.string())
        ).append_column("dist", pa.array(dist, type=pa.float64()))


# worker-process-local index cache (same pattern as flagship's labeler):
# stateless tasks fuse with the upstream read/parse and use EVERY cpu, while
# each worker still pays the ray.get exactly once
_INDEX_CACHE: dict = {}


def _cached_index(index_ref):
    key = index_ref.hex()
    idx = _INDEX_CACHE.get(key)
    if idx is None:
        _INDEX_CACHE.clear()
        idx = _INDEX_CACHE.setdefault(key, ray.get(index_ref))
    return idx


def knn_join(
    geo,
    plots_path: str,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
    strategy: str = "grid",
):
    """strategy='grid' (default, exact, O(local density) per query) or
    'brute' (exact baseline, O(plots) per query) — identical results,
    tested; grid is the scale path for large plot tables.

    Runs as STATELESS map_batches tasks with a worker-local index cache
    (not an actor pool): the stage fuses with the upstream read→parse and
    scales to every CPU instead of a fixed pool fraction — measured ~2×
    on the bench kNN query.  Pass ``concurrency`` to force an actor pool
    (e.g. to cap memory on huge plot tables)."""
    cls = PlotGridIndex if strategy == "grid" else PlotIndex
    index_ref = ray.put(cls.from_parquet(plots_path))
    if concurrency is not None:
        return geo.map_batches(
            KNNJoiner,
            fn_constructor_kwargs={"index_ref": index_ref},
            batch_format="pyarrow",
            batch_size=batch_size or 8192,
            concurrency=concurrency,
            num_cpus=1,
        )

    def fn(batch: pa.Table) -> pa.Table:
        worker = KNNJoiner.__new__(KNNJoiner)
        worker.index = _cached_index(index_ref)
        return worker(batch)

    return geo.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def plot_load(geo, plots_path: str):
    """Reverse-kNN load: for every training plot, the number of corpus
    observations whose NEAREST plot (the :func:`knn_join` winner) is it —
    the catchment/assignment-load report behind plot-coverage QA
    (reference analog: per-plot sample counts in the CEO review sheets).

    Exactness: inherits knn_join's exact (squared-distance ASC, plot_id
    ASC) winner; the load is a pure integer count, zero-filled for
    never-chosen plots.

    Scale shape: the corpus-sized pass is the stateless fused
    read→parse→kNN map; only (plot_id, 1-per-batch-group) partial count
    rows enter the bucketed integer combine; the final attach probes the
    PLOT-bounded count table (the side-broadcast discipline) onto the
    pruned plot_id column read.

    Output: (plot_id:string, n_assigned:int64) — one row per plot.
    """
    import ray.data as rd

    from .zonal import bucketed_sum

    nn = knn_join(geo, plots_path)

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["plot_id"])
            .group_by(["plot_id"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["plot_id", "n_assigned"])

    counts = bucketed_sum(
        nn.map_batches(partial, batch_format="pyarrow"),
        ["plot_id"],
        ["n_assigned"],
        # plots are AOI-bounded (one row per training plot): the
        # no-exchange tree reduce replaces the sort all-to-all, which
        # cost ~4 s of fixed overhead on the ~100-block kNN output
        max_keys_hint=2_000_000,
    ).to_pandas()
    if len(counts):
        order = np.argsort(counts["plot_id"].to_numpy(object), kind="mergesort")
        keys = counts["plot_id"].to_numpy(object)[order]
        vals = counts["n_assigned"].to_numpy(np.int64)[order]
    else:
        keys = np.empty(0, object)
        vals = np.empty(0, np.int64)
    side_ref = ray.put({"k": keys, "v": vals})

    def attach(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        pid = t.column("plot_id").to_numpy(zero_copy_only=False)
        out = np.zeros(len(pid), np.int64)
        if len(side["k"]):
            pos = np.minimum(np.searchsorted(side["k"], pid), len(side["k"]) - 1)
            hit = side["k"][pos] == pid
            out[hit] = side["v"][pos[hit]]
        return pa.table(
            {"plot_id": t.column("plot_id"), "n_assigned": pa.array(out)}
        )

    return rd.read_parquet(plots_path, columns=["plot_id"]).map_batches(
        attach, batch_format="pyarrow"
    )


def radius_extract(geo, plots_path: str, radius: float = 0.02, band: int = 3):
    """Neighborhood extraction at reference plots — the reference's
    sampleRegions-with-buffer analog (src/utils/sampling.py extraction
    over buffered plot geometries): per training plot, the EXACT mean of
    band cents over every geo span within ``radius`` planar degrees.

    Scale shape: the plot table is the bounded ancillary side (S5) —
    broadcast once, lon-sorted for a window probe; each batch fans out
    (span, plot) candidate pairs with pure offset arithmetic (no per-span
    Python), verifies d² ≤ r² exactly, and collapses to (plot, n, Σcents)
    int partials before anything leaves the task; one bucketed integer
    combine over ≤|plots| keys finishes.  Mean is a single double
    division (identical in SQL).

    Output: (plot_id, n:int64, mean_b{band}:f64) for plots with ≥1 span.
    """
    import pyarrow.parquet as pq

    from .zonal import bucketed_sum

    tbl = pq.read_table(plots_path).select(["plot_id", "lon", "lat"])
    plon = tbl.column("lon").to_numpy(zero_copy_only=False)
    order = np.argsort(plon, kind="mergesort")
    side_ref = ray.put(
        {
            "lon": plon[order],
            "lat": tbl.column("lat").to_numpy(zero_copy_only=False)[order],
            "ids": tbl.column("plot_id").to_numpy(zero_copy_only=False)[order],
        }
    )
    rr = radius * radius
    c_col = f"c{band}"

    def partial(t: pa.Table) -> pa.Table:
        s = _cached_index(side_ref)
        x = t.column("lon").to_numpy(zero_copy_only=False)
        y = t.column("lat").to_numpy(zero_copy_only=False)
        c = t.column(c_col).to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.searchsorted(s["lon"], x - radius, side="left")
        hi = np.searchsorted(s["lon"], x + radius, side="right")
        cnt = hi - lo
        offs = np.cumsum(cnt)
        total = int(offs[-1]) if cnt.size else 0
        empty = pa.table(
            {
                "plot_id": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
            }
        )
        if total == 0:
            return empty
        si = np.repeat(np.arange(len(t), dtype=np.int64), cnt)
        pj = (
            np.arange(total, dtype=np.int64)
            - np.repeat(offs - cnt, cnt)
            + np.repeat(lo, cnt)
        )
        dx = x[si] - s["lon"][pj]
        dy = y[si] - s["lat"][pj]
        keep = dx * dx + dy * dy <= rr
        pk = pj[keep]
        if pk.size == 0:
            return empty
        n_p = np.bincount(pk, minlength=len(s["lon"]))
        s_p = np.bincount(pk, weights=c[si[keep]].astype(np.float64),
                          minlength=len(s["lon"])).astype(np.int64)
        nz = np.flatnonzero(n_p)
        return pa.table(
            {
                "plot_id": pa.array(s["ids"][nz].astype(object), type=pa.string()),
                "n": pa.array(n_p[nz].astype(np.int64)),
                "s": pa.array(s_p[nz]),
            }
        )

    agg = bucketed_sum(
        geo.map_batches(partial, batch_format="pyarrow"),
        ["plot_id"],
        ["n", "s"],
        recombine_batch_size=None,
    )

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nn = pc.cast(t.column("n"), pa.float64())
        return pa.table(
            {
                "plot_id": t.column("plot_id"),
                "n": t.column("n"),
                f"mean_b{band}": pc.divide(
                    pc.cast(t.column("s"), pa.float64()),
                    pc.multiply(nn, 100.0),
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")
