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


def knn_join(
    geo,
    plots_path: str,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 8192,
):
    if concurrency is None:
        from ..runtime import pool_size

        concurrency = (1, pool_size(0.4))
    index_ref = ray.put(PlotIndex.from_parquet(plots_path))
    return geo.map_batches(
        KNNJoiner,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
