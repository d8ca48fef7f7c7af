"""Similarity search over an embedding column (list<float>).

Baseline: exact brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), each batch does one numpy matmul against it, and per-batch
partial top-k rows stream into a tiny final top-k (decomposable, no full
shuffle).  Scale path: LSH / IVF bucketing — assign each vector to a coarse
bucket (signed random projections), route queries to their probe buckets via
the same projections, brute-force only inside buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..state.hashing import hash_unit


def _embed_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.ExtensionArray):  # Ray tensor extension type
        m = arr.to_numpy(zero_copy_only=False)
        if m.dtype == object:
            m = np.stack([np.asarray(x) for x in m])
        return m.astype(np.float64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    nrm = np.sqrt((m * m).sum(axis=1, keepdims=True))
    nrm[nrm == 0] = 1.0
    return m / nrm


class CosineTopK:
    """Actor-pool callable: per-batch partial top-k vs broadcast queries."""

    def __init__(self, queries_ref, id_col: str, embed_col: str, k: int):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = np.asarray(q["qid"])
        self.qmat = _normalize(np.asarray(q["mat"], dtype=np.float64))
        self.id_col, self.embed_col, self.k = id_col, embed_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_embed_matrix(batch, self.embed_col))
        sims = m @ self.qmat.T  # (n, q)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        k = min(self.k, m.shape[0])
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.qmat.shape[0]):
            s = sims[:, qi]
            # top-k by (sim desc, id asc) — deterministic under ties
            part = np.lexsort((ids, -s))[:k]
            out_q.append(np.full(k, self.qids[qi]))
            out_id.append(ids[part])
            out_sim.append(s[part])
        return pa.table(
            {
                "qid": pa.array(np.concatenate(out_q)),
                self.id_col: pa.array(np.concatenate(out_id)),
                "sim": pa.array(np.concatenate(out_sim)),
            }
        )


def cosine_topk(
    ds,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    id_col: str = "vec_id",
    embed_col: str = "embedding",
    k: int = 10,
    concurrency=None,
):
    """Exact global top-k per query: partial top-k per batch → final top-k.

    Returns Dataset[qid, rank (1-based), id_col] — ranks are deterministic
    under ties via (sim desc, id asc)."""
    if concurrency is None:
        from ..runtime import pool_size

        concurrency = (1, pool_size(0.4))
    qref = ray.put({"qid": query_ids, "mat": query_mat})
    partial = ds.map_batches(
        CosineTopK,
        fn_constructor_kwargs=dict(queries_ref=qref, id_col=id_col, embed_col=embed_col, k=k),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", id_col], ascending=[False, True], kind="mergesort").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1)
        return g[["qid", "rank", id_col]]

    return partial.groupby("qid").map_groups(final, batch_format="pandas")


class EmbeddingDupFinder:
    """Actor-pool callable: batch rows × broadcast corpus → near-dup pairs
    (cosine ≥ threshold, id_a < id_b).

    The corpus matrix is normalized once per actor.  Exact (all-pairs); the
    scale path replaces the broadcast corpus with LSH buckets (lsh_bucketed)
    and runs this same kernel inside each bucket."""

    def __init__(self, corpus_ref, id_col: str, threshold: float):
        c = ray.get(corpus_ref) if isinstance(corpus_ref, ray.ObjectRef) else corpus_ref
        self.ids = np.asarray(c["ids"])
        self.mat = _normalize(np.asarray(c["mat"], dtype=np.float64))
        self.id_col, self.threshold = id_col, threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_embed_matrix(batch, "embedding"))
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        sims = m @ self.mat.T
        ii, jj = np.nonzero((sims >= self.threshold) & (ids[:, None] < self.ids[None, :]))
        return pa.table({"a": pa.array(ids[ii]), "b": pa.array(self.ids[jj])})


def embedding_dup_pairs(
    ds, threshold: float, id_col: str = "vec_id", embed_col: str = "embedding", concurrency=None
):
    """Exact embedding-cosine near-duplicate pairs (a < b)."""
    if concurrency is None:
        from ..runtime import pool_size

        concurrency = (1, pool_size(0.4))
    rows = ds.select_columns([id_col, embed_col]).to_pandas()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in rows[embed_col]])
    corpus_ref = ray.put({"ids": rows[id_col].to_numpy(), "mat": mat})
    return ds.map_batches(
        EmbeddingDupFinder,
        fn_constructor_kwargs=dict(corpus_ref=corpus_ref, id_col=id_col, threshold=threshold),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


class LSHBucketer:
    """Scale path: signed-random-projection bucket id per vector.

    ``nbits`` projections (seeded, deterministic) → 2^nbits coarse buckets;
    search probes the query's bucket (+ optional multi-probe neighbors)."""

    def __init__(self, embed_col: str, nbits: int = 8, dim: int | None = None, seed: int = 7):
        self.embed_col, self.nbits, self.seed = embed_col, nbits, seed
        self._planes: np.ndarray | None = None

    def planes(self, dim: int) -> np.ndarray:
        if self._planes is None:
            u = hash_unit(
                self.seed, "lsh", np.arange(self.nbits * dim, dtype=np.int64)
            ).reshape(self.nbits, dim)
            self._planes = u - 0.5
        return self._planes

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _embed_matrix(batch, self.embed_col)
        proj = m @ self.planes(m.shape[1]).T
        bits = (proj > 0).astype(np.int64)
        bucket = (bits << np.arange(self.nbits, dtype=np.int64)[None, :]).sum(axis=1)
        return batch.append_column("bucket", pa.array(bucket))


def lsh_bucketed(ds, embed_col: str = "embedding", nbits: int = 8, concurrency=None):
    if concurrency is None:
        from ..runtime import pool_size

        concurrency = (1, pool_size(0.4))
    return ds.map_batches(
        LSHBucketer,
        fn_constructor_kwargs=dict(embed_col=embed_col, nbits=nbits),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
