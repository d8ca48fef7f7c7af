"""Join helpers (SURVEY.md J1/J5/J6, A5, K1).

* ``join_first``  — the ee.Join.saveFirst analog (src/utils/s2process.py:28-35):
  left equi-join keeping the FIRST build-side match per key, deterministic
  "first" = smallest order_col.  Build side is deduped to one row per key
  *before* the join, so the hash join itself stays 1:1.
* ``anti_join_ids`` — inList(ids).Not() (src/utils/sampling.py:45-48):
  broadcast the id set, filter inside map_batches.  No shuffle.
* ``distinct``  — aggregate_array().distinct() (src/02train_test.py:108):
  two-phase exact distinct.
* ``top_k``     — gettop20 / sort+limit (src/utils/primitives.py:49-59)
  with a deterministic tie-break column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def dedupe_first(ds, key_cols: list[str], order_col: str):
    """One row per key: the row with min order_col (ties impossible when
    order_col is unique; otherwise first in (order_col) order)."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_col, kind="mergesort").head(1)

    return ds.groupby(key_cols).map_groups(first, batch_format="pandas")


def join_first(left, right, on: list[str], order_col: str, num_partitions: int | None = None):
    """Left join; at most one right match per key (first by order_col)."""
    if num_partitions is None:
        from ..runtime import join_partitions

        num_partitions = join_partitions()
    deduped = dedupe_first(right, on, order_col)
    return left.join(
        deduped, join_type="left_outer", num_partitions=num_partitions, on=tuple(on)
    )


def anti_join_ids(ds, id_col: str, ids):
    """Drop rows whose id is in ``ids`` (broadcast set, vectorized isin)."""
    ids_ref = ray.put(np.asarray(sorted(ids)))

    class AntiFilter:
        def __init__(self):
            self.ids = ray.get(ids_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            col = t.column(id_col).to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~np.isin(col, self.ids)))

    return ds.map_batches(AntiFilter, batch_format="pyarrow", concurrency=(1, 2))


def distinct(ds, cols: list[str]):
    """Exact distinct rows over ``cols``: per-batch dedupe → groupby combine."""
    from ray.data.aggregate import Count

    def partial(t: pa.Table) -> pa.Table:
        out = t.select(cols).group_by(cols).aggregate([([], "count_all")])
        return out.rename_columns(cols + ["n"])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(cols)
        .aggregate(Count(alias_name="_n"))
        .select_columns(cols)
    )


def top_k_per_group(
    ds,
    group_cols: list[str],
    value_col: str,
    k: int,
    tiebreak_cols: list[str],
    descending: bool = True,
):
    """Grouped top-k (the row_number()-per-partition primitive) as a
    decomposable two-phase plan: per-block top-k per group (≤ k rows per
    (block, group) survive), then a hash-bucketed combine running the
    identical kernel per bucket — top-k of per-block top-ks is exact, and
    the (value, tiebreaks) sort makes ties deterministic at any
    parallelism.  No global sort; the shuffle moves ≤ k·groups·blocks
    pre-pruned rows."""
    from .zonal import _add_bucket, _default_buckets

    by = group_cols + [value_col] + tiebreak_cols
    asc = [True] * len(group_cols) + [not descending] + [True] * len(tiebreak_cols)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(by, ascending=asc, kind="mergesort")
        return df.groupby(group_cols, as_index=False, sort=False).head(k)

    partial = ds.map_batches(
        lambda t: pa.Table.from_pandas(kernel(t.to_pandas()), preserve_index=False),
        batch_format="pyarrow",
    )
    return (
        _add_bucket(partial, group_cols, _default_buckets())
        .groupby("bucket")
        .map_groups(kernel, batch_format="pandas")
        .drop_columns(["bucket"])
    )


def top_k(ds, value_col: str, k: int, tiebreak_col: str, descending: bool = True):
    """Global top-k by (value, tiebreak) — deterministic under ties.

    Dataset-native two-level reduce: per-block partial top-k (≤ k rows
    leave each block), `repartition(1)`, final top-k over the ≤ k×n_blocks
    survivors.  No global sort, nothing materializes on the driver; the
    result is a k-row Dataset sorted (value desc, tiebreak asc)."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(
            [value_col, tiebreak_col], ascending=[not descending, True], kind="mergesort"
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    # batch_size=None on the final stage: the single block must be one
    # batch, else each sub-batch would emit its own k rows.
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
    )
