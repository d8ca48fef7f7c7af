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


def probe_positions(col, value_set, what: str = "key") -> np.ndarray:
    """Strict broadcast-probe: position of every value of ``col`` in the
    broadcast ``value_set`` Arrow array (``pc.index_in`` + combine), as an
    int64 numpy array.  A miss raises instead of silently flowing a null
    through ``astype(int64)`` into a garbage index — the shared idiom for
    every ray.put-side dictionary lookup (tfidf df, lm log-probs, quality
    cutoffs, z-score stats)."""
    import pyarrow.compute as pc

    idx = pc.index_in(col, value_set=value_set)
    if isinstance(idx, pa.ChunkedArray):
        idx = idx.combine_chunks()
    if idx.null_count:
        raise ValueError(f"broadcast probe: {what} missing from side table")
    return idx.to_numpy(zero_copy_only=False).astype(np.int64)


def anti_join_ids(ds, id_col: str, ids):
    """Drop rows whose id is in ``ids`` (broadcast set, vectorized isin)."""
    ids_ref = ray.put(np.sort(np.asarray(ids)))

    class AntiFilter:
        def __init__(self):
            self.ids = ray.get(ids_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            col = t.column(id_col).to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~np.isin(col, self.ids)))

    return ds.map_batches(AntiFilter, batch_format="pyarrow", concurrency=(1, 2))


def distinct(ds, cols: list[str], rows_hint: int | None = None):
    """Exact distinct rows over ``cols``: per-batch Arrow dedupe → hash-
    bucketed combine (one vectorized drop_duplicates per bucket).

    The combine is the zonal ``_add_bucket`` exchange, NOT Ray's native
    ``groupby(cols).aggregate`` — the native sort-based aggregate pays
    per-group sort cost that dominates on string keys (the events_hourly
    pathology; supplier_counts spent ~11 s across its two distincts and
    final count at the gate, ~3× this plan).  Buckets bound per-task rows
    regardless of key skew; pass ``rows_hint`` to scale the bucket count.
    """
    from .zonal import _add_bucket, _default_buckets

    nb = _default_buckets(rows_hint)

    def partial(t: pa.Table) -> pa.Table:
        return t.select(cols).group_by(cols).aggregate([])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(cols)[cols]

    return (
        _add_bucket(ds.map_batches(partial, batch_format="pyarrow"), cols, nb)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def top_k_per_group(
    ds,
    group_cols: list[str],
    value_col: str,
    k: int,
    tiebreak_cols: list[str],
    descending: bool = True,
    rank_col: str | None = None,
    rows_hint: int | None = None,
):
    """Grouped top-k (the row_number()-per-partition primitive) as a
    decomposable two-phase plan: per-block top-k per group (≤ k rows per
    (block, group) survive), then a hash-bucketed combine running the
    identical kernel per bucket — top-k of per-block top-ks is exact, and
    the (value, tiebreaks) sort makes ties deterministic at any
    parallelism.  No global sort; the shuffle moves ≤ k·groups·blocks
    pre-pruned rows.

    ``rank_col``: optionally append the per-group 1-based rank.  Ranks are
    assigned INSIDE the per-bucket map_groups (whole groups guaranteed by
    the shuffle), never in a later per-block pass — Ray's dynamic block
    splitting may cut any operator's *output* mid-group, so rank
    assignment must live where grouping is structural."""
    from .zonal import _add_bucket, _default_buckets

    by = group_cols + [value_col] + tiebreak_cols
    asc = [True] * len(group_cols) + [not descending] + [True] * len(tiebreak_cols)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(by, ascending=asc, kind="mergesort")
        return df.groupby(group_cols, as_index=False, sort=False).head(k)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = kernel(df)
        if rank_col is not None:
            df[rank_col] = df.groupby(group_cols, sort=False).cumcount() + 1
        return df

    partial = ds.map_batches(
        lambda t: pa.Table.from_pandas(kernel(t.to_pandas()), preserve_index=False),
        batch_format="pyarrow",
    )
    return (
        _add_bucket(partial, group_cols, _default_buckets(rows_hint))
        .groupby("bucket")
        .map_groups(final, batch_format="pandas")
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


def _set_op(left, right, cols: list[str], keep_right: bool):
    """Shared plan for INTERSECT / EXCEPT (distinct-set semantics,
    SURVEY.md §2.7): tag each side, per-batch partial distinct with side
    flags (so the shuffle moves one row per (batch, key), never raw rows),
    one groupby(cols) max-combine, then a vectorized membership filter.
    One all-to-all total, pre-aggregated — the same shape as ``distinct``."""

    def tag(l_flag: int, r_flag: int):
        def f(t: pa.Table) -> pa.Table:
            out = t.select(cols).group_by(cols).aggregate([])
            n = out.num_rows
            out = out.append_column("_l", pa.array(np.full(n, l_flag, dtype=np.int64)))
            return out.append_column("_r", pa.array(np.full(n, r_flag, dtype=np.int64)))

        return f

    both = left.map_batches(tag(1, 0), batch_format="pyarrow").union(
        right.map_batches(tag(0, 1), batch_format="pyarrow")
    )
    # max-combine via the hash-bucket exchange, not Ray's native
    # sort-based aggregate — the same rationale (and measured ~3× win on
    # string keys) as ``distinct`` above
    from .zonal import bucketed_combine

    agg = bucketed_combine(both, cols, {"_l": "max", "_r": "max"})

    def keep(t: pa.Table) -> pa.Table:
        l = t.column("_l").to_numpy(zero_copy_only=False) == 1
        r = t.column("_r").to_numpy(zero_copy_only=False) == 1
        mask = l & r if keep_right else l & ~r
        return t.filter(pa.array(mask)).select(cols)

    return agg.map_batches(keep, batch_format="pyarrow")


def intersect_distinct(left, right, cols: list[str]):
    """SQL INTERSECT: distinct ``cols`` rows present on BOTH sides."""
    return _set_op(left, right, cols, keep_right=True)


def except_distinct(left, right, cols: list[str]):
    """SQL EXCEPT: distinct ``cols`` rows on the left and NOT on the right."""
    return _set_op(left, right, cols, keep_right=False)


def attach_dim(
    facts,
    dim,
    fact_key: str,
    dim_key: str,
    val_cols: list[str],
    max_broadcast_rows: int = 5_000_000,
    rows_hint: int | None = None,
    dim_rows: int | None = None,
):
    """Inner-join ``val_cols`` of a dimension table onto fact rows — the
    size-guarded broadcast join every star-schema pipeline needs.

    Small dimension (≤ max_broadcast_rows): the dim is collected ONCE,
    sorted by key, `ray.put` into the object store, and probed with
    np.searchsorted inside a stateless ``map_batches`` — no shuffle, zero
    per-batch re-shipping.  Probes are verified with an exact key-equality
    check (searchsorted alone maps absent keys to a neighbor); unmatched
    fact rows are DROPPED (inner semantics) rather than silently
    mis-attributed.

    Large dimension: falls back to a hash ``Dataset.join`` on
    (fact_key = dim_key) so no table is ever driver-materialized — the
    100 TB path when the dimension grows with the fact data (e.g. TPC-H
    orders/customer at high SF).
    """
    import pyarrow.compute as pc  # noqa: F401  (kept for parity with call sites)

    n = dim_rows if dim_rows is not None else dim.count()
    cols = [dim_key] + list(val_cols)
    if n <= max_broadcast_rows:
        dd = dim.select_columns(cols).to_pandas()
        if len(dd) == 0:
            # empty dimension: inner semantics → no fact survives.  The
            # searchsorted probe below would index keys[-1] on a 0-length
            # array — and an empty to_pandas() even loses its COLUMN
            # names, so dtypes come from the Dataset schema instead.
            dim_schema = dim.schema()
            # a fully-empty pipeline can have NO schema at all -> null-typed
            # placeholder columns (zero rows, so the type never matters)
            typ_by_col = (
                dict(zip(dim_schema.names, dim_schema.types))
                if dim_schema is not None
                else {c: pa.null() for c in val_cols}
            )

            def drop_all(t: pa.Table) -> pa.Table:
                out = t.slice(0, 0)
                for c in val_cols:
                    out = out.append_column(c, pa.array([], type=typ_by_col[c]))
                return out

            return facts.map_batches(drop_all, batch_format="pyarrow")
        keys = dd[dim_key].to_numpy()
        # the broadcast probe attaches exactly ONE match per fact row —
        # correct only when dim keys are unique.  The hash-join fallback
        # would duplicate fact rows per match, so a non-unique dim must
        # not silently flip behavior at the size threshold.
        order = np.argsort(keys, kind="mergesort")
        if np.unique(keys).shape[0] != keys.shape[0]:
            raise ValueError(
                f"attach_dim: dimension key {dim_key!r} is not unique; "
                "broadcast lookup attaches one match per fact row"
            )
        side_ref = ray.put(
            {
                "keys": keys[order],
                "vals": {c: dd[c].to_numpy()[order] for c in val_cols},
            }
        )

        def lookup(t: pa.Table) -> pa.Table:
            side = ray.get(side_ref)
            probe = t.column(fact_key).to_numpy(zero_copy_only=False)
            pos = np.searchsorted(side["keys"], probe)
            pos_c = np.clip(pos, 0, side["keys"].shape[0] - 1)
            hit = side["keys"][pos_c] == probe
            if not hit.all():
                t = t.filter(pa.array(hit))
                pos_c = pos_c[hit]
            for c in val_cols:
                v = side["vals"][c][pos_c]
                if v.dtype == object:
                    t = t.append_column(c, pa.array(v.astype(object), type=pa.string()))
                else:
                    t = t.append_column(c, pa.array(v))
            return t

        return facts.map_batches(lookup, batch_format="pyarrow")

    from ..runtime import join_partitions

    right = dim.select_columns(cols)
    return facts.join(
        right,
        join_type="inner",
        num_partitions=join_partitions(rows_hint=rows_hint or n),
        on=(fact_key,),
        right_on=(dim_key,),
    )
