"""Zonal statistics: grouped counts / means / percentiles / harmonic fits
keyed on the spatial cell (SURVEY.md A1-A4, A6, A10; M13/A2).

Two execution shapes, chosen by what the statistic needs:

* **Decomposable aggregates (count, sum, mean)** run two-phase: a vectorized
  per-batch partial aggregate inside ``map_batches`` (one row per key per
  batch — this is the skew/salt treatment: a hot Okavango cell contributes one
  partial row per batch instead of millions of raw rows to the shuffle),
  then a small ``groupby().aggregate(Sum)`` over partials.  All sums are ×100
  scaled int64, so results are exact integers — bit-stable under any combine
  order and bit-equal to the DuckDB oracle.

* **Holistic aggregates (percentile, OLS harmonic fit)** use
  ``groupby(keys).map_groups`` with an explicit in-group sort by
  (doc_id, span_idx), giving bit-stable float accumulation independent of
  partitioning (SURVEY.md §7 "hard parts").

Reference analogs: percentile reducer over the annual collection
(src/utils/s2process.py:138-139), mean composite (src/misc/sentinel1.py:59),
per-class counts → area (src/misc/old_README_instructions.md:16-50), harmonic
linearRegression (src/utils/harmonics.py:14-46).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Sum

from ..state.cells import CELL_LEVEL, cell_area_m2

DEFAULT_PERCENTILES = (10, 25, 50, 75, 90)  # src/utils/model_inputs.py:32


def _partial_counts(batch: pa.Table, keys: list[str], cent_cols: list[str]) -> pa.Table:
    aggs = [(c, "sum") for c in cent_cols] + [(keys[0], "count")]
    out = batch.group_by(keys).aggregate(aggs)
    names = list(keys) + [f"s_{c}" for c in cent_cols] + ["n"]
    return out.rename_columns(names)


_TREE_KEYS_BOUND = 4_000_000  # level-2 single-task row bound (skinny rows)


def _tree_reduce(partial, combine_t, nb_l1: int):
    """Two-level NO-EXCHANGE reduce for bounded-key combines.

    ``repartition(nb)`` (plain split/merge, no sort) → per-block combine
    → ``repartition(1)`` → final combine.  Correct for any associative,
    order-insensitive combine (the integer-sum discipline every caller
    follows): keys may appear in several level-1 blocks; the level-2
    single task merges them exactly.  Removes Ray's sort-exchange fixed
    cost (measured ~4 s on a 223k-row partial table spread over ~100
    blocks vs ~0.7 s for this plan) — but the level-2 block holds the
    WHOLE key space, so callers must prove key cardinality ≤
    ``_TREE_KEYS_BOUND`` (AOI cells, plots, sources, windows …)."""
    lvl1 = partial.repartition(nb_l1).map_batches(
        combine_t, batch_format="pyarrow", batch_size=None
    )
    return lvl1.repartition(1).map_batches(
        combine_t, batch_format="pyarrow", batch_size=None
    )


def bucketed_sum(
    partial,
    keys: list[str],
    sum_cols: list[str],
    num_buckets: int | None = None,
    recombine_batch_size: int | None = 512 * 1024,
    rows_hint: int | None = None,
    max_keys_hint: int | None = None,
):
    """Combine per-batch partial sums: hash-bucket the keys (≈2×CPUs
    buckets), one vectorized pandas groupby-sum per bucket.  Exact for
    integer sums (order-insensitive); ~10× faster than Ray's sort-based
    groupby().aggregate() when the key cardinality is large, because the
    shuffle exchanges ``num_buckets`` partitions instead of sorting the
    whole partial table.

    ``recombine_batch_size``: an extra partial-combine pass over LARGE
    batches before the shuffle — per-block partials barely reduce rows when
    key cardinality ≈ block size, so re-partialing ~500k-row batches shrinks
    the shuffled table toward (key cardinality × n_batches) at the cost of
    one extra (skinny-row) exchange.  Set None to skip for low-cardinality
    keys.

    ``max_keys_hint``: the caller's PROVEN bound on distinct-key
    cardinality.  When given and ≤ ``_TREE_KEYS_BOUND`` the combine runs
    as the no-exchange tree reduce (:func:`_tree_reduce`) — exact for
    these order-insensitive sums and seconds cheaper than any
    all-to-all; above the bound (or when omitted — unbounded key spaces
    like fp128 fingerprints) the bucketed exchange handles arbitrary
    cardinality."""
    nb = num_buckets or _default_buckets(rows_hint)

    if max_keys_hint is not None and max_keys_hint <= _TREE_KEYS_BOUND:
        # tree path SKIPS the recombine stage: its level-1 per-block
        # combine does the same shrink AFTER a repartition boundary.
        # (The recombine's big batch_size is a fusion trap: Ray bundles
        # input blocks to satisfy the fused operator's min batch size, so
        # a 512k-row recombine fused onto an expensive upstream map
        # collapses it to ~rows/512k tasks — measured 6 tasks × 6 s on
        # the kNN chain that runs in ~2 s at natural parallelism.)
        def combine_t(t: pa.Table) -> pa.Table:
            out = t.group_by(keys).aggregate([(c, "sum") for c in sum_cols])
            return out.rename_columns(keys + sum_cols)

        from ..runtime import cluster_cpus

        return _tree_reduce(partial, combine_t, max(8, cluster_cpus()))

    if recombine_batch_size:
        def repartial(t: pa.Table) -> pa.Table:
            out = t.group_by(keys).aggregate([(c, "sum") for c in sum_cols])
            return out.rename_columns(keys + sum_cols)

        # num_cpus=1.01 BREAKS OPERATOR FUSION with the upstream map (Ray
        # only fuses maps with identical resource requests).  Fused, the
        # recombine's big batch_size makes Ray bundle input blocks to
        # ≥512k rows per task, which collapses the (possibly expensive)
        # upstream map to ~rows/512k tasks — measured 9.5 s vs 3.8 s on
        # the kNN→count chain at 32 CPUs.  Unfused, upstream runs at its
        # natural parallelism and only the skinny partial blocks are
        # bundled.
        partial = partial.map_batches(
            repartial,
            batch_format="pyarrow",
            batch_size=recombine_batch_size,
            num_cpus=1.01,
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, as_index=False)[sum_cols].sum()

    return (
        _add_bucket(partial, keys, nb)
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
        .select_columns(keys + sum_cols)
    )


def bucketed_combine(
    partial,
    keys: list[str],
    aggs: dict[str, str],
    num_buckets: int | None = None,
    recombine_batch_size: int | None = 512 * 1024,
    rows_hint: int | None = None,
    max_keys_hint: int | None = None,
):
    """``bucketed_sum`` generalized to mixed per-column reductions
    ('sum' | 'max' | 'min') — exact for any order-insensitive combine.
    Same ONE-int64-bucket exchange instead of a full sort-based groupby
    (Ray's sort pays seconds of fixed cost per all-to-all at any size);
    ``max_keys_hint`` selects the no-exchange tree reduce exactly as in
    :func:`bucketed_sum`."""
    nb = num_buckets or _default_buckets(rows_hint)
    cols = list(aggs)

    if max_keys_hint is not None and max_keys_hint <= _TREE_KEYS_BOUND:
        # tree path skips the recombine stage — see bucketed_sum (the
        # fused big-batch recombine collapses upstream parallelism)

        def combine_t(t: pa.Table) -> pa.Table:
            out = t.group_by(keys).aggregate([(c, aggs[c]) for c in cols])
            return out.rename_columns(keys + cols)

        from ..runtime import cluster_cpus

        return _tree_reduce(partial, combine_t, max(8, cluster_cpus()))

    if recombine_batch_size:

        def repartial(t: pa.Table) -> pa.Table:
            out = t.group_by(keys).aggregate([(c, aggs[c]) for c in cols])
            return out.rename_columns(keys + cols)

        # num_cpus=1.01 breaks fusion with the upstream map — see
        # bucketed_sum for the measured fusion-bundling trap
        partial = partial.map_batches(
            repartial,
            batch_format="pyarrow",
            batch_size=recombine_batch_size,
            num_cpus=1.01,
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, as_index=False).agg(
            {c: aggs[c] for c in cols}
        )

    return (
        _add_bucket(partial, keys, nb)
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
        .select_columns(keys + cols)
    )


def zonal_sums(geo, keys=("cell_id", "year"), bands=(3,)):
    """Grouped n + per-band exact scaled-cent SUMS (int64) — the
    un-finalized half of zonal_counts, for consumers that need the integer
    totals themselves (e.g. lee_sigma's bit-exact windows)."""
    keys = list(keys)
    cent_cols = [f"c{b}" for b in bands]
    partial = geo.map_batches(
        lambda t: _partial_counts(t, keys, cent_cols), batch_format="pyarrow"
    )
    return bucketed_sum(partial, keys, ["n"] + [f"s_{c}" for c in cent_cols])


def zonal_counts(geo, keys=("cell_id", "year"), bands=(0, 1, 2, 3, 4, 5)):
    """Grouped n + per-band mean (exact scaled-int arithmetic).

    Output: keys…, n:int64, mean_b{i}:f64 (= sum_cents / (100·n), a single
    correctly-rounded double division — identical in SQL).

    Two-phase + bucketed combine: per-batch Arrow group_by partials (the
    skew treatment: a hot cell is one row per batch), then bucketed_sum.
    """
    keys = list(keys)
    cent_cols = [f"c{b}" for b in bands]
    partial = geo.map_batches(
        lambda t: _partial_counts(t, keys, cent_cols), batch_format="pyarrow"
    )
    agg = bucketed_sum(partial, keys, ["n"] + [f"s_{c}" for c in cent_cols])

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.column("n")
        cols = {k: t.column(k) for k in keys}
        cols["n"] = n
        denom = pc.multiply(pc.cast(n, pa.float64()), 100.0)
        for b, c in zip(bands, cent_cols):
            cols[f"mean_b{b}"] = pc.divide(
                pc.cast(t.column(f"s_{c}"), pa.float64()), denom
            )
        return pa.table(cols)

    return agg.map_batches(finalize, batch_format="pyarrow")


def rollup_to_parent(cell_sums, levels_up: int = 2, bands=(0, 3)):
    """Hierarchical rollup: parent-cell statistics derived from the CHILD
    aggregates, not from raw observations — at 100 TB the cell-level sums
    are ~10⁶× smaller than the observation table, so multi-resolution
    pyramids re-aggregate in milliseconds.  Exact: integer (n, Σcents)
    partials re-key to ``parent(cell_id)`` (a bit shift) and recombine
    through the same bucketed path; means finalize identically to
    ``zonal_counts`` at the coarser level.
    """
    from ..state.cells import parent

    cent_cols = [f"s_c{b}" for b in bands]

    def rekey(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        cols = {"parent_id": pa.array(parent(cid, levels_up))}
        for c in ["year", "n"] + cent_cols:
            cols[c] = t.column(c)
        return pa.table(cols)

    agg = bucketed_sum(
        cell_sums.map_batches(rekey, batch_format="pyarrow"),
        ["parent_id", "year"],
        ["n"] + cent_cols,
    )

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        denom = pc.multiply(pc.cast(t.column("n"), pa.float64()), 100.0)
        cols = {
            "parent_id": t.column("parent_id"),
            "year": t.column("year"),
            "n": t.column("n"),
        }
        for b in bands:
            cols[f"mean_b{b}"] = pc.divide(
                pc.cast(t.column(f"s_c{b}"), pa.float64()), denom
            )
        return pa.table(cols)

    return agg.map_batches(finalize, batch_format="pyarrow")


def zonal_covariance(geo, keys=("cell_id", "year"), bands=(0, 3, 4)):
    """Per-key band covariance matrix (upper triangle) — the statistic
    transform derivations like Tasseled Cap start from (the reference ships
    fixed coefficients, src/utils/model_inputs.py; this is the "derive your
    own" analog over any AOI).

    Fully decomposable and exact until the final division: partials carry
    n, Σc_i and Σc_i·c_j as int64 over the ×100 scaled ints (products
    ≤ 3.2e11, per-group sums ≪ 2⁶³ at cell granularity), combined by
    ``bucketed_sum``; cov_ij = (S_ij − S_i·S_j/n)/n evaluated with the
    identical double operation order as the SQL oracle.
    """
    keys = list(keys)
    cent = [f"c{b}" for b in bands]
    pairs = [(i, j) for ii, i in enumerate(bands) for j in bands[ii:]]

    def partial(t: pa.Table) -> pa.Table:
        cols = {k: t.column(k) for k in keys}
        arrs = {
            b: t.column(f"c{b}").to_numpy(zero_copy_only=False).astype(np.int64)
            for b in bands
        }
        for b in bands:
            cols[f"s_{b}"] = pa.array(arrs[b])
        for i, j in pairs:
            cols[f"s_{i}_{j}"] = pa.array(arrs[i] * arrs[j])
        tb = pa.table(cols)
        sums = [(c, "sum") for c in tb.column_names if c not in keys]
        out = tb.group_by(keys).aggregate(sums + [([], "count_all")])
        return out.rename_columns(keys + [c for c, _ in sums] + ["n"])

    sum_cols = [f"s_{b}" for b in bands] + [f"s_{i}_{j}" for i, j in pairs] + ["n"]
    agg = bucketed_sum(
        geo.select_columns(keys + cent).map_batches(partial, batch_format="pyarrow"),
        keys,
        sum_cols,
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = {
            b: t.column(f"s_{b}").to_numpy(zero_copy_only=False).astype(np.float64)
            for b in bands
        }
        cols = {k: t.column(k) for k in keys}
        cols["n"] = t.column("n")
        for i, j in pairs:
            sij = t.column(f"s_{i}_{j}").to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            cols[f"cov_c{i}_c{j}"] = pa.array((sij - s[i] * s[j] / n) / n)
        return pa.table(cols)

    return agg.map_batches(finalize, batch_format="pyarrow")


def interp_percentile(sorted_vals: np.ndarray, p: float) -> float:
    """Linear-interpolated percentile, pinned BIT-EXACT to DuckDB's
    quantile_cont: h = (n−1)·q; v = (1−frac)·x[⌊h⌋] + frac·x[⌊h⌋+1]
    (verified formula — ``lower + (upper−lower)·frac`` differs in the last
    ulp and would break oracle value-hash comparison)."""
    n = sorted_vals.shape[0]
    h = (n - 1) * (p / 100.0)
    lo = int(np.floor(h))
    hi = min(lo + 1, n - 1)
    frac = h - lo
    return (1.0 - frac) * float(sorted_vals[lo]) + frac * float(sorted_vals[hi])


def _add_bucket(ds, keys: list[str], num_buckets: int):
    """Hash-bucket column over the group keys: the shuffle moves ``keys``
    cardinality down to ``num_buckets`` partitions, and each bucket is
    processed by ONE vectorized numpy call instead of one Python call per
    group.  This is also the hot-key treatment: the Okavango hot cells land
    in some bucket alongside others, and a bucket is at most 1/B of the key
    space — bounded, predictable group sizes for the executor."""
    from ..state.hashing import hash_key

    def fn(t: pa.Table) -> pa.Table:
        from ..state.hashing import fnv1a_arr

        key = np.zeros(len(t), dtype=np.uint64)
        for k in keys:
            col = t.column(k)
            if pa.types.is_integer(col.type):
                part = col.to_numpy(zero_copy_only=False).astype(np.int64)
            else:  # string group keys hash via the vectorized FNV-1a
                part = fnv1a_arr(col)
            key = hash_key(key, part)
        return t.append_column("bucket", pa.array((key % np.uint64(num_buckets)).astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow")


_ROWS_PER_BUCKET = 4_000_000  # per-holistic-task row bound (skinny rows ≈ 100-300 MB)


def _default_buckets(rows_hint: int | None = None) -> int:
    """Bucket count for holistic (whole-bucket-in-one-task) combines.

    Default ≈2× cluster CPUs; with a ``rows_hint`` (estimated rows
    ENTERING the bucketed stage — raw rows for zonal_percentiles,
    pre-pruned partials for top-k/sum combines) the count scales so one
    bucket holds ≤ ~``_ROWS_PER_BUCKET`` rows in expectation, independent
    of data scale (VERDICT r3 #4).  Capped at 65536 buckets — at the cap
    a 10¹² -row stage still bounds each task at ~15M rows."""
    from ..runtime import cluster_cpus

    nb = max(8, cluster_cpus() * 2)
    if rows_hint:
        nb = max(nb, -(-int(rows_hint) // _ROWS_PER_BUCKET))
    return min(nb, 65536)


def zonal_percentiles(
    geo,
    keys=("cell_id", "year"),
    band: int = 3,
    ps=DEFAULT_PERCENTILES,
    num_buckets: int | None = None,
    rows_hint: int | None = None,
):
    """Per-key percentiles of one band (holistic aggregate).

    Output: keys…, n:int64, p{P}_b{band}:f64.  Percentiles interpolate over
    the ×100 scaled ints cast to double, so both sides interpolate over
    exactly-representable integers; the interpolation formula is pinned
    bit-exact to DuckDB quantile_cont (see interp_percentile).

    Execution: hash-bucket the keys (≈2×CPUs buckets), one map_groups call
    per bucket, then lexsort + segment boundaries inside — every group in a
    bucket is reduced by vectorized numpy, no per-group Python dispatch.
    """
    keys = list(keys)
    col = f"c{band}"
    # rows_hint = input row count: each bucket holds ~rows/nb RAW rows
    nb = num_buckets or _default_buckets(rows_hint)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        kcols = [g[k].to_numpy() for k in keys]
        v = g[col].to_numpy(dtype=np.float64)
        order = np.lexsort((v, *kcols[::-1]))  # by keys, then value asc
        kcols = [k[order] for k in kcols]
        v = v[order]
        changed = np.zeros(v.shape[0], dtype=bool)
        changed[0] = True
        for k in kcols:
            changed[1:] |= k[1:] != k[:-1]
        starts = np.nonzero(changed)[0]
        ends = np.append(starts[1:], v.shape[0])
        n = (ends - starts).astype(np.int64)
        out = {k: kcols[i][starts] for i, k in enumerate(keys)}
        out["n"] = n
        for p in ps:
            h = (n - 1) * (p / 100.0)
            lo = np.floor(h).astype(np.int64)
            frac = h - lo
            a = v[starts + lo]
            b = v[np.minimum(starts + lo + 1, ends - 1)]
            out[f"p{p}_b{band}"] = (1.0 - frac) * a + frac * b
        return pd.DataFrame(out)

    return (
        _add_bucket(geo.select_columns(keys + [col]), keys, nb)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(keys + ["n"] + [f"p{p}_b{band}" for p in ps])
    )


def seg_left_fold(vals: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Strict LEFT-FOLD float sum per segment, vectorized ACROSS segments
    (ragged-column trick): step j adds element j of every still-active
    segment.  Reproducible by SQL ``list_reduce(list_prepend(0.0,
    list(x ORDER BY k)), (a,b) -> a+b)`` — unlike np.sum (pairwise) or an
    unordered SQL SUM."""
    acc = np.zeros(starts.shape[0])
    lens = ends - starts
    if lens.size == 0:
        return acc
    idx = np.arange(starts.shape[0])
    for j in range(int(lens.max())):
        idx = idx[lens[idx] > j]
        acc[idx] = acc[idx] + vals[starts[idx] + j]
    return acc


def _fit_partials(p: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    """(keys…, k, m, sy) rows SORTED by keys+[k] → one row per key group
    with n (exact int), phase, amplitude.

    k = (year−1970)·365 + (doy−1); t = k/365; y in exact scaled cents.
    Entries accumulate per distinct k in ascending-k left-fold order, the
    4×4 system is solved by the generated Cramer expressions (state/lsq.py)
    and phase = atan2(c_cos, c_sin) via math.atan2 (np.arctan2's SIMD path
    differs from libm — and thus from the DuckDB oracle — by 1 ulp).
    Amplitude is scaled ×0.01 back to band units (the fit is linear in y).
    """
    import math

    from ..state import lsq

    if len(p) == 0:
        return pd.DataFrame(
            {**{kk: [] for kk in keys}, "n": [], "phase": [], "amplitude": []}
        )
    kcols = [p[kk].to_numpy() for kk in keys]
    changed = np.zeros(len(p), dtype=bool)
    changed[0] = True
    for kc in kcols:
        changed[1:] |= kc[1:] != kc[:-1]
    starts = np.nonzero(changed)[0]
    ends = np.append(starts[1:], len(p))
    k = p["k"].to_numpy()
    t = k / 365.0
    w = lsq.TWO_PI * t
    c = np.cos(w)
    s = np.sin(w)
    m_f = p["m"].to_numpy().astype(np.float64)
    sy_f = p["sy"].to_numpy().astype(np.float64)
    terms = lsq.term_evaluator()(m_f, sy_f, t, c, s)
    sums = {
        name: seg_left_fold(np.asarray(arr, dtype=np.float64), starts, ends)
        for name, arr in zip(lsq.ENTRY_NAMES, terms)
    }
    det, det_c, det_s = lsq.harmonic4_solver()(**sums)
    with np.errstate(divide="ignore", invalid="ignore"):
        cc = det_c / det
        cs = det_s / det
        amp = np.sqrt(cc * cc + cs * cs) * 0.01
    ok = det != 0.0
    phase = np.array(
        [math.atan2(float(a), float(b)) if o else np.nan for a, b, o in zip(cc, cs, ok)]
    )
    mi = p["m"].to_numpy().astype(np.int64)
    csum = np.concatenate(([0], np.cumsum(mi)))
    out = {kk: kcols[i][starts] for i, kk in enumerate(keys)}
    out["n"] = csum[ends] - csum[starts]
    out["phase"] = np.where(ok, phase, np.nan)
    out["amplitude"] = np.where(ok, amp, np.nan)
    return pd.DataFrame(out)


def harmonic_fit(geo, keys=("cell_id", "year"), band: int = 3):
    """Per-key OLS harmonic fit y ~ constant + t + cos(2πt) + sin(2πt) over
    the exact scaled-cent band values; returns phase = atan2(c_cos, c_sin)
    and amplitude = √(c_cos² + c_sin²) in band units (argument order as in
    the reference, src/utils/harmonics.py:35-45).

    Bit-deterministic AND oracle-reproducible: per-(key, day) partials are
    exact integers, the normal-equation entries fold in ascending-day order,
    and the solve is the shared Cramer expression tree — so the result is
    identical under any partitioning and bit-equal to the DuckDB replay.
    Singular designs (degenerate time sampling) return NaN.
    """
    keys = list(keys)
    ycol = f"c{band}"
    nb = _default_buckets()
    cols = list(dict.fromkeys(keys + ["year", "doy", ycol]))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        k = (g["year"].to_numpy().astype(np.int64) - 1970) * 365 + (
            g["doy"].to_numpy().astype(np.int64) - 1
        )
        df = pd.DataFrame(
            {**{kk: g[kk].to_numpy() for kk in keys}, "k": k, "y": g[ycol].to_numpy()}
        )
        p = (
            df.groupby(keys + ["k"], as_index=False)
            .agg(m=("y", "size"), sy=("y", "sum"))
            .sort_values(keys + ["k"], kind="mergesort")
        )
        return _fit_partials(p, keys).rename(
            columns={"phase": f"b{band}_phase", "amplitude": f"b{band}_amplitude"}
        )

    return (
        _add_bucket(geo.select_columns(cols), keys, nb)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(keys + ["n", f"b{band}_phase", f"b{band}_amplitude"])
    )


def approx_percentiles(
    geo,
    keys=("cell_id", "year"),
    band: int = 3,
    ps=DEFAULT_PERCENTILES,
    bins: int = 4096,
    lo: float = 0.0,
    hi: float = 1_000_000.0,
    num_buckets: int | None = None,
    rows_hint: int | None = None,
):
    """APPROXIMATE grouped percentiles via a fixed-bin histogram sketch —
    the DECOMPOSABLE scale path for A1: per-batch partial (key, bin) counts
    → exact integer combine → quantile interpolation from the cumulative
    histogram.  No holistic per-group sort, no raw-row shuffle: shuffled
    rows ≈ keys × occupied bins, independent of observation count.

    Error bound: |approx − exact| ≤ 2·(hi − lo)/bins (the exact value
    interpolates BETWEEN ranks and can straddle a bin edge; default ≈
    488 cents ≈ 4.9 reflectance units).  Deterministic under any combine
    order (integer counts), unlike t-digest (merge-order-dependent).
    Output mirrors zonal_percentiles: keys…, n, p{P}_b{band} (bin lower
    edges at the quantile rank).
    """
    keys = list(keys)
    col = f"c{band}"
    width = (hi - lo) / bins

    def partial(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        tb = t.select(keys).append_column("bin", pa.array(b))
        out = tb.group_by(keys + ["bin"]).aggregate([([], "count_all")])
        return out.rename_columns(keys + ["bin", "cnt"])

    combined = bucketed_sum(
        geo.select_columns(keys + [col]).map_batches(partial, batch_format="pyarrow"),
        keys + ["bin"],
        ["cnt"],
        num_buckets=num_buckets,
    )

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(keys + ["bin"], kind="mergesort")
        kcols = [g[k].to_numpy() for k in keys]
        changed = np.zeros(len(g), dtype=bool)
        changed[0] = True
        for k in kcols:
            changed[1:] |= k[1:] != k[:-1]
        starts = np.nonzero(changed)[0]
        ends = np.append(starts[1:], len(g))
        cnt = g["cnt"].to_numpy()
        binv = g["bin"].to_numpy()
        out = {k: kcols[i][starts] for i, k in enumerate(keys)}
        n = np.array([cnt[s:e].sum() for s, e in zip(starts, ends)], dtype=np.int64)
        out["n"] = n
        for p in ps:
            vals = np.empty(starts.shape[0])
            for i, (s, e) in enumerate(zip(starts, ends)):
                c = np.cumsum(cnt[s:e])
                rank = (n[i] - 1) * (p / 100.0)
                j = int(np.searchsorted(c, np.floor(rank) + 1))
                j = min(j, e - s - 1)
                vals[i] = lo + binv[s + j] * width
            out[f"p{p}_b{band}"] = vals
        return pd.DataFrame(out)

    nb = num_buckets or _default_buckets()
    return (
        _add_bucket(combined, keys, nb)
        .groupby("bucket")
        .map_groups(finalize, batch_format="pandas")
        .select_columns(keys + ["n"] + [f"p{p}_b{band}" for p in ps])
    )


def harmonic_fit_modes(geo, keys=("tile_id", "year"), band: int = 3, modes=(1, 2, 3)):
    """General harmonicsList fit (src/utils/harmonics.py:88-124 analog):
    y ~ constant + t + Σ_k [cos(2πkt) + sin(2πkt)] for every mode k in
    ``modes``; outputs per-mode ``phase_k`` / ``amplitude_k`` plus
    ``peak_doy`` — the day the mode-1 seasonal term peaks (the reference's
    phase→date conversion).

    Bucketed map_groups + per-group lstsq (2+2K unknowns); deterministic via
    sorted in-group row order.  No SQL oracle (pivoted least squares is not
    SQL-reproducible) — covered by unit tests against planted signals.
    """
    keys = list(keys)
    ycol = f"c{band}"
    nb = _default_buckets()
    modes = tuple(modes)
    cols = list(dict.fromkeys(keys + ["year", "doy", ycol]))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        k = (g["year"].to_numpy().astype(np.int64) - 1970) * 365 + (
            g["doy"].to_numpy().astype(np.int64) - 1
        )
        g = g.assign(_k=k).sort_values(keys + ["_k"], kind="mergesort")
        kcols = [g[kk].to_numpy() for kk in keys]
        changed = np.zeros(len(g), dtype=bool)
        changed[0] = True
        for kc in kcols:
            changed[1:] |= kc[1:] != kc[:-1]
        starts = np.nonzero(changed)[0]
        ends = np.append(starts[1:], len(g))
        t = g["_k"].to_numpy() / 365.0
        y = g[ycol].to_numpy(dtype=np.float64) * 0.01
        out = {kk: kcols[i][starts] for i, kk in enumerate(keys)}
        per_mode = {m: (np.empty(len(starts)), np.empty(len(starts))) for m in modes}
        peak = np.empty(len(starts))
        for i, (s, e) in enumerate(zip(starts, ends)):
            ts, ys = t[s:e], y[s:e]
            X = [np.ones_like(ts), ts]
            for m in modes:
                w = 2.0 * np.pi * m * ts
                X += [np.cos(w), np.sin(w)]
            X = np.stack(X, axis=1)
            if ts.shape[0] < X.shape[1] or np.linalg.matrix_rank(X) < X.shape[1]:
                for m in modes:
                    per_mode[m][0][i] = np.nan
                    per_mode[m][1][i] = np.nan
                peak[i] = np.nan
                continue
            coef = np.linalg.lstsq(X, ys, rcond=None)[0]
            for mi, m in enumerate(modes):
                cc, ss_ = coef[2 + 2 * mi], coef[3 + 2 * mi]
                per_mode[m][0][i] = np.arctan2(cc, ss_)
                per_mode[m][1][i] = np.hypot(cc, ss_)
            # mode-1 peak: A·cos(w) + B·sin(w) maximal at w = atan2(B, A)
            m0 = modes[0]
            a0, b0 = coef[2], coef[3]
            w_peak = np.arctan2(b0, a0) / m0
            peak[i] = (w_peak / (2.0 * np.pi) % 1.0) * 365.0 + 1.0
        for m in modes:
            out[f"phase_{m}"] = per_mode[m][0]
            out[f"amplitude_{m}"] = per_mode[m][1]
        out["peak_doy"] = peak
        out["n"] = (ends - starts).astype(np.int64)
        return pd.DataFrame(out)

    out_cols = keys + ["n"] + [
        f"{p}_{m}" for m in modes for p in ("phase", "amplitude")
    ] + ["peak_doy"]
    return (
        _add_bucket(geo.select_columns(cols), keys, nb)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(out_cols)
    )


def solve_harmonic(t: np.ndarray, y: np.ndarray) -> tuple[float, float]:
    """Fixed-order normal-equation solve shared by engine and test oracle."""
    w = 2.0 * np.pi * t
    X = np.stack([np.ones_like(t), t, np.cos(w), np.sin(w)], axis=1)
    xtx = X.T @ X
    xty = X.T @ y
    try:
        coef = np.linalg.solve(xtx, xty)
    except np.linalg.LinAlgError:
        return float("nan"), float("nan")
    c_cos, c_sin = float(coef[2]), float(coef[3])
    return float(np.arctan2(c_cos, c_sin)), float(np.hypot(c_cos, c_sin))


def area_by_class(tile_labels, level: int):
    """tile_labels (tile_id, year, LANDCOVER) → per-class tile counts + area
    (A10).  Both exact: per-tile areas are rounded to whole m² (error ≤0.5 m²
    on ~10⁶ m² tiles) and summed as int64, so the result is bit-identical
    under any combine order / parallelism (the determinism rule — float64
    Sum with free combine order drifts in the last ulps)."""

    def partial(t: pa.Table) -> pa.Table:
        lc = t.column("LANDCOVER").to_numpy(zero_copy_only=False)
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        area = np.rint(cell_area_m2(tid, level)).astype(np.int64)
        df = pd.DataFrame({"LANDCOVER": lc, "n_tiles": 1, "area_m2": area})
        out = df.groupby("LANDCOVER", as_index=False).agg(
            n_tiles=("n_tiles", "sum"), area_m2=("area_m2", "sum")
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (
        tile_labels.map_batches(partial, batch_format="pyarrow")
        .groupby("LANDCOVER")
        .aggregate(Sum("n_tiles", alias_name="n_tiles"), Sum("area_m2", alias_name="area_m2"))
    )
    return agg


def harmonic_rgb(ds, phase_col: str = "b3_phase", amp_col: str = "b3_amplitude"):
    """HSV→RGB display transform of harmonic (phase, amplitude) — the
    reference's ``harmonicRGB`` (src/utils/harmonics.py:49-60): hue =
    phase unit-scaled from [-π, π] (clamped, as ``ee.Image.unitScale``
    clamps), saturation = amplitude × 2.5 clamped to [0, 1], value = 1,
    then the standard six-sector HSV→RGB conversion.  Stateless per-batch
    numpy; every arithmetic op mirrors the SQL oracle's expression tree
    IEEE-exactly.  Appends r, g, b columns."""

    def fn(t: pa.Table) -> pa.Table:
        ph = t.column(phase_col).to_numpy(zero_copy_only=False).astype(np.float64)
        am = t.column(amp_col).to_numpy(zero_copy_only=False).astype(np.float64)
        h = np.minimum(np.maximum((ph + np.pi) / (2 * np.pi), 0.0), 1.0)
        s = np.minimum(np.maximum(am * 2.5, 0.0), 1.0)
        h6 = h * 6.0
        fi = np.floor(h6)
        i = fi.astype(np.int64) % 6
        f = h6 - fi
        p = 1.0 - s
        q = 1.0 - f * s
        tt = 1.0 - (1.0 - f) * s
        one = np.ones_like(h)
        sect = [i == k for k in range(6)]
        r = np.select(sect, [one, q, p, p, tt, one])
        g = np.select(sect, [tt, one, one, q, p, p])
        b = np.select(sect, [p, p, tt, one, one, q])
        return (
            t.append_column("r", pa.array(r))
            .append_column("g", pa.array(g))
            .append_column("b", pa.array(b))
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def value_histogram(
    ds,
    col: str,
    lo: float,
    hi: float,
    nbins: int = 32,
    rows_hint: int | None = None,
):
    """Fixed-width histogram of a numeric column — the distribution
    profile a pipeline logs before choosing filter thresholds.  Per-batch
    integer bin counts (≤ nbins rows leave each block) + the bucketed
    combine; out-of-range values clamp to the edge bins, so counts always
    sum to the row count.  bin = clamp(floor((x − lo)/w), 0, nbins−1)
    with w = (hi − lo)/nbins — the identical double expression the SQL
    oracle evaluates.  Returns Dataset[bin, n]."""
    import pyarrow.compute as pc  # noqa: F401

    w = (hi - lo) / nbins

    def partial(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(np.floor((x - lo) / w), 0, nbins - 1).astype(np.int64)
        bins, counts = np.unique(b, return_counts=True)
        return pa.table(
            {"bin": pa.array(bins), "n": pa.array(counts.astype(np.int64))}
        )

    return bucketed_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bin"],
        ["n"],
        recombine_batch_size=None,
        rows_hint=rows_hint,
    )


def value_histogram_sql(
    rows_sql: str, col: str, lo: float, hi: float, nbins: int = 32
) -> str:
    """Oracle: same clamp/floor double expression, exact counts."""
    w = (hi - lo) / nbins
    return f"""
        SELECT CAST(LEAST(GREATEST(floor(({col} - {lo!r}) / {w!r}), 0),
                    {nbins - 1}) AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM ({rows_sql}) GROUP BY 1"""


def kring_smooth(geo, band: int = 3, k: int = 1):
    """Focal (k-ring) smoothing over the zonal cell grid — the cell-table
    analog of the reference's reduceNeighborhood mean (A8,
    src/utils/covariates.py focal reducers): each OCCUPIED cell's band mean
    recomputed over all observations falling in its (2k+1)² Chebyshev
    neighborhood, clipped at the grid boundary.

    Output: (cell_id, nbr_n:int64, smooth_b{band}:f64) — nbr_n the window
    observation count, the mean a single correctly-rounded double division
    of exact integer sums (identical expression in SQL).

    Scale shape: the raw-observation groupby reuses the two-phase
    ``bucketed_sum`` (a hot cell is one partial row per batch); everything
    downstream runs on the CELL table, whose row count is bounded by the
    AOI grid (≤4^CELL_LEVEL), independent of corpus size.  The neighbor
    fan-out is a stateless (2k+1)²-way map with NO occupancy join: the
    dx=dy=0 copy carries an ``is_self`` marker, so restricting output to
    occupied cells happens inside the same bucketed re-aggregation
    (HAVING Σis_self > 0) — one extra skinny shuffle total, zero joins.
    """
    from ..state.cells import CELL_LEVEL, decode, morton

    s_col = f"s_c{band}"
    cellsums = zonal_sums(geo, keys=["cell_id"], bands=(band,))
    offsets = [(dx, dy) for dx in range(-k, k + 1) for dy in range(-k, k + 1)]
    n_grid = np.int64(1) << CELL_LEVEL

    def fan(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = decode(cid, CELL_LEVEL)
        parts = []
        for dx, dy in offsets:
            tx, ty = ix + dx, iy + dy
            m = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
            parts.append(
                pa.table(
                    {
                        "cell_id": pa.array(morton(tx[m], ty[m]), type=pa.int64()),
                        "n": pa.array(n[m]),
                        s_col: pa.array(s[m]),
                        "is_self": pa.array(
                            np.full(
                                int(m.sum()),
                                1 if (dx == 0 and dy == 0) else 0,
                                dtype=np.int64,
                            )
                        ),
                    }
                )
            )
        return pa.concat_tables(parts)

    fanned = cellsums.map_batches(fan, batch_format="pyarrow")
    agg = bucketed_sum(
        fanned, ["cell_id"], ["n", s_col, "is_self"], recombine_batch_size=None
    )

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.greater(t.column("is_self"), 0))
        nn = pc.cast(t.column("n"), pa.float64())
        sm = pc.divide(
            pc.cast(t.column(s_col), pa.float64()), pc.multiply(nn, 100.0)
        )
        return pa.table(
            {
                "cell_id": t.column("cell_id"),
                "nbr_n": t.column("n"),
                f"smooth_b{band}": sm,
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def kring_smooth_sql(cells_sql: str, band: int = 3, k: int = 1) -> str:
    """Oracle twin of ``kring_smooth``: same decode → offset fan-out →
    re-encode → HAVING Σis_self filter, exact integer sums, identical
    final division expression.  Returns a CTE-chain fragment + final
    SELECT, to be appended after the caller's ``WITH {geo}, {cells},``."""
    from ..state.cells import CELL_LEVEL, morton_decode_sql_expr, morton_sql_expr

    hi = (1 << CELL_LEVEL) - 1
    ds_vals = ", ".join(str(d) for d in range(-k, k + 1))
    return f"""
        kr_agg AS (
            SELECT cell_id, COUNT(*) AS n, SUM(c{band}) AS s
            FROM ({cells_sql}) GROUP BY cell_id
        ),
        kr_dec AS (
            SELECT cell_id, n, s,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "x")} AS ix,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "y")} AS iy
            FROM kr_agg
        ),
        kr_offs AS (
            SELECT ox.d AS dx, oy.d AS dy
            FROM (SELECT unnest([{ds_vals}]) AS d) ox,
                 (SELECT unnest([{ds_vals}]) AS d) oy
        ),
        kr_fan AS (
            SELECT {morton_sql_expr("(d.ix + o.dx)", "(d.iy + o.dy)", CELL_LEVEL)}
                       AS cell_id,
                   d.n, d.s,
                   CASE WHEN o.dx = 0 AND o.dy = 0 THEN 1 ELSE 0 END AS is_self
            FROM kr_dec d CROSS JOIN kr_offs o
            WHERE d.ix + o.dx BETWEEN 0 AND {hi}
              AND d.iy + o.dy BETWEEN 0 AND {hi}
        )
        SELECT cell_id, CAST(SUM(n) AS BIGINT) AS nbr_n,
               CAST(SUM(s) AS DOUBLE) / (CAST(SUM(n) AS DOUBLE) * 100)
                   AS smooth_b{band}
        FROM kr_fan GROUP BY cell_id HAVING SUM(is_self) > 0"""


TREND_BASE_YEAR = 2000  # x = year − base, pinned on both sides: keeps the
# Σxy / Σx² partials small (x ≤ ~30) so int64 holds corpus-scale sums


def cell_trend(geo, band: int = 3):
    """Per-cell temporal trend: the OLS slope of band value (cents) against
    year — the land-degradation / greening trend analysis the reference's
    harmonic regression family feeds (A2; src/utils/harmonics.py).  Cells
    with a single observed year (zero variance in x) are excluded on both
    sides.

    Exactness: the five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are
    integer sums (x = year − {base}, y = cents) → order-free under any
    blocking; the slope is one pinned double expression
    (n·Σxy − Σx·Σy)/(n·Σx² − Σx²) evaluated identically in SQL.

    Scale shape: the same two-phase bucketed_sum as every zonal aggregate —
    a hot cell is one partial row per batch; the slope finalize runs on the
    bounded cell table.
    """
    s_col = f"c{band}"

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        x = (
            t.column("year").to_numpy(zero_copy_only=False).astype(np.int64)
            - TREND_BASE_YEAR
        )
        y = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        aug = pa.table(
            {
                "cell_id": t.column("cell_id"),
                "x": pa.array(x),
                "y": pa.array(y),
                "xy": pa.array(x * y),
                "xx": pa.array(x * x),
            }
        )
        out = aug.group_by(["cell_id"]).aggregate(
            [("x", "sum"), ("y", "sum"), ("xy", "sum"), ("xx", "sum"), ("x", "count")]
        )
        return out.rename_columns(["cell_id", "sx", "sy", "sxy", "sxx", "n"])

    agg = bucketed_sum(
        geo.map_batches(partial, batch_format="pyarrow"),
        ["cell_id"],
        ["sx", "sy", "sxy", "sxx", "n"],
        recombine_batch_size=None,
    )

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        f = {
            c: t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            for c in ("n", "sx", "sy", "sxy", "sxx")
        }
        den = f["n"] * f["sxx"] - f["sx"] * f["sx"]
        keep = den != 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = (f["n"] * f["sxy"] - f["sx"] * f["sy"]) / den
        return pa.table(
            {
                "cell_id": t.column("cell_id").filter(pa.array(keep)),
                "n": t.column("n").filter(pa.array(keep)),
                f"slope_b{band}": pa.array(slope[keep]),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def cell_trend_sql(cells_sql: str, band: int = 3) -> str:
    """Oracle twin: identical integer sufficient statistics and the same
    double slope expression; single-year cells excluded by the same
    double-evaluated denominator test."""
    b = TREND_BASE_YEAR
    return f"""
        ct_s AS (
            SELECT cell_id,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM("year" - {b}) AS BIGINT) AS sx,
                   CAST(SUM(c{band}) AS BIGINT) AS sy,
                   CAST(SUM(("year" - {b}) * c{band}) AS BIGINT) AS sxy,
                   CAST(SUM(("year" - {b}) * ("year" - {b})) AS BIGINT) AS sxx
            FROM ({cells_sql}) GROUP BY cell_id
        )
        SELECT cell_id, n,
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope_b{band}
        FROM ct_s
        WHERE (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) != 0.0"""


MORAN_SCALE_INT = 1 << 40  # quantization of the z·z cross-product terms


def morans_i(geo, band: int = 3, k: int = 1):
    """Global Moran's I spatial autocorrelation of the per-cell band total
    over the (2k+1)²−1 Chebyshev neighborhood (w_ij = 1 for neighbors,
    0 otherwise) — the standard clustering-vs-dispersion diagnostic for a
    gridded field (positive ≈ clustered, ~0 random, negative dispersed).

      I = (N / W) · Σ_ij z_i z_j / Σ_i z_i²,   z_i = (v_i − v̄) / v̄

    (dividing z by v̄ is a no-op for I — it cancels — but keeps the
    quantized integers small at any corpus scale).

    Exactness: v_i are exact per-cell integer cent sums; v̄ = Σv/N is one
    double division; every z·z and z² term quantizes to floor(·2⁴⁰) int64
    so the big sums are order-free; the final I is one pinned double
    expression.  Scale shape: everything after the raw-observation
    ``zonal_sums`` runs on the AOI-bounded cell table — an 8-way neighbor
    fan-out, ONE bounded hash join (pairs ⋈ cell values), and tiny int
    partials to the driver.

    Output: one row (n_cells:int64, w_pairs:int64, num_q:int64,
    den_q:int64, moran:f64).
    """
    import ray
    import ray.data as rd

    from ..runtime import join_partitions
    from ..state.cells import CELL_LEVEL, decode, morton

    s_col = f"s_c{band}"
    cellsums = zonal_sums(geo, keys=["cell_id"], bands=(band,)).materialize()

    tot = cellsums.map_batches(
        lambda t: pa.table(
            {
                "n_cells": pa.array(
                    [len(t)], pa.int64()
                ),
                "v_sum": pa.array(
                    [int(t.column(s_col).to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    n_cells = int(tot["n_cells"].sum())
    v_sum = int(tot["v_sum"].sum())
    if n_cells == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "n_cells": pa.array([], pa.int64()),
                    "w_pairs": pa.array([], pa.int64()),
                    "num_q": pa.array([], pa.int64()),
                    "den_q": pa.array([], pa.int64()),
                    "moran": pa.array([], pa.float64()),
                }
            )
        )
    vbar = float(v_sum) / float(n_cells)
    scale = float(MORAN_SCALE_INT)
    n_grid = np.int64(1) << CELL_LEVEL
    offsets = [
        (dx, dy)
        for dx in range(-k, k + 1)
        for dy in range(-k, k + 1)
        if not (dx == 0 and dy == 0)
    ]

    def fan(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        v = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = decode(cid, CELL_LEVEL)
        parts = []
        for dx, dy in offsets:
            tx, ty = ix + dx, iy + dy
            m = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
            parts.append(
                pa.table(
                    {
                        "cell_id": pa.array(morton(tx[m], ty[m]), type=pa.int64()),
                        "v_src": pa.array(v[m]),
                    }
                )
            )
        return pa.concat_tables(parts)

    fanned = cellsums.map_batches(fan, batch_format="pyarrow")

    # attach v_tgt by BROADCAST lookup, not a hash join: the cell table is
    # AOI-grid-bounded (≤4^CELL_LEVEL rows — the kring_smooth occupancy
    # argument), and Dataset.join's shuffle overhead dominated the bench
    # (18.7 s → the fan+lookup path) while a sorted-array probe is O(log n)
    # per pair inside the batch
    cells_pd = cellsums.to_pandas()
    ckeys = cells_pd["cell_id"].to_numpy(np.int64)
    cvals = cells_pd[s_col].to_numpy(np.int64)
    corder = np.argsort(ckeys, kind="mergesort")
    side_ref = ray.put({"k": ckeys[corder], "v": cvals[corder]})

    def pair_partial(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        tgt = t.column("cell_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(side["k"], tgt)
        pos = np.minimum(pos, len(side["k"]) - 1)
        hit = side["k"][pos] == tgt
        a = (
            t.column("v_src")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)[hit]
        )
        b = side["v"][pos[hit]].astype(np.float64)
        za = (a - vbar) / vbar
        zb = (b - vbar) / vbar
        q = np.floor((za * zb) * scale).astype(np.int64)
        return pa.table(
            {
                "num_q": pa.array([int(q.sum())], pa.int64()),
                "w": pa.array([int(hit.sum())], pa.int64()),
            }
        )

    pp = fanned.map_batches(pair_partial, batch_format="pyarrow").to_pandas()
    num_q = int(pp["num_q"].sum())
    w_pairs = int(pp["w"].sum())

    def den_partial(t: pa.Table) -> pa.Table:
        v = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.float64)
        z = (v - vbar) / vbar
        q = np.floor((z * z) * scale).astype(np.int64)
        return pa.table({"den_q": pa.array([int(q.sum())], pa.int64())})

    dq = cellsums.map_batches(den_partial, batch_format="pyarrow").to_pandas()
    den_q = int(dq["den_q"].sum())
    moran = (float(n_cells) / float(w_pairs)) * (float(num_q) / float(den_q))
    return rd.from_arrow(
        pa.table(
            {
                "n_cells": pa.array([n_cells], pa.int64()),
                "w_pairs": pa.array([w_pairs], pa.int64()),
                "num_q": pa.array([num_q], pa.int64()),
                "den_q": pa.array([den_q], pa.int64()),
                "moran": pa.array([moran], pa.float64()),
            }
        )
    )


def morans_i_sql(cells_sql: str, band: int = 3, k: int = 1) -> str:
    """Oracle twin: same decode → neighbor fan-out → re-encode → join →
    quantized term sums → pinned final expression.  Returns a CTE-chain
    fragment + final SELECT for a caller's ``WITH {geo}, {cells},``."""
    from ..state.cells import CELL_LEVEL, morton_decode_sql_expr, morton_sql_expr

    hi = (1 << CELL_LEVEL) - 1
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in range(-k, k + 1)
        for dy in range(-k, k + 1)
        if not (dx == 0 and dy == 0)
    )
    S = float(MORAN_SCALE_INT)
    return f"""
        mi_agg AS MATERIALIZED (
            SELECT cell_id, CAST(SUM(c{band}) AS BIGINT) AS v
            FROM ({cells_sql}) GROUP BY cell_id
        ),
        mi_tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS vbar
            FROM mi_agg
        ),
        mi_dec AS (
            SELECT cell_id, v,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "x")} AS ix,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "y")} AS iy
            FROM mi_agg
        ),
        mi_offs AS (SELECT * FROM (VALUES {offs}) AS t(dx, dy)),
        mi_fan AS (
            SELECT {morton_sql_expr("(d.ix + o.dx)", "(d.iy + o.dy)", CELL_LEVEL)}
                       AS cell_id,
                   d.v AS v_src
            FROM mi_dec d CROSS JOIN mi_offs o
            WHERE d.ix + o.dx BETWEEN 0 AND {hi}
              AND d.iy + o.dy BETWEEN 0 AND {hi}
        ),
        mi_pairs AS (
            SELECT f.v_src, a.v AS v_tgt FROM mi_fan f
            JOIN mi_agg a ON f.cell_id = a.cell_id
        ),
        mi_num AS (
            SELECT CAST(SUM(CAST(floor(
                       (((CAST(v_src AS DOUBLE) - t.vbar) / t.vbar)
                        * ((CAST(v_tgt AS DOUBLE) - t.vbar) / t.vbar))
                       * {S!r}) AS BIGINT)) AS BIGINT) AS num_q,
                   CAST(COUNT(*) AS BIGINT) AS w_pairs
            FROM mi_pairs CROSS JOIN mi_tot t
        ),
        mi_den AS (
            SELECT CAST(SUM(CAST(floor(
                       (((CAST(v AS DOUBLE) - t.vbar) / t.vbar)
                        * ((CAST(v AS DOUBLE) - t.vbar) / t.vbar))
                       * {S!r}) AS BIGINT)) AS BIGINT) AS den_q
            FROM mi_agg CROSS JOIN mi_tot t
        )
        SELECT t.n_cells, n.w_pairs, n.num_q, d.den_q,
               (CAST(t.n_cells AS DOUBLE) / CAST(n.w_pairs AS DOUBLE))
               * (CAST(n.num_q AS DOUBLE) / CAST(d.den_q AS DOUBLE)) AS moran
        FROM mi_tot t, mi_num n, mi_den d"""


def gearys_c(geo, band: int = 3, k: int = 1):
    """Global Geary's C spatial autocorrelation of the per-cell band total
    — the difference-based companion of :func:`morans_i` (C < 1 clustered,
    ≈1 random, > 1 dispersed; C weights LOCAL contrasts where Moran
    weights covariance with the mean, so the pair is the standard
    two-statistic report for a gridded field):

      C = ((N−1) / (2W)) · Σ_ij w_ij (v_i − v_j)² / Σ_i (v_i − v̄)²

    over the same (2k+1)²−1 Chebyshev neighborhood, DIRECTED pair sums on
    both axes (W counts directed pairs; the classic Σ_ij form).

    Exactness (the morans_i discipline verbatim): v_i exact int64 cent
    sums; v̄ one double division; every pair term quantizes as
    ⌊((v_i−v_j)/v̄)²·2⁴⁰⌋ int64 (scaling by v̄ cancels between numerator
    and denominator but keeps the integers bounded), the denominator
    reuses the ⌊z²·2⁴⁰⌋ sum, and the final C is ONE pinned double
    expression ((N−1)/(2W))·(num/den).

    Scale shape: identical to morans_i — corpus-sized work is only the
    zonal_sums reduce; the fan + broadcast sorted-array probe + skinny
    int partials all run on the AOI-bounded cell table.

    Output: one row (n_cells:int64, w_pairs:int64, num_q:int64,
    den_q:int64, geary:f64).
    """
    import ray
    import ray.data as rd

    from ..state.cells import CELL_LEVEL, decode, morton

    s_col = f"s_c{band}"
    cellsums = zonal_sums(geo, keys=["cell_id"], bands=(band,)).materialize()

    tot = cellsums.map_batches(
        lambda t: pa.table(
            {
                "n_cells": pa.array([len(t)], pa.int64()),
                "v_sum": pa.array(
                    [int(t.column(s_col).to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    n_cells = int(tot["n_cells"].sum())
    v_sum = int(tot["v_sum"].sum())
    if n_cells == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "n_cells": pa.array([], pa.int64()),
                    "w_pairs": pa.array([], pa.int64()),
                    "num_q": pa.array([], pa.int64()),
                    "den_q": pa.array([], pa.int64()),
                    "geary": pa.array([], pa.float64()),
                }
            )
        )
    vbar = float(v_sum) / float(n_cells)
    scale = float(MORAN_SCALE_INT)
    n_grid = np.int64(1) << CELL_LEVEL
    offsets = [
        (dx, dy)
        for dx in range(-k, k + 1)
        for dy in range(-k, k + 1)
        if not (dx == 0 and dy == 0)
    ]

    def fan(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        v = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = decode(cid, CELL_LEVEL)
        parts = []
        for dx, dy in offsets:
            tx, ty = ix + dx, iy + dy
            m = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
            parts.append(
                pa.table(
                    {
                        "cell_id": pa.array(morton(tx[m], ty[m]), type=pa.int64()),
                        "v_src": pa.array(v[m]),
                    }
                )
            )
        return pa.concat_tables(parts)

    fanned = cellsums.map_batches(fan, batch_format="pyarrow")

    cells_pd = cellsums.to_pandas()
    ckeys = cells_pd["cell_id"].to_numpy(np.int64)
    cvals = cells_pd[s_col].to_numpy(np.int64)
    corder = np.argsort(ckeys, kind="mergesort")
    side_ref = ray.put({"k": ckeys[corder], "v": cvals[corder]})

    def pair_partial(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        tgt = t.column("cell_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(side["k"], tgt)
        pos = np.minimum(pos, len(side["k"]) - 1)
        hit = side["k"][pos] == tgt
        a = (
            t.column("v_src")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)[hit]
        )
        b = side["v"][pos[hit]].astype(np.float64)
        d = (a - b) / vbar
        q = np.floor((d * d) * scale).astype(np.int64)
        return pa.table(
            {
                "num_q": pa.array([int(q.sum())], pa.int64()),
                "w": pa.array([int(hit.sum())], pa.int64()),
            }
        )

    pp = fanned.map_batches(pair_partial, batch_format="pyarrow").to_pandas()
    num_q = int(pp["num_q"].sum())
    w_pairs = int(pp["w"].sum())

    def den_partial(t: pa.Table) -> pa.Table:
        v = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.float64)
        z = (v - vbar) / vbar
        q = np.floor((z * z) * scale).astype(np.int64)
        return pa.table({"den_q": pa.array([int(q.sum())], pa.int64())})

    dq = cellsums.map_batches(den_partial, batch_format="pyarrow").to_pandas()
    den_q = int(dq["den_q"].sum())
    geary = (float(n_cells - 1) / (2.0 * float(w_pairs))) * (
        float(num_q) / float(den_q)
    )
    return rd.from_arrow(
        pa.table(
            {
                "n_cells": pa.array([n_cells], pa.int64()),
                "w_pairs": pa.array([w_pairs], pa.int64()),
                "num_q": pa.array([num_q], pa.int64()),
                "den_q": pa.array([den_q], pa.int64()),
                "geary": pa.array([geary], pa.float64()),
            }
        )
    )


def gearys_c_sql(cells_sql: str, band: int = 3, k: int = 1) -> str:
    """Oracle twin of :func:`gearys_c` — the morans_i_sql chain with the
    squared-difference pair kernel and the ((N−1)/(2W))·(num/den) final
    expression.  CTE-chain fragment for a caller's ``WITH {geo}, {cells},``."""
    from ..state.cells import CELL_LEVEL, morton_decode_sql_expr, morton_sql_expr

    hi = (1 << CELL_LEVEL) - 1
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in range(-k, k + 1)
        for dy in range(-k, k + 1)
        if not (dx == 0 and dy == 0)
    )
    S = float(MORAN_SCALE_INT)
    return f"""
        gc_agg AS MATERIALIZED (
            SELECT cell_id, CAST(SUM(c{band}) AS BIGINT) AS v
            FROM ({cells_sql}) GROUP BY cell_id
        ),
        gc_tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS vbar
            FROM gc_agg
        ),
        gc_dec AS (
            SELECT cell_id, v,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "x")} AS ix,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "y")} AS iy
            FROM gc_agg
        ),
        gc_offs AS (SELECT * FROM (VALUES {offs}) AS t(dx, dy)),
        gc_fan AS (
            SELECT {morton_sql_expr("(d.ix + o.dx)", "(d.iy + o.dy)", CELL_LEVEL)}
                       AS cell_id,
                   d.v AS v_src
            FROM gc_dec d CROSS JOIN gc_offs o
            WHERE d.ix + o.dx BETWEEN 0 AND {hi}
              AND d.iy + o.dy BETWEEN 0 AND {hi}
        ),
        gc_pairs AS (
            SELECT f.v_src, a.v AS v_tgt FROM gc_fan f
            JOIN gc_agg a ON f.cell_id = a.cell_id
        ),
        gc_num AS (
            SELECT CAST(SUM(CAST(floor(
                       ((((CAST(v_src AS DOUBLE) - CAST(v_tgt AS DOUBLE))
                          / t.vbar)
                        * ((CAST(v_src AS DOUBLE) - CAST(v_tgt AS DOUBLE))
                          / t.vbar)))
                       * {S!r}) AS BIGINT)) AS BIGINT) AS num_q,
                   CAST(COUNT(*) AS BIGINT) AS w_pairs
            FROM gc_pairs CROSS JOIN gc_tot t
        ),
        gc_den AS (
            SELECT CAST(SUM(CAST(floor(
                       (((CAST(v AS DOUBLE) - t.vbar) / t.vbar)
                        * ((CAST(v AS DOUBLE) - t.vbar) / t.vbar))
                       * {S!r}) AS BIGINT)) AS BIGINT) AS den_q
            FROM gc_agg CROSS JOIN gc_tot t
        )
        SELECT t.n_cells, n.w_pairs, n.num_q, d.den_q,
               (CAST(t.n_cells - 1 AS DOUBLE)
                    / (2.0 * CAST(n.w_pairs AS DOUBLE)))
               * (CAST(n.num_q AS DOUBLE) / CAST(d.den_q AS DOUBLE)) AS geary
        FROM gc_tot t, gc_num n, gc_den d"""


def local_morans(geo, band: int = 3, k: int = 1):
    """Local Moran's I (LISA, Anselin 1995) per occupied grid cell — the
    hotspot/coldspot map the global ``morans_i`` statistic summarizes:

      I_i = z_i · Σ_j w_ij z_j / m2,   m2 = Σ z² / N,
      z_i = (v_i − v̄) / v̄

    with the standard quadrant label: HH (high value, high-value
    neighborhood — hotspot core), LL (coldspot), HL / LH (spatial
    outliers).  Reference analog: the per-pixel neighborhood diagnostics
    the reference derives from its assemblage rasters (`src/utils/`
    focal + zonal stack) — LISA is the canonical "which cells drive the
    clustering" follow-up to global Moran.

    Exactness contract (the morans_i discipline, extended per-cell):
      * v_i = exact int64 cent sums (zonal_sums);
      * every pair term floor-quantizes: li_q_i = Σ_j ⌊z_i z_j · 2⁴⁰⌋
        (int64, order-free under any combine order);
      * the quadrant is decided by PURE INTEGER comparisons — z_i > 0 ⟺
        v_i·N > Σv and lag_i > 0 ⟺ N·Σ_j v_j > w_i·Σv — so the label
        never touches a float;
      * local_i = li_q·N / den_q is ONE pinned double expression over
        int64 inputs (den_q = Σ⌊z²·2⁴⁰⌋ global).

    Scale shape: identical to morans_i — the only corpus-sized pass is
    the zonal_sums reduce; everything after runs on the AOI-bounded cell
    table (8-way fan + broadcast sorted-array probe + bucketed int sums).
    Cells with zero OCCUPIED neighbors are omitted (no pairs ⇒ no lag;
    the SQL twin's inner join drops them identically).

    Output: (cell_id:int64, w:int64 neighbor count, li_q:int64,
    quad:string, local_i:f64).
    """
    import ray
    import ray.data as rd

    from ..state.cells import CELL_LEVEL, decode, morton

    s_col = f"s_c{band}"
    cellsums = zonal_sums(geo, keys=["cell_id"], bands=(band,)).materialize()

    cells_pd = cellsums.to_pandas()
    empty = pa.table(
        {
            "cell_id": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64()),
            "li_q": pa.array([], pa.int64()),
            "quad": pa.array([], pa.string()),
            "local_i": pa.array([], pa.float64()),
        }
    )
    if len(cells_pd) == 0:
        return rd.from_arrow(empty)
    n_cells = int(len(cells_pd))
    v_sum = int(cells_pd[s_col].sum())
    vbar = float(v_sum) / float(n_cells)
    scale = float(MORAN_SCALE_INT)

    def den_partial(t: pa.Table) -> pa.Table:
        v = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.float64)
        z = (v - vbar) / vbar
        q = np.floor((z * z) * scale).astype(np.int64)
        return pa.table({"den_q": pa.array([int(q.sum())], pa.int64())})

    dq = cellsums.map_batches(den_partial, batch_format="pyarrow").to_pandas()
    den_q = int(dq["den_q"].sum())

    n_grid = np.int64(1) << CELL_LEVEL
    offsets = [
        (dx, dy)
        for dx in range(-k, k + 1)
        for dy in range(-k, k + 1)
        if not (dx == 0 and dy == 0)
    ]

    def fan(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        v = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        parts = []
        ix, iy = decode(cid, CELL_LEVEL)
        for dx, dy in offsets:
            tx, ty = ix + dx, iy + dy
            m = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
            parts.append(
                pa.table(
                    {
                        "cell_id": pa.array(morton(tx[m], ty[m]), type=pa.int64()),
                        "v_src": pa.array(v[m]),
                    }
                )
            )
        return pa.concat_tables(parts)

    fanned = cellsums.map_batches(fan, batch_format="pyarrow")

    ckeys = cells_pd["cell_id"].to_numpy(np.int64)
    cvals = cells_pd[s_col].to_numpy(np.int64)
    corder = np.argsort(ckeys, kind="mergesort")
    side_ref = ray.put({"k": ckeys[corder], "v": cvals[corder]})

    def pair_partial(t: pa.Table) -> pa.Table:
        # target-cell lookup (sorted probe, exact-hit verified), per-pair
        # quantized term, then an IN-BATCH group-by so only (cell, partial)
        # skinny rows enter the bucketed combine
        side = ray.get(side_ref)
        tgt = t.column("cell_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(side["k"], tgt)
        pos = np.minimum(pos, len(side["k"]) - 1)
        hit = side["k"][pos] == tgt
        cid = tgt[hit]
        v_src = t.column("v_src").to_numpy(zero_copy_only=False).astype(np.int64)[hit]
        v_tgt = side["v"][pos[hit]]
        za = (v_tgt.astype(np.float64) - vbar) / vbar
        zb = (v_src.astype(np.float64) - vbar) / vbar
        q = np.floor((za * zb) * scale).astype(np.int64)
        part = pa.table(
            {
                "cell_id": pa.array(cid, pa.int64()),
                "li_q": pa.array(q),
                "s_src": pa.array(v_src),
            }
        )
        out = part.group_by("cell_id").aggregate(
            [("li_q", "sum"), ("s_src", "sum"), ("cell_id", "count")]
        )
        return out.rename_columns(["cell_id", "li_q", "s_src", "w"])

    partial = fanned.map_batches(pair_partial, batch_format="pyarrow")
    loc = bucketed_sum(
        partial,
        keys=["cell_id"],
        sum_cols=["li_q", "s_src", "w"],
        rows_hint=n_cells,
        recombine_batch_size=None,
    )

    quads = np.array(["LL", "LH", "HL", "HH"])

    def finalize(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        side = ray.get(side_ref)
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        li_q = t.column("li_q").to_numpy(zero_copy_only=False).astype(np.int64)
        s_src = t.column("s_src").to_numpy(zero_copy_only=False).astype(np.int64)
        w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(side["k"], cid)
        v = side["v"][np.minimum(pos, len(side["k"]) - 1)]
        hi = (v * n_cells > v_sum).astype(np.int64)
        lag_hi = (n_cells * s_src > w * v_sum).astype(np.int64)
        local_i = li_q.astype(np.float64) * float(n_cells) / float(den_q)
        return pa.table(
            {
                "cell_id": pa.array(cid, pa.int64()),
                "w": pa.array(w),
                "li_q": pa.array(li_q),
                "quad": pa.array(quads[hi * 2 + lag_hi]),
                "local_i": pa.array(local_i, pa.float64()),
            }
        )

    return loc.map_batches(finalize, batch_format="pyarrow")


def local_morans_sql(cells_sql: str, band: int = 3, k: int = 1) -> str:
    """Oracle twin of :func:`local_morans`: same fan-out, per-cell grouped
    quantized sums, integer quadrant comparisons, pinned final division."""
    from ..state.cells import CELL_LEVEL, morton_decode_sql_expr, morton_sql_expr

    hi = (1 << CELL_LEVEL) - 1
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in range(-k, k + 1)
        for dy in range(-k, k + 1)
        if not (dx == 0 and dy == 0)
    )
    S = float(MORAN_SCALE_INT)
    return f"""
        lm_agg AS MATERIALIZED (
            SELECT cell_id, CAST(SUM(c{band}) AS BIGINT) AS v
            FROM ({cells_sql}) GROUP BY cell_id
        ),
        lm_tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(SUM(v) AS BIGINT) AS v_sum,
                   CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS vbar
            FROM lm_agg
        ),
        lm_den AS (
            SELECT CAST(SUM(CAST(floor(
                       (((CAST(v AS DOUBLE) - t.vbar) / t.vbar)
                        * ((CAST(v AS DOUBLE) - t.vbar) / t.vbar))
                       * {S!r}) AS BIGINT)) AS BIGINT) AS den_q
            FROM lm_agg CROSS JOIN lm_tot t
        ),
        lm_dec AS (
            SELECT cell_id, v,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "x")} AS ix,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "y")} AS iy
            FROM lm_agg
        ),
        lm_offs AS (SELECT * FROM (VALUES {offs}) AS t(dx, dy)),
        lm_fan AS (
            SELECT {morton_sql_expr("(d.ix + o.dx)", "(d.iy + o.dy)", CELL_LEVEL)}
                       AS cell_id,
                   d.v AS v_src
            FROM lm_dec d CROSS JOIN lm_offs o
            WHERE d.ix + o.dx BETWEEN 0 AND {hi}
              AND d.iy + o.dy BETWEEN 0 AND {hi}
        ),
        lm_loc AS (
            SELECT f.cell_id,
                   CAST(COUNT(*) AS BIGINT) AS w,
                   CAST(SUM(CAST(floor(
                       (((CAST(a.v AS DOUBLE) - t.vbar) / t.vbar)
                        * ((CAST(f.v_src AS DOUBLE) - t.vbar) / t.vbar))
                       * {S!r}) AS BIGINT)) AS BIGINT) AS li_q,
                   CAST(SUM(f.v_src) AS BIGINT) AS s_src,
                   MIN(a.v) AS v
            FROM lm_fan f
            JOIN lm_agg a ON f.cell_id = a.cell_id
            CROSS JOIN lm_tot t
            GROUP BY f.cell_id
        )
        SELECT l.cell_id, l.w, l.li_q,
               CASE WHEN l.v * t.n_cells > t.v_sum THEN
                        CASE WHEN t.n_cells * l.s_src > l.w * t.v_sum
                             THEN 'HH' ELSE 'HL' END
                    ELSE
                        CASE WHEN t.n_cells * l.s_src > l.w * t.v_sum
                             THEN 'LH' ELSE 'LL' END
               END AS quad,
               CAST(l.li_q AS DOUBLE) * CAST(t.n_cells AS DOUBLE)
                   / CAST(d.den_q AS DOUBLE) AS local_i
        FROM lm_loc l CROSS JOIN lm_tot t CROSS JOIN lm_den d"""


def getis_ord(geo, band: int = 3, k: int = 1):
    """Getis-Ord Gi* hotspot z-score per occupied grid cell — the other
    canonical local clustering statistic next to LISA
    (:func:`local_morans`); w_ij = 1 over the (2k+1)² neighborhood
    INCLUDING the cell itself (the * variant):

      Gi* = (L_i − x̄·W_i) / (S·√((n·W_i − W_i²)/(n−1)))
      L_i = Σ_j v_j,  x̄ = S1/n,  S = √(S2/n − x̄²)

    Exactness: v are exact int64 cent sums; L_i, W_i, S1, S2 are exact
    integer partials, and the ×n-scaled numerator n·L_i − W_i·S1 stays
    int64; the denominator √(n·S2 − S1²)·√((n·W − W²)/(n−1)) is ONE
    pinned double expression (every multiply runs in double — S1² can
    exceed int64 at corpus scale) whose sqrt/mul/div are correctly-rounded
    IEEE ops, bit-identical to DuckDB's libm.

    Scale shape: identical to local_morans — corpus-sized work is only the
    zonal_sums reduce; the fan (here including (0,0)), broadcast probe and
    bucketed int sums run on the AOI-bounded cell table.

    Output: (cell_id:int64, w:int64 incl. self, lag:int64 = L_i,
    num_scaled:int64 = n·L_i − W_i·S1, gi_z:f64).
    """
    import ray
    import ray.data as rd

    from ..state.cells import CELL_LEVEL, decode, morton

    s_col = f"s_c{band}"
    cellsums = zonal_sums(geo, keys=["cell_id"], bands=(band,)).materialize()
    cells_pd = cellsums.to_pandas()
    empty = pa.table(
        {
            "cell_id": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64()),
            "lag": pa.array([], pa.int64()),
            "num_scaled": pa.array([], pa.int64()),
            "gi_z": pa.array([], pa.float64()),
        }
    )
    if len(cells_pd) == 0:
        return rd.from_arrow(empty)
    n_cells = int(len(cells_pd))
    vals = cells_pd[s_col].to_numpy(np.int64)
    s1 = int(vals.sum())
    s2 = int((vals * vals).sum())

    n_grid = np.int64(1) << CELL_LEVEL
    offsets = [
        (dx, dy) for dx in range(-k, k + 1) for dy in range(-k, k + 1)
    ]  # Gi*: the (0,0) self term stays in

    def fan(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        v = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = decode(cid, CELL_LEVEL)
        parts = []
        for dx, dy in offsets:
            tx, ty = ix + dx, iy + dy
            m = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
            parts.append(
                pa.table(
                    {
                        "cell_id": pa.array(morton(tx[m], ty[m]), type=pa.int64()),
                        "v_src": pa.array(v[m]),
                    }
                )
            )
        part = pa.concat_tables(parts)
        out = part.group_by("cell_id").aggregate(
            [("v_src", "sum"), ("cell_id", "count")]
        )
        return out.rename_columns(["cell_id", "lag", "w"])

    partial = cellsums.map_batches(fan, batch_format="pyarrow")
    agg = bucketed_sum(
        partial,
        keys=["cell_id"],
        sum_cols=["lag", "w"],
        rows_hint=n_cells,
        recombine_batch_size=None,
    )

    occ_ref = ray.put(np.sort(cells_pd["cell_id"].to_numpy(np.int64)))

    def finalize(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        occ = ray.get(occ_ref)
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(occ, cid)
        keep = (pos < len(occ)) & (occ[np.minimum(pos, len(occ) - 1)] == cid)
        lag = t.column("lag").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        num = n_cells * lag - w * s1
        n_d = np.float64(n_cells)
        den = np.sqrt(n_d * np.float64(s2) - np.float64(s1) * np.float64(s1)) * np.sqrt(
            (n_d * w.astype(np.float64) - w.astype(np.float64) * w.astype(np.float64))
            / (n_d - 1.0)
        )
        return pa.table(
            {
                "cell_id": pa.array(cid[keep], pa.int64()),
                "w": pa.array(w),
                "lag": pa.array(lag),
                "num_scaled": pa.array(num),
                "gi_z": pa.array(num.astype(np.float64) / den, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def getis_ord_sql(cells_sql: str, band: int = 3, k: int = 1) -> str:
    """Oracle twin of :func:`getis_ord`: fan including (0,0), grouped
    integer sums, occupied-cell semi-join, identical pinned z expression."""
    from ..state.cells import CELL_LEVEL, morton_decode_sql_expr, morton_sql_expr

    hi = (1 << CELL_LEVEL) - 1
    offs = ", ".join(
        f"({dx}, {dy})" for dx in range(-k, k + 1) for dy in range(-k, k + 1)
    )
    return f"""
        go_agg AS MATERIALIZED (
            SELECT cell_id, CAST(SUM(c{band}) AS BIGINT) AS v
            FROM ({cells_sql}) GROUP BY cell_id
        ),
        go_tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(v) AS BIGINT) AS s1,
                   CAST(SUM(v * v) AS BIGINT) AS s2
            FROM go_agg
        ),
        go_dec AS (
            SELECT cell_id, v,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "x")} AS ix,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "y")} AS iy
            FROM go_agg
        ),
        go_offs AS (SELECT * FROM (VALUES {offs}) AS t(dx, dy)),
        go_fan AS (
            SELECT {morton_sql_expr("(d.ix + o.dx)", "(d.iy + o.dy)", CELL_LEVEL)}
                       AS cell_id,
                   d.v AS v_src
            FROM go_dec d CROSS JOIN go_offs o
            WHERE d.ix + o.dx BETWEEN 0 AND {hi}
              AND d.iy + o.dy BETWEEN 0 AND {hi}
        ),
        go_loc AS (
            SELECT f.cell_id,
                   CAST(COUNT(*) AS BIGINT) AS w,
                   CAST(SUM(f.v_src) AS BIGINT) AS lag
            FROM go_fan f
            JOIN go_agg a ON f.cell_id = a.cell_id
            GROUP BY f.cell_id
        )
        SELECT l.cell_id, l.w, l.lag,
               t.n * l.lag - l.w * t.s1 AS num_scaled,
               CAST(t.n * l.lag - l.w * t.s1 AS DOUBLE)
               / (sqrt(CAST(t.n AS DOUBLE) * CAST(t.s2 AS DOUBLE)
                       - CAST(t.s1 AS DOUBLE) * CAST(t.s1 AS DOUBLE))
                  * sqrt((CAST(t.n AS DOUBLE) * CAST(l.w AS DOUBLE)
                          - CAST(l.w AS DOUBLE) * CAST(l.w AS DOUBLE))
                         / (CAST(t.n AS DOUBLE) - 1.0))) AS gi_z
        FROM go_loc l CROSS JOIN go_tot t"""


def ripley_k(geo, max_ring: int = 3):
    """Ripley's K point-pattern statistic on the cell grid: exact ordered
    point-pair counts by Chebyshev ring distance (ring 0 = pairs inside
    one cell), cumulated into the K estimate

        K̂(r) = A · P(≤r) / (n·(n−1)),   A = occupied-cell count

    — the standard clustered-vs-CSR diagnostic for an observation point
    set (reference analog: the plot-density diagnostics behind its
    stratified sampling design).  The grid approximation makes every pair
    count an exact integer: P(0) = Σ nᵢ(nᵢ−1), P(ring d) = Σ nᵢ·nⱼ over
    cell pairs at exact ring d (ordered, both directions).  K̂ is one
    pinned double expression over int64 inputs.

    Scale shape: the corpus-sized pass is the zonal_sums count reduce;
    the ring fan + broadcast probe run on the AOI-bounded cell table; the
    driver sees ≤max_ring+1 rows.

    Output: (ring:int64, pairs_at_ring:int64, cum_pairs:int64, k_hat:f64).
    """
    import ray
    import ray.data as rd

    from ..state.cells import CELL_LEVEL, decode, morton

    cellsums = zonal_sums(geo, keys=["cell_id"], bands=()).materialize()
    cells_pd = cellsums.to_pandas()
    if len(cells_pd) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "ring": pa.array([], pa.int64()),
                    "pairs_at_ring": pa.array([], pa.int64()),
                    "cum_pairs": pa.array([], pa.int64()),
                    "k_hat": pa.array([], pa.float64()),
                }
            )
        )
    counts = cells_pd["n"].to_numpy(np.int64)
    n_cells = int(len(cells_pd))
    n_pts = int(counts.sum())
    ring0 = int((counts * (counts - 1)).sum())

    n_grid = np.int64(1) << CELL_LEVEL
    offsets = [
        (dx, dy, max(abs(dx), abs(dy)))
        for dx in range(-max_ring, max_ring + 1)
        for dy in range(-max_ring, max_ring + 1)
        if not (dx == 0 and dy == 0)
    ]

    def fan(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        v = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = decode(cid, CELL_LEVEL)
        parts = []
        for dx, dy, ring in offsets:
            tx, ty = ix + dx, iy + dy
            m = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
            parts.append(
                pa.table(
                    {
                        "cell_id": pa.array(morton(tx[m], ty[m]), type=pa.int64()),
                        "ring": pa.array(np.full(int(m.sum()), ring, np.int64)),
                        "n_src": pa.array(v[m]),
                    }
                )
            )
        return pa.concat_tables(parts)

    ckeys = cells_pd["cell_id"].to_numpy(np.int64)
    corder = np.argsort(ckeys, kind="mergesort")
    side_ref = ray.put({"k": ckeys[corder], "v": counts[corder]})

    def partial(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        tgt = t.column("cell_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(side["k"], tgt)
        pos = np.minimum(pos, max(len(side["k"]) - 1, 0))
        hit = side["k"][pos] == tgt if len(side["k"]) else np.zeros(len(tgt), bool)
        prod = (
            t.column("n_src").to_numpy(zero_copy_only=False).astype(np.int64)[hit]
            * side["v"][pos[hit]]
        )
        ring = t.column("ring").to_numpy(zero_copy_only=False)[hit]
        s_r = np.zeros(max_ring + 1, dtype=np.int64)
        np.add.at(s_r, ring, prod)
        nz = np.flatnonzero(s_r)
        return pa.table(
            {
                "ring": pa.array(nz.astype(np.int64)),
                "pairs": pa.array(s_r[nz]),
            }
        )

    pp = (
        cellsums.map_batches(fan, batch_format="pyarrow")
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    by_ring = np.zeros(max_ring + 1, dtype=np.int64)
    by_ring[0] = ring0
    for r, p in zip(pp["ring"], pp["pairs"]):
        by_ring[int(r)] += int(p)
    cum = np.cumsum(by_ring)
    k_hat = (np.float64(n_cells) * cum.astype(np.float64)) / (
        np.float64(n_pts) * (np.float64(n_pts) - 1.0)
    )
    return rd.from_arrow(
        pa.table(
            {
                "ring": pa.array(np.arange(max_ring + 1, dtype=np.int64)),
                "pairs_at_ring": pa.array(by_ring),
                "cum_pairs": pa.array(cum),
                "k_hat": pa.array(k_hat, pa.float64()),
            }
        )
    )


def ripley_k_sql(cells_sql: str, max_ring: int = 3) -> str:
    """Oracle twin of :func:`ripley_k`."""
    from ..state.cells import CELL_LEVEL, morton_decode_sql_expr, morton_sql_expr

    hi = (1 << CELL_LEVEL) - 1
    offs = ", ".join(
        f"({dx}, {dy}, {max(abs(dx), abs(dy))})"
        for dx in range(-max_ring, max_ring + 1)
        for dy in range(-max_ring, max_ring + 1)
        if not (dx == 0 and dy == 0)
    )
    return f"""
        rk_agg AS MATERIALIZED (
            SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM ({cells_sql}) GROUP BY cell_id
        ),
        rk_tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS c, CAST(SUM(n) AS BIGINT) AS p
            FROM rk_agg
        ),
        rk_dec AS (
            SELECT n,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "x")} AS ix,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "y")} AS iy
            FROM rk_agg
        ),
        rk_offs AS (SELECT * FROM (VALUES {offs}) AS t(dx, dy, ring)),
        rk_fan AS (
            SELECT {morton_sql_expr("(d.ix + o.dx)", "(d.iy + o.dy)", CELL_LEVEL)}
                       AS cell_id,
                   o.ring, d.n AS n_src
            FROM rk_dec d CROSS JOIN rk_offs o
            WHERE d.ix + o.dx BETWEEN 0 AND {hi}
              AND d.iy + o.dy BETWEEN 0 AND {hi}
        ),
        rk_rings AS (
            SELECT CAST(0 AS BIGINT) AS ring,
                   CAST(SUM(n * (n - 1)) AS BIGINT) AS pairs
            FROM rk_agg
            UNION ALL
            SELECT CAST(f.ring AS BIGINT),
                   CAST(SUM(f.n_src * a.n) AS BIGINT)
            FROM rk_fan f JOIN rk_agg a ON f.cell_id = a.cell_id
            GROUP BY f.ring
        ),
        rk_all AS (
            SELECT r.ring, COALESCE(g.pairs, 0) AS pairs_at_ring
            FROM range(0, {max_ring + 1}) AS r(ring)
            LEFT JOIN rk_rings g ON g.ring = r.ring
        ),
        rk_cum AS (
            SELECT ring, pairs_at_ring,
                   CAST(SUM(pairs_at_ring) OVER (ORDER BY ring) AS BIGINT)
                       AS cum_pairs
            FROM rk_all
        )
        SELECT c.ring, c.pairs_at_ring, c.cum_pairs,
               (CAST(t.c AS DOUBLE) * CAST(c.cum_pairs AS DOUBLE))
               / (CAST(t.p AS DOUBLE) * (CAST(t.p AS DOUBLE) - 1.0)) AS k_hat
        FROM rk_cum c CROSS JOIN rk_tot t"""


def quadrat_test(geo):
    """Quadrat-count χ² test of complete spatial randomness over the
    occupied cell grid: χ² = Σᵢ (C·nᵢ − P)² / (C·P) with C = occupied
    cells, P = points — the textbook companion to :func:`ripley_k`.
    The numerator is an exact int64 sum; χ² is one pinned double
    division.  Output: one row (n_cells, n_points, chi2_num, df, chi2).
    """
    import ray.data as rd

    cellsums = zonal_sums(geo, keys=["cell_id"], bands=())

    tot = cellsums.map_batches(
        lambda t: pa.table(
            {
                "c": pa.array([len(t)], pa.int64()),
                "p": pa.array(
                    [int(t.column("n").to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    # empty Dataset.to_pandas() loses column names (house bug class) —
    # guard before indexing
    C = int(tot["c"].sum()) if len(tot) else 0
    P = int(tot["p"].sum()) if len(tot) else 0
    if C == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "n_cells": pa.array([], pa.int64()),
                    "n_points": pa.array([], pa.int64()),
                    "chi2_num": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "chi2": pa.array([], pa.float64()),
                }
            )
        )

    def num_partial(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        d = C * n - P
        return pa.table({"q": pa.array([int((d * d).sum())], pa.int64())})

    nq = cellsums.map_batches(num_partial, batch_format="pyarrow").to_pandas()
    num = int(nq["q"].sum())
    chi2 = np.float64(num) / (np.float64(C) * np.float64(P))
    return rd.from_arrow(
        pa.table(
            {
                "n_cells": pa.array([C], pa.int64()),
                "n_points": pa.array([P], pa.int64()),
                "chi2_num": pa.array([num], pa.int64()),
                "df": pa.array([C - 1], pa.int64()),
                "chi2": pa.array([float(chi2)], pa.float64()),
            }
        )
    )


def quadrat_test_sql(cells_sql: str) -> str:
    """Oracle twin of :func:`quadrat_test`."""
    return f"""
        qt_agg AS (
            SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n
            FROM ({cells_sql}) GROUP BY cell_id
        ),
        qt_tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS c, CAST(SUM(n) AS BIGINT) AS p
            FROM qt_agg
        ),
        qt_num AS (
            SELECT CAST(SUM((t.c * a.n - t.p) * (t.c * a.n - t.p)) AS BIGINT)
                       AS q
            FROM qt_agg a CROSS JOIN qt_tot t
        )
        SELECT t.c AS n_cells, t.p AS n_points, n.q AS chi2_num,
               t.c - 1 AS df,
               CAST(n.q AS DOUBLE) / (CAST(t.c AS DOUBLE) * CAST(t.p AS DOUBLE))
                   AS chi2
        FROM qt_tot t CROSS JOIN qt_num n"""


IDW_SCALE_INT = 1 << 20  # quantization of both the cell means and the 1/d² weights


def idw_fill(geo, band: int = 3, max_ring: int = 2):
    """Inverse-distance-weighted gap fill of the per-cell band-mean raster:
    every UNOCCUPIED grid cell within Chebyshev ring ≤ ``max_ring`` of at
    least one occupied cell gets the classic IDW prediction

        v̂(i) = Σ_j v_j / d²_ij  /  Σ_j 1 / d²_ij

    over its occupied neighbors j — the standard cloud/shadow-mask
    infill the reference applies before compositing (its masked-pixel
    neighborhoods via focal ops; reference analog `src/utils/` focal +
    composite chain).

    Exactness contract: cell means quantize by pure INTEGER division
    (mean_q = (s·2²⁰) // n — both engines' `//` agree for non-negative
    ints); each offset's weight is the integer wq(d²) = 2²⁰ // d²
    (precomputed per (dx,dy), so the SQL twin carries the SAME literal in
    its VALUES table); num/den are order-free int64 sums; the prediction
    is ONE pinned double division.

    Scale shape: the only corpus-sized pass is the zonal_sums reduce.
    After that: bounded fan (≤(2R+1)²−1 per occupied cell), in-batch
    group-by, bucketed int-sum combine, broadcast occupancy probe to drop
    already-observed targets.

    Output: (cell_id:int64, n_src:int64, num_q:int64, den_q:int64,
    idw:f64) — gap cells only.
    """
    import ray
    import ray.data as rd

    from ..state.cells import CELL_LEVEL, decode, morton

    s_col = f"s_c{band}"
    cellsums = zonal_sums(geo, keys=["cell_id"], bands=(band,)).materialize()
    cells_pd = cellsums.to_pandas()
    empty = pa.table(
        {
            "cell_id": pa.array([], pa.int64()),
            "n_src": pa.array([], pa.int64()),
            "num_q": pa.array([], pa.int64()),
            "den_q": pa.array([], pa.int64()),
            "idw": pa.array([], pa.float64()),
        }
    )
    if len(cells_pd) == 0:
        return rd.from_arrow(empty)

    Q = IDW_SCALE_INT
    n_grid = np.int64(1) << CELL_LEVEL
    offsets = [
        (dx, dy, Q // (dx * dx + dy * dy))
        for dx in range(-max_ring, max_ring + 1)
        for dy in range(-max_ring, max_ring + 1)
        if not (dx == 0 and dy == 0)
    ]

    def fan(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        s = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        mean_q = (s * Q) // n
        ix, iy = decode(cid, CELL_LEVEL)
        parts = []
        for dx, dy, wq in offsets:
            tx, ty = ix + dx, iy + dy
            m = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
            parts.append(
                pa.table(
                    {
                        "cell_id": pa.array(morton(tx[m], ty[m]), type=pa.int64()),
                        "num_q": pa.array(mean_q[m] * wq),
                        "den_q": pa.array(np.full(int(m.sum()), wq, np.int64)),
                    }
                )
            )
        part = pa.concat_tables(parts)
        out = part.group_by("cell_id").aggregate(
            [("num_q", "sum"), ("den_q", "sum"), ("cell_id", "count")]
        )
        return out.rename_columns(["cell_id", "num_q", "den_q", "n_src"])

    partial = cellsums.map_batches(fan, batch_format="pyarrow")
    agg = bucketed_sum(
        partial,
        keys=["cell_id"],
        sum_cols=["num_q", "den_q", "n_src"],
        rows_hint=len(cells_pd),
        recombine_batch_size=None,
    )

    ckeys = np.sort(cells_pd["cell_id"].to_numpy(np.int64))
    occ_ref = ray.put(ckeys)

    def finalize(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        occ = ray.get(occ_ref)
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(occ, cid)
        occupied = (pos < len(occ)) & (occ[np.minimum(pos, len(occ) - 1)] == cid)
        gap = ~occupied
        num = t.column("num_q").to_numpy(zero_copy_only=False).astype(np.int64)[gap]
        den = t.column("den_q").to_numpy(zero_copy_only=False).astype(np.int64)[gap]
        nsrc = t.column("n_src").to_numpy(zero_copy_only=False).astype(np.int64)[gap]
        return pa.table(
            {
                "cell_id": pa.array(cid[gap], pa.int64()),
                "n_src": pa.array(nsrc),
                "num_q": pa.array(num),
                "den_q": pa.array(den),
                "idw": pa.array(num.astype(np.float64) / den.astype(np.float64)),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def idw_fill_sql(cells_sql: str, band: int = 3, max_ring: int = 2) -> str:
    """Oracle twin of :func:`idw_fill`: identical integer mean/weight
    quantization (the wq literals are computed by the same Python
    expression), fan-out, per-target grouped sums, occupancy anti-join,
    pinned final division."""
    from ..state.cells import CELL_LEVEL, morton_decode_sql_expr, morton_sql_expr

    hi = (1 << CELL_LEVEL) - 1
    Q = IDW_SCALE_INT
    offs = ", ".join(
        f"({dx}, {dy}, {Q // (dx * dx + dy * dy)})"
        for dx in range(-max_ring, max_ring + 1)
        for dy in range(-max_ring, max_ring + 1)
        if not (dx == 0 and dy == 0)
    )
    return f"""
        iw_agg AS MATERIALIZED (
            SELECT cell_id,
                   (CAST(SUM(c{band}) AS BIGINT) * {Q})
                       // CAST(COUNT(*) AS BIGINT) AS mean_q
            FROM ({cells_sql}) GROUP BY cell_id
        ),
        iw_dec AS (
            SELECT cell_id, mean_q,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "x")} AS ix,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "y")} AS iy
            FROM iw_agg
        ),
        iw_offs AS (SELECT * FROM (VALUES {offs}) AS t(dx, dy, wq)),
        iw_fan AS (
            SELECT {morton_sql_expr("(d.ix + o.dx)", "(d.iy + o.dy)", CELL_LEVEL)}
                       AS cell_id,
                   d.mean_q * o.wq AS num_term,
                   CAST(o.wq AS BIGINT) AS wq
            FROM iw_dec d CROSS JOIN iw_offs o
            WHERE d.ix + o.dx BETWEEN 0 AND {hi}
              AND d.iy + o.dy BETWEEN 0 AND {hi}
        ),
        iw_gap AS (
            SELECT f.cell_id,
                   CAST(COUNT(*) AS BIGINT) AS n_src,
                   CAST(SUM(f.num_term) AS BIGINT) AS num_q,
                   CAST(SUM(f.wq) AS BIGINT) AS den_q
            FROM iw_fan f
            LEFT JOIN iw_agg a ON f.cell_id = a.cell_id
            WHERE a.cell_id IS NULL
            GROUP BY f.cell_id
        )
        SELECT cell_id, n_src, num_q, den_q,
               CAST(num_q AS DOUBLE) / CAST(den_q AS DOUBLE) AS idw
        FROM iw_gap"""


def raster_pyramid(geo, band: int = 3, levels_up=(1, 2)):
    """Mean-pyramid downsample of the per-cell band raster — the overview
    levels every tiled raster product ships (the reference's export
    pyramids / `.reproject` to coarser scales before display): each
    coarser cell's mean aggregates its 4^k children exactly.

    Exactness: Morton parent ids are pure bit-shifts, the per-level sums
    are exact int64 cents, and each mean is the single pinned double
    division shared with zonal_counts.

    Scale shape: the corpus-sized zonal_sums reduce happens ONCE at the
    base level; the pyramid fan runs over the AOI-bounded cell table with
    in-batch pre-aggregation (one row per parent per batch) and a bucketed
    integer combine.

    Output: (level_up:int64, cell_id:int64 at CELL_LEVEL−level_up,
    n:int64, s_c{band}:int64, mean_b{band}:f64).
    """
    import pyarrow.compute as pc

    s_col = f"s_c{band}"
    base = zonal_sums(geo, keys=["cell_id"], bands=(band,))

    def fan(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        parts = [
            pa.table(
                {
                    "level_up": pa.array(np.full(len(cid), lu, np.int64)),
                    "cell_id": pa.array(cid >> np.int64(2 * lu)),
                    "n": pa.array(n),
                    s_col: pa.array(s),
                }
            )
            for lu in levels_up
        ]
        g = (
            pa.concat_tables(parts)
            .group_by(["level_up", "cell_id"])
            .aggregate([("n", "sum"), (s_col, "sum")])
        )
        return pa.table(
            {
                "level_up": g.column("level_up"),
                "cell_id": g.column("cell_id"),
                "n": g.column("n_sum"),
                s_col: g.column(f"{s_col}_sum"),
            }
        )

    agg = bucketed_sum(
        base.map_batches(fan, batch_format="pyarrow"),
        ["level_up", "cell_id"],
        ["n", s_col],
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n")
        denom = pc.multiply(pc.cast(n, pa.float64()), 100.0)
        return pa.table(
            {
                "level_up": t.column("level_up"),
                "cell_id": t.column("cell_id"),
                "n": n,
                s_col: t.column(s_col),
                f"mean_b{band}": pc.divide(
                    pc.cast(t.column(s_col), pa.float64()), denom
                ),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def compact_cells(geo, level: int = CELL_LEVEL, min_level: int = 6):
    """Quadtree compaction of the occupied-cell set — the H3
    `compact_cells` analog over the engine's Morton grid: replace every
    COMPLETE sibling quad (all 4 children occupied) by its parent,
    recursively, yielding the minimal mixed-level covering set.  The
    index-maintenance primitive for AOI masks and tile manifests (the
    reference's export-region footprints, src/utils/exports.py:15-16).

    Exactness: parent ids are pure bit-shifts; "complete" is an exact
    integer count == 4; ties/order don't exist, so the output set is
    unique.

    Scale shape: the corpus-sized reduce happens ONCE (the distinct
    zonal_sums cell table); each of the ≤(level−min_level) rounds runs
    an in-batch pre-aggregated bucketed integer combine over a table
    that SHRINKS ≥4× per round, plus a broadcast probe of the
    AOI-bounded full-parent id array (the inflow_count side-broadcast
    discipline; ≤4^(lvl−1) ids, measured 1.5k at sf0.01 level 11).

    Output: (cell_id:int64, level:int64) — cell_id at its own level.
    """
    import ray
    import ray.data as rd

    cur = zonal_sums(geo, keys=("cell_id",), bands=()).select_columns(["cell_id"])
    outs = []
    for lvl in range(level, min_level, -1):
        cur = cur.materialize()  # consumed twice: parent counts + emit

        def fan(t: pa.Table) -> pa.Table:
            pid = t.column("cell_id").to_numpy(zero_copy_only=False) >> np.int64(2)
            g = (
                pa.table({"pid": pa.array(pid, pa.int64())})
                .group_by(["pid"])
                .aggregate([([], "count_all")])
            )
            return g.rename_columns(["pid", "n"])

        counts = bucketed_sum(
            cur.map_batches(fan, batch_format="pyarrow"), ["pid"], ["n"]
        ).to_pandas()
        if len(counts):  # empty Dataset.to_pandas() loses column names
            full = np.sort(
                counts.loc[counts["n"] == 4, "pid"].to_numpy(np.int64)
            )
        else:
            full = np.empty(0, np.int64)
        full_ref = ray.put(full)
        lvl_const = np.int64(lvl)

        def emit(t: pa.Table, _ref=full_ref, _lvl=lvl_const) -> pa.Table:
            f = ray.get(_ref)
            cid = t.column("cell_id").to_numpy(zero_copy_only=False)
            pid = cid >> np.int64(2)
            if len(f):
                pos = np.minimum(np.searchsorted(f, pid), len(f) - 1)
                keep = f[pos] != pid
            else:
                keep = np.ones(len(cid), bool)
            return pa.table(
                {
                    "cell_id": pa.array(cid[keep].astype(np.int64), pa.int64()),
                    "level": pa.array(np.full(keep.sum(), _lvl)),
                }
            )

        outs.append(cur.map_batches(emit, batch_format="pyarrow"))
        if not len(full):
            # nothing promoted: every survivor was just emitted at lvl;
            # stop instead of threading empty datasets (schema-less empty
            # blocks trigger executor RefBundle warnings)
            cur = None
            break
        cur = rd.from_arrow(
            pa.table({"cell_id": pa.array(full, pa.int64())})
        )
    if cur is not None:
        outs.append(
            cur.map_batches(
                lambda t: pa.table(
                    {
                        "cell_id": t.column("cell_id"),
                        "level": pa.array(
                            np.full(t.num_rows, min_level, np.int64)
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def compact_cells_sql(cells_sql: str, level: int = CELL_LEVEL, min_level: int = 6) -> str:
    """Oracle twin of :func:`compact_cells` — one CTE pair per round:
    full parents = GROUP BY cell_id // 4 HAVING COUNT(*) = 4, survivors
    emitted at their level via NOT IN, full parents promoted.  Returns a
    CTE-chain fragment + final SELECT, to be appended after the caller's
    ``WITH {geo}, {cells},`` (the kring_smooth_sql convention)."""
    parts = [f"k{level} AS (SELECT DISTINCT cell_id FROM ({cells_sql}))"]
    sels = []
    for lvl in range(level, min_level, -1):
        parts.append(
            f"kf{lvl - 1} AS (SELECT cell_id // 4 AS cell_id FROM k{lvl} "
            f"GROUP BY cell_id // 4 HAVING COUNT(*) = 4)"
        )
        sels.append(
            f"SELECT cell_id, CAST({lvl} AS BIGINT) AS level FROM k{lvl} "
            f"WHERE cell_id // 4 NOT IN (SELECT cell_id FROM kf{lvl - 1})"
        )
        parts.append(f"k{lvl - 1} AS (SELECT cell_id FROM kf{lvl - 1})")
    sels.append(
        f"SELECT cell_id, CAST({min_level} AS BIGINT) AS level FROM k{min_level}"
    )
    return ",\n".join(parts) + "\n" + " UNION ALL ".join(sels)


def raster_pyramid_sql(cells_sql: str, band: int = 3, levels_up=(1, 2)) -> str:
    """Oracle twin of :func:`raster_pyramid` — per-level GROUP BY on the
    bit-shifted parent id, identical pinned mean division."""
    selects = [
        f"""
        SELECT CAST({lu} AS BIGINT) AS level_up,
               cell_id // {4 ** lu} AS cell_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c{band}) AS BIGINT) AS s_c{band},
               CAST(SUM(c{band}) AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * 100.0) AS mean_b{band}
        FROM ({cells_sql}) GROUP BY cell_id // {4 ** lu}"""
        for lu in levels_up
    ]
    return " UNION ALL ".join(selects)


def dist_transform(geo, band: int = 3, thresh_q: int = 480_000, max_ring: int = 3):
    """Capped Chebyshev distance transform: for every occupied cell, the
    grid distance (0..max_ring) to the nearest MASK cell, where the mask
    is the dense-vegetation rule on the quantized band sums, mean
    c{band} > thresh_q — evaluated as the exact integer cross-
    multiplication s > thresh_q·n (never a float compare).  Cells farther than ``max_ring`` from any mask cell
    report the saturation sentinel max_ring+1.

    Reference analog: ``fastDistanceTransform`` in the cloud-shadow
    projection chain (src/utils/s2process.py — shadows are masked by
    distance from the cloud mask within a capped neighborhood); the cap is
    what makes the transform embarrassingly local, exactly like EE's
    neighborhood-bounded implementation.

    Exactness: every column is int64 (ring distances, integer mask rule) —
    bit-stable under any partitioning.

    Scale shape: the only corpus-sized pass is the zonal_sums reduce.  Mask
    cells fan to their (2R+1)² neighborhood with an IN-BATCH group-min
    (one row per target cell per batch), the min combine runs on the
    AOI-grid-bounded fan table, and the min-dist side attaches to occupied
    cells by broadcast probe (same boundedness argument as morans_i).

    Output: (cell_id:int64, in_mask:int64, dist:int64).
    """
    import ray

    from ray.data.aggregate import Min

    from ..state.cells import CELL_LEVEL, decode, morton

    s_col = f"s_c{band}"
    cellsums = zonal_sums(geo, keys=["cell_id"], bands=(band,)).materialize()
    n_grid = np.int64(1) << CELL_LEVEL
    offsets = [
        (dx, dy, max(abs(dx), abs(dy)))
        for dx in range(-max_ring, max_ring + 1)
        for dy in range(-max_ring, max_ring + 1)
    ]
    sentinel = max_ring + 1

    def fan(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        s = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s > thresh_q * n
        ix, iy = decode(cid[keep], CELL_LEVEL)
        parts = []
        for dx, dy, r in offsets:
            tx, ty = ix + dx, iy + dy
            m = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
            parts.append(
                pa.table(
                    {
                        "cell_id": pa.array(morton(tx[m], ty[m]), type=pa.int64()),
                        "ring": pa.array(np.full(int(m.sum()), r, np.int64)),
                    }
                )
            )
        g = pa.concat_tables(parts).group_by(["cell_id"]).aggregate([("ring", "min")])
        return pa.table({"cell_id": g.column("cell_id"), "ring": g.column("ring_min")})

    mind = (
        cellsums.map_batches(fan, batch_format="pyarrow")
        .groupby("cell_id")
        .aggregate(Min("ring", alias_name="ring"))
        .to_pandas()
    )
    mk = mind["cell_id"].to_numpy(np.int64)
    md = mind["ring"].to_numpy(np.int64)
    order = np.argsort(mk, kind="mergesort")
    side_ref = ray.put({"k": mk[order], "d": md[order]})

    def finalize(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        s = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        dist = np.full(len(cid), sentinel, np.int64)
        if len(side["k"]):
            pos = np.minimum(np.searchsorted(side["k"], cid), len(side["k"]) - 1)
            hit = side["k"][pos] == cid
            dist[hit] = side["d"][pos[hit]]
        return pa.table(
            {
                "cell_id": pa.array(cid.astype(np.int64), pa.int64()),
                "in_mask": pa.array((s > thresh_q * n).astype(np.int64)),
                "dist": pa.array(dist),
            }
        )

    return cellsums.map_batches(finalize, batch_format="pyarrow")


def dist_transform_sql(
    cells_sql: str, band: int = 3, thresh_q: int = 480_000, max_ring: int = 3
) -> str:
    """Oracle twin of :func:`dist_transform`: identical integer mask rule,
    offset fan with Chebyshev ring literals, grouped MIN, LEFT JOIN +
    sentinel COALESCE."""
    from ..state.cells import CELL_LEVEL, morton_decode_sql_expr, morton_sql_expr

    hi = (1 << CELL_LEVEL) - 1
    offs = ", ".join(
        f"({dx}, {dy}, {max(abs(dx), abs(dy))})"
        for dx in range(-max_ring, max_ring + 1)
        for dy in range(-max_ring, max_ring + 1)
    )
    return f"""
        dt_agg AS MATERIALIZED (
            SELECT cell_id, CAST(SUM(c{band}) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM ({cells_sql}) GROUP BY cell_id
        ),
        dt_mask AS (
            SELECT {morton_decode_sql_expr("cell_id", CELL_LEVEL, "x")} AS ix,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "y")} AS iy
            FROM dt_agg WHERE s > {thresh_q} * n
        ),
        dt_offs AS (SELECT * FROM (VALUES {offs}) AS t(dx, dy, ring)),
        dt_fan AS (
            SELECT {morton_sql_expr("(d.ix + o.dx)", "(d.iy + o.dy)", CELL_LEVEL)}
                       AS cell_id,
                   o.ring AS ring
            FROM dt_mask d CROSS JOIN dt_offs o
            WHERE d.ix + o.dx BETWEEN 0 AND {hi}
              AND d.iy + o.dy BETWEEN 0 AND {hi}
        ),
        dt_min AS (
            SELECT cell_id, MIN(ring) AS ring FROM dt_fan GROUP BY cell_id
        )
        SELECT a.cell_id,
               CASE WHEN a.s > {thresh_q} * a.n THEN 1 ELSE 0 END AS in_mask,
               CAST(COALESCE(m.ring, {max_ring + 1}) AS BIGINT) AS dist
        FROM dt_agg a LEFT JOIN dt_min m ON a.cell_id = m.cell_id"""


def raster_upsample(geo, band: int = 3):
    """Bilinear 2× upsample of the per-cell band-mean raster to the
    CELL_LEVEL+1 grid — the standard resample the reference leans on when
    mixing 10 m/30 m/90 m sources onto one working grid (its
    `.reproject`/`.resample('bilinear')` step before compositing).

    Per-axis bilinear weights at half-cell offsets are exactly (3,1)/4, so
    every fine cell is the (9,3,3,1)/16 mix of its ≤4 coarse parents —
    INTEGER stencil weights, which makes the whole resample bit-exact:
    num = Σ mean_q·w (int64), den = Σ w over the PRESENT parents
    (border/sparse cells renormalize naturally), value = num/den one
    pinned double division.  mean_q = (s·2²⁰)//n integer division, shared
    with :func:`idw_fill`.

    Shape: fan each coarse cell to the 16 fine cells its stencil touches
    (bounded), in-batch group, bucketed int-sum combine.  The only
    corpus-sized pass is the zonal_sums reduce.

    Output: (fine_cell_id:int64 at CELL_LEVEL+1, n_src:int64, num_q:int64,
    den_w:int64, value:f64).
    """
    import ray.data as rd

    from ..state.cells import CELL_LEVEL, decode, morton

    s_col = f"s_c{band}"
    cellsums = zonal_sums(geo, keys=["cell_id"], bands=(band,))
    Q = IDW_SCALE_INT
    fine_level = CELL_LEVEL + 1
    n_fine = np.int64(1) << fine_level
    # per-axis contributions of coarse cx to fine 2cx+fdx: {-1:1, 0:3, 1:3, 2:1}
    ax = [(-1, 1), (0, 3), (1, 3), (2, 1)]
    offsets = [(fdx, fdy, wx * wy) for fdx, wx in ax for fdy, wy in ax]

    def fan(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        s = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        mean_q = (s * Q) // n
        ix, iy = decode(cid, CELL_LEVEL)
        fx0, fy0 = ix.astype(np.int64) * 2, iy.astype(np.int64) * 2
        parts = []
        for fdx, fdy, w in offsets:
            tx, ty = fx0 + fdx, fy0 + fdy
            m = (tx >= 0) & (tx < n_fine) & (ty >= 0) & (ty < n_fine)
            parts.append(
                pa.table(
                    {
                        "fine_cell_id": pa.array(
                            morton(tx[m], ty[m]), type=pa.int64()
                        ),
                        "num_q": pa.array(mean_q[m] * w),
                        "den_w": pa.array(np.full(int(m.sum()), w, np.int64)),
                    }
                )
            )
        part = pa.concat_tables(parts)
        out = part.group_by("fine_cell_id").aggregate(
            [("num_q", "sum"), ("den_w", "sum"), ("fine_cell_id", "count")]
        )
        return out.rename_columns(["fine_cell_id", "num_q", "den_w", "n_src"])

    partial = cellsums.map_batches(fan, batch_format="pyarrow")
    agg = bucketed_sum(
        partial,
        keys=["fine_cell_id"],
        sum_cols=["num_q", "den_w", "n_src"],
        recombine_batch_size=None,
    )

    empty = pa.table(
        {
            "fine_cell_id": pa.array([], pa.int64()),
            "n_src": pa.array([], pa.int64()),
            "num_q": pa.array([], pa.int64()),
            "den_w": pa.array([], pa.int64()),
            "value": pa.array([], pa.float64()),
        }
    )

    def finalize(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        num = t.column("num_q").to_numpy(zero_copy_only=False).astype(np.int64)
        den = t.column("den_w").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "fine_cell_id": t.column("fine_cell_id").cast(pa.int64()),
                "n_src": t.column("n_src").cast(pa.int64()),
                "num_q": pa.array(num),
                "den_w": pa.array(den),
                "value": pa.array(num.astype(np.float64) / den.astype(np.float64)),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def raster_upsample_sql(cells_sql: str, band: int = 3) -> str:
    """Oracle twin of :func:`raster_upsample`: same integer mean
    quantization, the same 16-entry (fdx, fdy, w) stencil as a VALUES
    table, fine-morton re-encode, grouped integer sums, pinned division."""
    from ..state.cells import CELL_LEVEL, morton_decode_sql_expr, morton_sql_expr

    Q = IDW_SCALE_INT
    fine_level = CELL_LEVEL + 1
    hi = (1 << fine_level) - 1
    ax = [(-1, 1), (0, 3), (1, 3), (2, 1)]
    offs = ", ".join(
        f"({fdx}, {fdy}, {wx * wy})" for fdx, wx in ax for fdy, wy in ax
    )
    return f"""
        ru_agg AS MATERIALIZED (
            SELECT cell_id,
                   (CAST(SUM(c{band}) AS BIGINT) * {Q})
                       // CAST(COUNT(*) AS BIGINT) AS mean_q
            FROM ({cells_sql}) GROUP BY cell_id
        ),
        ru_dec AS (
            SELECT mean_q,
                   2 * {morton_decode_sql_expr("cell_id", CELL_LEVEL, "x")} AS fx0,
                   2 * {morton_decode_sql_expr("cell_id", CELL_LEVEL, "y")} AS fy0
            FROM ru_agg
        ),
        ru_offs AS (SELECT * FROM (VALUES {offs}) AS t(fdx, fdy, w)),
        ru_fan AS (
            SELECT {morton_sql_expr("(d.fx0 + o.fdx)", "(d.fy0 + o.fdy)", fine_level)}
                       AS fine_cell_id,
                   d.mean_q * o.w AS num_term,
                   CAST(o.w AS BIGINT) AS w
            FROM ru_dec d CROSS JOIN ru_offs o
            WHERE d.fx0 + o.fdx BETWEEN 0 AND {hi}
              AND d.fy0 + o.fdy BETWEEN 0 AND {hi}
        )
        SELECT fine_cell_id,
               CAST(COUNT(*) AS BIGINT) AS n_src,
               CAST(SUM(num_term) AS BIGINT) AS num_q,
               CAST(SUM(w) AS BIGINT) AS den_w,
               CAST(SUM(num_term) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS value
        FROM ru_fan GROUP BY fine_cell_id"""


def variogram(geo, band: int = 3, max_ring: int = 2):
    """Empirical semivariogram of the per-cell band total by Chebyshev
    ring distance on the cell grid: γ(r) = Σ_{pairs at ring r}
    (v_i − v_j)² / (2·N_r) — the spatial-structure diagnostic that sets
    interpolation ranges (flat γ ⇒ no spatial dependence; rising γ ⇒
    correlation length).

    Exactness: v are exact integer cent sums; each pair contributes
    (v_i − v_j)² // 10⁴ (the squared difference in whole units² —
    non-negative, so floor = truncation on both sides) as exact int64,
    keeping corpus-scale totals far from 2⁶³; γ is one double division.  Scale shape: identical to ``morans_i`` — fan-out over the
    ≤(2k+1)²−1 offsets with the ring tag, ONE bounded hash join on the
    AOI-limited cell table, int partials.

    Output: (ring:int64, n_pairs:int64, sum_sq:int64, gamma:f64).
    """
    import ray
    import ray.data as rd

    from ..state.cells import CELL_LEVEL, decode, morton

    s_col = f"s_c{band}"
    cellsums = zonal_sums(geo, keys=["cell_id"], bands=(band,)).materialize()
    n_grid = np.int64(1) << CELL_LEVEL
    offsets = [
        (dx, dy, max(abs(dx), abs(dy)))
        for dx in range(-max_ring, max_ring + 1)
        for dy in range(-max_ring, max_ring + 1)
        if not (dx == 0 and dy == 0)
    ]

    def fan(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        v = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = decode(cid, CELL_LEVEL)
        parts = []
        for dx, dy, ring in offsets:
            tx, ty = ix + dx, iy + dy
            m = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
            parts.append(
                pa.table(
                    {
                        "cell_id": pa.array(morton(tx[m], ty[m]), type=pa.int64()),
                        "ring": pa.array(
                            np.full(int(m.sum()), ring, dtype=np.int64)
                        ),
                        "v_src": pa.array(v[m]),
                    }
                )
            )
        return pa.concat_tables(parts)

    # broadcast probe instead of a hash join (the morans_i rationale:
    # the cell table is AOI-grid-bounded)
    cells_pd = cellsums.to_pandas()
    ckeys = cells_pd["cell_id"].to_numpy(np.int64)
    cvals = cells_pd[s_col].to_numpy(np.int64)
    corder = np.argsort(ckeys, kind="mergesort")
    side_ref = ray.put({"k": ckeys[corder], "v": cvals[corder]})
    fanned = cellsums.map_batches(fan, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        tgt = t.column("cell_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(side["k"], tgt)
        pos = np.minimum(pos, max(len(side["k"]) - 1, 0))
        hit = side["k"][pos] == tgt if len(side["k"]) else np.zeros(len(tgt), bool)
        d = (
            t.column("v_src")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[hit]
            - side["v"][pos[hit]]
        )
        ring = t.column("ring").to_numpy(zero_copy_only=False)[hit]
        sq = (d * d) // 10_000  # cents² → units², exact truncation
        # exact int64 accumulation — float-weighted bincount would round
        # past 2⁵³ (per-batch Σsq reaches ~10¹⁸ at real cent magnitudes)
        n_r = np.bincount(ring, minlength=max_ring + 1)
        s_r = np.zeros(max_ring + 1, dtype=np.int64)
        np.add.at(s_r, ring, sq)
        nz = np.flatnonzero(n_r)
        return pa.table(
            {
                "ring": pa.array(nz.astype(np.int64)),
                "n_pairs": pa.array(n_r[nz].astype(np.int64)),
                "sum_sq": pa.array(s_r[nz]),
            }
        )

    agg = bucketed_sum(
        fanned.map_batches(partial, batch_format="pyarrow"),
        ["ring"],
        ["n_pairs", "sum_sq"],
        recombine_batch_size=None,
    )

    def finalize(t: pa.Table) -> pa.Table:
        # numpy int64→float64 conversion (correctly rounded past 2⁵³ —
        # Arrow's safe cast refuses there; SQL's CAST(x AS DOUBLE) rounds
        # the same exact integer to the same double)
        s = t.column("sum_sq").to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.column("n_pairs").to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("gamma", pa.array(s / (n * 2.0)))

    return agg.map_batches(finalize, batch_format="pyarrow")


def variogram_sql(cells_sql: str, band: int = 3, max_ring: int = 2) -> str:
    """Oracle twin: same fan-out (ring = Chebyshev offset distance), join,
    exact integer squared differences, identical final division.  CTE
    fragment for a caller's ``WITH {geo}, {cells},``."""
    from ..state.cells import CELL_LEVEL, morton_decode_sql_expr, morton_sql_expr

    hi = (1 << CELL_LEVEL) - 1
    offs = ", ".join(
        f"({dx}, {dy}, {max(abs(dx), abs(dy))})"
        for dx in range(-max_ring, max_ring + 1)
        for dy in range(-max_ring, max_ring + 1)
        if not (dx == 0 and dy == 0)
    )
    return f"""
        vg_agg AS MATERIALIZED (
            SELECT cell_id, CAST(SUM(c{band}) AS BIGINT) AS v
            FROM ({cells_sql}) GROUP BY cell_id
        ),
        vg_dec AS (
            SELECT cell_id, v,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "x")} AS ix,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "y")} AS iy
            FROM vg_agg
        ),
        vg_offs AS (SELECT * FROM (VALUES {offs}) AS t(dx, dy, ring)),
        vg_fan AS (
            SELECT {morton_sql_expr("(d.ix + o.dx)", "(d.iy + o.dy)", CELL_LEVEL)}
                       AS cell_id,
                   o.ring, d.v AS v_src
            FROM vg_dec d CROSS JOIN vg_offs o
            WHERE d.ix + o.dx BETWEEN 0 AND {hi}
              AND d.iy + o.dy BETWEEN 0 AND {hi}
        ),
        vg_pairs AS (
            SELECT f.ring,
                   ((f.v_src - a.v) * (f.v_src - a.v)) // 10000 AS sq
            FROM vg_fan f JOIN vg_agg a ON f.cell_id = a.cell_id
        )
        SELECT CAST(ring AS BIGINT) AS ring,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(sq) AS BIGINT) AS sum_sq,
               CAST(SUM(sq) AS DOUBLE)
                   / (CAST(COUNT(*) AS DOUBLE) * 2.0) AS gamma
        FROM vg_pairs GROUP BY ring"""


def theilsen_trend(geo, band: int = 3):
    """Per-cell Theil–Sen robust trend: the (lower) MEDIAN of all pairwise
    slopes (vⱼ−vᵢ)/(yearⱼ−yearᵢ) over the cell's yearly band totals — the
    outlier-resistant companion to :func:`cell_trend`'s OLS slope (the
    robust greening/degradation estimator in the trend-analysis
    literature).

    Exactness: yearly totals are exact int64 cent sums; every pairwise
    slope stays a RATIONAL (dy:int64, dx:int64); the median element is
    selected by the deterministic sort key (dy/dx as double, dy, dx) with
    1-based rank (m+1)//2 — identical in SQL's row_number — and the
    reported slope is the chosen pair's one pinned division.

    Scale shape: corpus-sized work is only the zonal_sums reduce; pair
    enumeration runs per cell inside hash-bucketed map_groups over the
    bounded (cell, year) table (pairs ≤ years², years is a handful).

    Output: (cell_id:int64, n_pairs:int64, slope_num:int64,
    slope_den:int64, theil_slope:f64).
    """
    import pandas as pd

    s_col = f"s_c{band}"
    yearly = zonal_sums(geo, keys=["cell_id", "year"], bands=(band,))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for cid, grp in g.groupby("cell_id", sort=False):
            x = grp["year"].to_numpy(np.int64)
            v = grp[s_col].to_numpy(np.int64)
            o = np.argsort(x, kind="mergesort")
            x, v = x[o], v[o]
            k = len(x)
            if k < 2:
                continue
            ii, jj = np.triu_indices(k, 1)
            dy = v[jj] - v[ii]
            dx = x[jj] - x[ii]
            ratio = dy.astype(np.float64) / dx.astype(np.float64)
            order = np.lexsort((dx, dy, ratio))
            m = len(order)
            pick = order[(m - 1) // 2]
            rows.append(
                (
                    int(cid),
                    m,
                    int(dy[pick]),
                    int(dx[pick]),
                    float(np.float64(dy[pick]) / np.float64(dx[pick])),
                )
            )
        return pd.DataFrame(
            rows,
            columns=["cell_id", "n_pairs", "slope_num", "slope_den", "theil_slope"],
        ).astype(
            {
                "cell_id": np.int64,
                "n_pairs": np.int64,
                "slope_num": np.int64,
                "slope_den": np.int64,
                "theil_slope": np.float64,
            }
        )

    return (
        _add_bucket(yearly, ["cell_id"], _default_buckets())
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(
            ["cell_id", "n_pairs", "slope_num", "slope_den", "theil_slope"]
        )
    )


def theilsen_trend_sql(cells_sql: str, band: int = 3) -> str:
    """Oracle twin of :func:`theilsen_trend`."""
    return f"""
        th_agg AS MATERIALIZED (
            SELECT cell_id, "year", CAST(SUM(c{band}) AS BIGINT) AS v
            FROM ({cells_sql}) GROUP BY cell_id, "year"
        ),
        th_pairs AS (
            SELECT a.cell_id,
                   b.v - a.v AS dy,
                   b."year" - a."year" AS dx
            FROM th_agg a JOIN th_agg b
              ON a.cell_id = b.cell_id AND a."year" < b."year"
        ),
        th_rank AS (
            SELECT cell_id, dy, dx,
                   row_number() OVER (
                       PARTITION BY cell_id
                       ORDER BY CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE),
                                dy, dx
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY cell_id) AS m
            FROM th_pairs
        )
        SELECT cell_id, CAST(m AS BIGINT) AS n_pairs,
               CAST(dy AS BIGINT) AS slope_num, CAST(dx AS BIGINT) AS slope_den,
               CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE) AS theil_slope
        FROM th_rank WHERE rn = (m + 1) // 2"""


def mann_kendall(geo, band: int = 3):
    """Per-cell Mann–Kendall monotonic-trend test over the yearly band
    totals — the non-parametric companion to :func:`theilsen_trend` (the
    two are the standard pairing in the land-cover change-detection
    literature: MK decides IF a cell trends, Theil–Sen says how fast).

        S = Σ_{i<j} sign(v_j − v_i)   over years ordered ascending

    trend class: +1 if S>0, −1 if S<0, 0 otherwise (cells with a single
    year report S=0, n_pairs=0, trend=0).

    Exactness: yearly totals are exact int64 cent sums and S is a pure
    integer sign sum — every output column is int64, so the result is
    bit-stable under any partitioning with no quantization needed.

    Scale shape: identical to theilsen_trend — corpus-sized work is only
    the zonal_sums reduce (raw observations never shuffle; one partial row
    per key per batch); pair enumeration runs per cell inside
    hash-bucketed map_groups over the bounded (cell, year) table
    (pairs ≤ years², years is a handful).

    Reference analog: trend diagnostics over the annual composite series
    (src/utils/harmonics.py:14-46 fits a harmonic trend model per pixel;
    MK is the rank-based equivalent our zonal layer adds).

    Output: (cell_id:int64, n_years:int64, n_pairs:int64, s_stat:int64,
    trend:int64).
    """
    import pandas as pd

    s_col = f"s_c{band}"
    yearly = zonal_sums(geo, keys=["cell_id", "year"], bands=(band,))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cell_id", "year"], kind="mergesort")
        cid = g["cell_id"].to_numpy(np.int64)
        v = g[s_col].to_numpy(np.int64)
        brk = np.flatnonzero(np.concatenate(([True], cid[1:] != cid[:-1])))
        ends = np.concatenate((brk[1:], [len(cid)]))
        rows = []
        for s, e in zip(brk, ends):
            k = e - s
            if k < 2:
                rows.append((int(cid[s]), int(k), 0, 0, 0))
                continue
            ii, jj = np.triu_indices(k, 1)
            sgn = int(np.sign(v[s + jj] - v[s + ii]).sum())
            rows.append((int(cid[s]), int(k), len(ii), sgn, int(np.sign(sgn))))
        return pd.DataFrame(
            rows, columns=["cell_id", "n_years", "n_pairs", "s_stat", "trend"]
        ).astype(np.int64)

    return (
        _add_bucket(yearly, ["cell_id"], _default_buckets())
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(["cell_id", "n_years", "n_pairs", "s_stat", "trend"])
    )


def mann_kendall_sql(cells_sql: str, band: int = 3) -> str:
    """Oracle twin of :func:`mann_kendall` — pairwise self-join sign sum."""
    return f"""
        mk_agg AS MATERIALIZED (
            SELECT cell_id, "year", CAST(SUM(c{band}) AS BIGINT) AS v
            FROM ({cells_sql}) GROUP BY cell_id, "year"
        ),
        mk_pairs AS (
            SELECT a.cell_id,
                   CAST(SUM(CASE WHEN b.v > a.v THEN 1
                                 WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT)
                       AS s_stat,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM mk_agg a JOIN mk_agg b
              ON a.cell_id = b.cell_id AND a."year" < b."year"
            GROUP BY a.cell_id
        ),
        mk_years AS (
            SELECT cell_id, CAST(COUNT(*) AS BIGINT) AS n_years
            FROM mk_agg GROUP BY cell_id
        )
        SELECT y.cell_id, y.n_years,
               COALESCE(p.n_pairs, 0) AS n_pairs,
               COALESCE(p.s_stat, 0) AS s_stat,
               CASE WHEN COALESCE(p.s_stat, 0) > 0 THEN 1
                    WHEN COALESCE(p.s_stat, 0) < 0 THEN -1
                    ELSE 0 END AS trend
        FROM mk_years y LEFT JOIN mk_pairs p ON y.cell_id = p.cell_id"""


def trimmed_mean(geo, band: int = 3, trim_pct: int = 10):
    """Per-cell trimmed mean: drop the lowest and highest ⌊n·pct/100⌋
    observations by value, average the rest — the robust composite the
    reference's percentile reducers approximate (A1 family; a trimmed
    mean is the standard cloud/shadow-outlier-resistant composite).

    Exactness: trimming is by VALUE RANK, and rows tied in value are
    interchangeable for the surviving SUM, so the exact int64 cent sum of
    the kept rows is tiebreak-free; the mean is one pinned division.

    Scale shape: the standard holistic-aggregate plan — hash-bucket cells
    (~2×CPUs buckets), one vectorized in-task sort per bucket; the driver
    never sees raw observations.

    Output: (cell_id:int64, n:int64, kept:int64, trim_sum:int64,
    trimmed_mean:f64).
    """
    import pandas as pd

    s_col = f"c{band}"

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cell_id", s_col], kind="mergesort")
        cid = g["cell_id"].to_numpy(np.int64)
        v = g[s_col].to_numpy(np.int64)
        # segment bounds per cell
        brk = np.flatnonzero(np.concatenate(([True], cid[1:] != cid[:-1])))
        ends = np.concatenate((brk[1:], [len(cid)]))
        rows = []
        for s, e in zip(brk, ends):
            n = e - s
            k = (n * trim_pct) // 100
            kept = n - 2 * k
            if kept <= 0:
                continue
            tsum = int(v[s + k : e - k].sum())
            rows.append(
                (int(cid[s]), int(n), int(kept), tsum, float(tsum) / float(kept))
            )
        return pd.DataFrame(
            rows, columns=["cell_id", "n", "kept", "trim_sum", "trimmed_mean"]
        ).astype(
            {
                "cell_id": np.int64,
                "n": np.int64,
                "kept": np.int64,
                "trim_sum": np.int64,
                "trimmed_mean": np.float64,
            }
        )

    return (
        _add_bucket(
            geo.select_columns(["cell_id", s_col]), ["cell_id"], _default_buckets()
        )
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(["cell_id", "n", "kept", "trim_sum", "trimmed_mean"])
    )


def trimmed_mean_sql(cells_sql: str, band: int = 3, trim_pct: int = 10) -> str:
    """Oracle twin of :func:`trimmed_mean`."""
    return f"""
        tm_rank AS (
            SELECT cell_id, c{band} AS v,
                   row_number() OVER (PARTITION BY cell_id ORDER BY c{band})
                       AS rn,
                   COUNT(*) OVER (PARTITION BY cell_id) AS n
            FROM ({cells_sql})
        )
        SELECT cell_id,
               CAST(MIN(n) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS kept,
               CAST(SUM(v) AS BIGINT) AS trim_sum,
               CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS trimmed_mean
        FROM tm_rank
        WHERE rn > (n * {trim_pct}) // 100
          AND rn <= n - (n * {trim_pct}) // 100
        GROUP BY cell_id
        HAVING COUNT(*) > 0"""


PSI_BINS = 16
PSI_HI = 600_000  # cents; fixed bin domain shared with the SQL twin


def psi_drift(geo, band: int = 3, year_a: int = 2020, year_b: int = 2022):
    """Population-stability-index drift report between two years of a band
    distribution — the standard production data-drift monitor.  Counts
    fall into ``PSI_BINS`` fixed-width integer bins over [0, PSI_HI);
    each bin's PSI term uses add-one smoothing:

        term = (p − q)·ln(p/q),  p = (nₐ+1)/(Nₐ+B), q = (n_b+1)/(N_b+B)

    Exactness: binning is pure integer arithmetic; counts are exact int64
    Sums; the B=16 final terms are pinned libm expressions computed on
    the tiny bin table (output is PER BIN — no order-dependent global
    float sum crosses the gate).

    Output: (bin:int64, n_a:int64, n_b:int64, psi_term:f64), 16 rows.
    """
    import math

    import ray.data as rd

    from ray.data.aggregate import Sum

    B = PSI_BINS
    s_col = f"c{band}"

    def partial(t: pa.Table) -> pa.Table:
        yr = t.column("year").to_numpy(zero_copy_only=False)
        v = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.minimum(np.maximum(v, 0) * B // PSI_HI, B - 1)
        ca = np.zeros(B, dtype=np.int64)
        cb = np.zeros(B, dtype=np.int64)
        np.add.at(ca, b[yr == year_a], 1)
        np.add.at(cb, b[yr == year_b], 1)
        return pa.table(
            {
                "bin": pa.array(np.arange(B, dtype=np.int64)),
                "n_a": pa.array(ca),
                "n_b": pa.array(cb),
            }
        )

    agg = (
        geo.select_columns(["year", s_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n_a", alias_name="n_a"), Sum("n_b", alias_name="n_b"))
        .to_pandas()
    )
    if len(agg) == 0:
        # zero input batches -> empty (column-less) frame; the report is
        # still the B smoothed bins with zero counts
        import pandas as pd

        agg = pd.DataFrame(
            {
                "bin": np.arange(B, dtype=np.int64),
                "n_a": np.zeros(B, np.int64),
                "n_b": np.zeros(B, np.int64),
            }
        )
    agg = agg.sort_values("bin").reset_index(drop=True)
    ta = float(agg["n_a"].sum())
    tb = float(agg["n_b"].sum())
    p = (agg["n_a"].to_numpy(np.float64) + 1.0) / (ta + float(B))
    q = (agg["n_b"].to_numpy(np.float64) + 1.0) / (tb + float(B))
    log_u = np.frompyfunc(math.log, 1, 1)
    term = (p - q) * log_u(p / q).astype(np.float64)
    return rd.from_arrow(
        pa.table(
            {
                "bin": pa.array(agg["bin"].to_numpy(np.int64)),
                "n_a": pa.array(agg["n_a"].to_numpy(np.int64)),
                "n_b": pa.array(agg["n_b"].to_numpy(np.int64)),
                "psi_term": pa.array(term, pa.float64()),
            }
        )
    )


def psi_drift_sql(
    cells_sql: str, band: int = 3, year_a: int = 2020, year_b: int = 2022
) -> str:
    """Oracle twin of :func:`psi_drift`."""
    B = PSI_BINS
    return f"""
        ps_bin AS (
            SELECT least(greatest(c{band}, 0) * {B} // {PSI_HI}, {B - 1})
                       AS bin,
                   "year"
            FROM ({cells_sql})
            WHERE "year" IN ({year_a}, {year_b})
        ),
        ps_ct AS (
            SELECT r.bin,
                   CAST(COALESCE(SUM(CASE WHEN g."year" = {year_a}
                                          THEN 1 ELSE 0 END), 0) AS BIGINT)
                       AS n_a,
                   CAST(COALESCE(SUM(CASE WHEN g."year" = {year_b}
                                          THEN 1 ELSE 0 END), 0) AS BIGINT)
                       AS n_b
            FROM range(0, {B}) AS r(bin)
            LEFT JOIN ps_bin g ON g.bin = r.bin
            GROUP BY r.bin
        ),
        ps_tot AS (
            SELECT CAST(SUM(n_a) AS DOUBLE) AS ta,
                   CAST(SUM(n_b) AS DOUBLE) AS tb
            FROM ps_ct
        )
        SELECT c.bin, c.n_a, c.n_b,
               ((CAST(c.n_a AS DOUBLE) + 1.0) / (t.ta + {float(B)!r})
                - (CAST(c.n_b AS DOUBLE) + 1.0) / (t.tb + {float(B)!r}))
               * ln(((CAST(c.n_a AS DOUBLE) + 1.0) / (t.ta + {float(B)!r}))
                    / ((CAST(c.n_b AS DOUBLE) + 1.0) / (t.tb + {float(B)!r})))
                   AS psi_term
        FROM ps_ct c CROSS JOIN ps_tot t"""


def climatology_anomaly(geo, band: int = 3, target_year: int = 2022):
    """Monthly climatology + anomaly map — the seasonal-baseline analysis
    the reference's harmonic fits feed: per (cell, month), the mean of the
    band over all NON-target years (the climatology) and the target
    year's departure from it.

    Exactness: both means are exact integer-quantized divisions
    (mean_q = (s·2²⁰)//n — the idw_fill discipline) and the anomaly is
    ONE pinned double expression (t_q − c_q)/2²⁰ over the two int64
    means.  Months come from the shared calendar helper
    (sources/basemap.month_of_doy ↔ month_sql_expr).

    Scale shape: one corpus pass computing per-(cell, month) partials for
    BOTH branches at once (target flag folded into the sums), the
    standard bucketed integer combine, a stateless finalize.  Cells with
    no climatology observations for a month are dropped (both sides).

    Output: (cell_id:int64, month:int64, clim_n:int64, clim_q:int64,
    target_n:int64, target_q:int64, anomaly:f64).
    """
    from ..sources.basemap import month_of_doy

    Q = IDW_SCALE_INT
    s_col = f"c{band}"

    def partial(t: pa.Table) -> pa.Table:
        yr = t.column("year").to_numpy(zero_copy_only=False).astype(np.int64)
        doy = t.column("doy").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        mon = month_of_doy(yr, doy).astype(np.int64)
        is_t = (yr == target_year).astype(np.int64)
        part = pa.table(
            {
                "cell_id": t.column("cell_id"),
                "month": pa.array(mon),
                "cn": pa.array(1 - is_t),
                "cs": pa.array(v * (1 - is_t)),
                "tn": pa.array(is_t),
                "ts_": pa.array(v * is_t),
            }
        )
        g = part.group_by(["cell_id", "month"]).aggregate(
            [("cn", "sum"), ("cs", "sum"), ("tn", "sum"), ("ts_", "sum")]
        )
        return g.rename_columns(["cell_id", "month", "cn", "cs", "tn", "ts_"])

    agg = bucketed_sum(
        geo.map_batches(partial, batch_format="pyarrow"),
        keys=["cell_id", "month"],
        sum_cols=["cn", "cs", "tn", "ts_"],
        recombine_batch_size=None,
    )

    empty = pa.table(
        {
            "cell_id": pa.array([], pa.int64()),
            "month": pa.array([], pa.int64()),
            "clim_n": pa.array([], pa.int64()),
            "clim_q": pa.array([], pa.int64()),
            "target_n": pa.array([], pa.int64()),
            "target_q": pa.array([], pa.int64()),
            "anomaly": pa.array([], pa.float64()),
        }
    )

    def finalize(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        cn = t.column("cn").to_numpy(zero_copy_only=False).astype(np.int64)
        cs = t.column("cs").to_numpy(zero_copy_only=False).astype(np.int64)
        tn = t.column("tn").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t.column("ts_").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (cn > 0) & (tn > 0)
        cn, cs, tn, ts = cn[keep], cs[keep], tn[keep], ts[keep]
        clim_q = (cs * Q) // cn
        tgt_q = (ts * Q) // tn
        anom = (tgt_q.astype(np.float64) - clim_q.astype(np.float64)) / float(Q)
        karr = pa.array(keep)
        return pa.table(
            {
                "cell_id": t.column("cell_id").filter(karr),
                "month": t.column("month").filter(karr),
                "clim_n": pa.array(cn),
                "clim_q": pa.array(clim_q),
                "target_n": pa.array(tn),
                "target_q": pa.array(tgt_q),
                "anomaly": pa.array(anom),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def climatology_anomaly_sql(cells_sql: str, band: int = 3, target_year: int = 2022) -> str:
    """Oracle twin of :func:`climatology_anomaly`."""
    from ..sources.basemap import month_sql_expr

    Q = IDW_SCALE_INT
    mon = month_sql_expr('"year"', "doy")
    return f"""
        cl_base AS (
            SELECT cell_id, {mon} AS month,
                   CASE WHEN "year" = {target_year} THEN 0 ELSE 1 END AS isc,
                   c{band} AS v
            FROM ({cells_sql})
        ),
        cl_agg AS (
            SELECT cell_id, month,
                   CAST(SUM(isc) AS BIGINT) AS clim_n,
                   CAST(SUM(isc * v) AS BIGINT) AS cs,
                   CAST(SUM(1 - isc) AS BIGINT) AS target_n,
                   CAST(SUM((1 - isc) * v) AS BIGINT) AS ts
            FROM cl_base GROUP BY cell_id, month
        )
        SELECT cell_id, month, clim_n,
               (cs * {Q}) // clim_n AS clim_q,
               target_n,
               (ts * {Q}) // target_n AS target_q,
               (CAST((ts * {Q}) // target_n AS DOUBLE)
                - CAST((cs * {Q}) // clim_n AS DOUBLE)) / {float(Q)!r}
                   AS anomaly
        FROM cl_agg WHERE clim_n > 0 AND target_n > 0"""


def grouped_weighted_quantile(
    ds,
    keys: list[str],
    val_col: str,
    weight_col: str,
    q_num: int = 1,
    q_den: int = 2,
    out_col: str = "wq_c",
    rows_hint: int | None = None,
):
    """Exact weighted q-quantile per key group: the smallest ×100-scaled
    value v with cum_weight(≤v) · q_den ≥ q_num · total_weight — an
    integer cross-multiplication, never a float compare, so the rule is
    bit-replayable in SQL window functions.

    Scale shape (the zonal_percentiles holistic discipline): raw rows
    reduce per batch to distinct (keys, value_cents) rows carrying summed
    integer weights (two-phase ``bucketed_sum``); the sorted cumulative
    scan then runs per key in ``map_groups`` over the value-DISTINCT
    table, whose per-key size is the value cardinality, not the row
    count.  Weighted medians/quantiles are the exact-aggregation twin of
    the reference's percentile reducer (src/utils/s2process.py:138-139)
    with per-record weights.

    Output: (keys…, {out_col}:int64) — quantile value in cents.
    """
    from ..state.money import to_cents

    def partial(t: pa.Table) -> pa.Table:
        tb = pa.table(
            {
                **{k: t.column(k) for k in keys},
                "v_c": pa.array(to_cents(t.column(val_col).to_numpy(zero_copy_only=False))),
                "w_c": pa.array(to_cents(t.column(weight_col).to_numpy(zero_copy_only=False))),
            }
        )
        out = tb.group_by(keys + ["v_c"]).aggregate([("w_c", "sum")])
        return out.rename_columns(keys + ["v_c", "w_c"])

    dist = bucketed_sum(
        ds.select_columns(keys + [val_col, weight_col]).map_batches(
            partial, batch_format="pyarrow"
        ),
        keys + ["v_c"],
        ["w_c"],
        rows_hint=rows_hint,
    )

    import pandas as pd

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("v_c", kind="mergesort")
        cw = g["w_c"].to_numpy(np.int64).cumsum()
        tot = int(cw[-1])
        sel = np.nonzero(cw * q_den >= q_num * tot)[0]
        first = int(sel[0])
        out = g.iloc[[0]][keys].copy()
        out[out_col] = np.int64(g["v_c"].to_numpy(np.int64)[first])
        return out

    return dist.groupby(keys).map_groups(pick, batch_format="pandas")


def grouped_weighted_quantile_sql(
    table_sql: str,
    keys: list[str],
    val_col: str,
    weight_col: str,
    q_num: int = 1,
    q_den: int = 2,
    out_col: str = "wq_c",
) -> str:
    """Oracle twin of :func:`grouped_weighted_quantile` — same distinct
    value table, window cumsum and integer threshold."""
    ks = ", ".join(keys)
    return f"""
        WITH wq_w AS (
            SELECT {ks},
                   CAST(round({val_col} * 100, 0) AS BIGINT) AS v_c,
                   CAST(SUM(CAST(round({weight_col} * 100, 0) AS BIGINT))
                        AS BIGINT) AS w_c
            FROM ({table_sql}) GROUP BY {ks}, v_c
        ),
        wq_c AS (
            SELECT {ks}, v_c,
                   SUM(w_c) OVER (PARTITION BY {ks} ORDER BY v_c) AS cw,
                   SUM(w_c) OVER (PARTITION BY {ks}) AS tot
            FROM wq_w
        )
        SELECT {ks}, CAST(MIN(v_c) AS BIGINT) AS {out_col}
        FROM wq_c WHERE cw * {q_den} >= {q_num} * tot
        GROUP BY {ks}"""


def geodesic_dist(
    geo,
    obstacle_band: int = 3,
    obstacle_thresh: int = 480_000,
    source_band: int = 2,
    source_thresh: int = 330_000,
    cap: int = 64,
):
    """Obstacle-aware geodesic (least-step) distance over the occupied
    grid: rook-neighbor BFS from the SOURCE cells, constrained to the
    PASSABLE set — the cost-distance product the reference's
    distance-from-water / distance-from-cloud layers approximate, but with
    obstacles actually blocking the path (unlike :func:`dist_transform`'s
    free-space Chebyshev rings).

    Integer rules on the quantized per-cell sums (never a float compare):
    passable ⇔ s_c{obstacle_band} ≤ obstacle_thresh·n (dense cells are
    obstacles); source ⇔ passable AND s_c{source_band} > source_thresh·n.
    ``dist`` is the minimum number of rook steps through passable cells
    from any source (0 for sources), capped at ``cap``; obstacles and
    unreachable passable cells report −1.

    Exactness: every column is int64 and BFS level-sets are
    partition-invariant, so the result is bit-stable; the SQL twin walks
    the identical graph with a capped recursive UNION and takes MIN(d).

    Scale shape: the only corpus-sized pass is the zonal_sums reduce; the
    BFS itself runs on the collected skinny (cell_id, s2, s3, n) table —
    AOI-grid-bounded (≤4^level rows, independent of corpus size, the
    flow_accumulation discipline) — as ≤cap vectorized frontier rounds;
    the dist side attaches back by broadcast searchsorted probe.  At a
    finer grid the same level-synchronous BFS runs as bucketed frontier
    joins (the dup_clusters spanning-forest pattern), one (cell, d) row
    per newly-reached cell per round.

    Output: (cell_id:int64, passable:int64, dist:int64).
    """
    import ray

    from ..state.cells import CELL_LEVEL, decode, morton

    so, ss = f"s_c{obstacle_band}", f"s_c{source_band}"
    cellsums = zonal_sums(
        geo, keys=["cell_id"], bands=(source_band, obstacle_band)
    ).materialize()
    df = cellsums.to_pandas()
    ids = df["cell_id"].to_numpy(np.int64)
    s_o = df[so].to_numpy(np.int64)
    s_s = df[ss].to_numpy(np.int64)
    n = df["n"].to_numpy(np.int64)
    passable_m = s_o <= obstacle_thresh * n
    p = np.sort(ids[passable_m])
    n_grid = np.int64(1) << CELL_LEVEL

    dist = np.full(len(p), -1, np.int64)
    srcs = np.sort(ids[passable_m & (s_s > source_thresh * n)])
    if len(p):
        dist[np.searchsorted(p, srcs)] = 0
    frontier = srcs
    step = 1
    while len(frontier) and len(p) and step <= cap:
        ix, iy = decode(frontier, CELL_LEVEL)
        nbr = []
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            tx, ty = ix + dx, iy + dy
            ok = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
            nbr.append(morton(tx[ok], ty[ok]).astype(np.int64))
        cand = np.unique(np.concatenate(nbr)) if nbr else np.array([], np.int64)
        pos = np.minimum(np.searchsorted(p, cand), max(len(p) - 1, 0))
        hit = (p[pos] == cand) & (dist[pos] < 0)
        idx = pos[hit]
        if not len(idx):
            break
        dist[idx] = step
        frontier = p[idx]
        step += 1
    side_ref = ray.put({"k": p, "d": dist})

    def finalize(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        cid = t.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        s_ob = t.column(so).to_numpy(zero_copy_only=False).astype(np.int64)
        nn = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        out = np.full(len(cid), -1, np.int64)
        if len(side["k"]):
            pos = np.minimum(np.searchsorted(side["k"], cid), len(side["k"]) - 1)
            hit = side["k"][pos] == cid
            out[hit] = side["d"][pos[hit]]
        return pa.table(
            {
                "cell_id": pa.array(cid, pa.int64()),
                "passable": pa.array(
                    (s_ob <= obstacle_thresh * nn).astype(np.int64)
                ),
                "dist": pa.array(out),
            }
        )

    return cellsums.map_batches(finalize, batch_format="pyarrow")


def geodesic_dist_sql(
    cells_sql: str,
    obstacle_band: int = 3,
    obstacle_thresh: int = 480_000,
    source_band: int = 2,
    source_thresh: int = 330_000,
    cap: int = 64,
) -> str:
    """Oracle twin of :func:`geodesic_dist`: identical integer passable /
    source rules, capped recursive-UNION BFS over the rook-neighbor
    morton equi-join, MIN(d) per cell, −1 COALESCE.  Must be composed
    under ``WITH RECURSIVE``."""
    from ..state.cells import CELL_LEVEL, morton_decode_sql_expr, morton_sql_expr

    hi = (1 << CELL_LEVEL) - 1
    nbr = morton_sql_expr("(s.ix + o.dx)", "(s.iy + o.dy)", CELL_LEVEL)
    return f"""
        gd_agg AS MATERIALIZED (
            SELECT cell_id,
                   CAST(SUM(c{obstacle_band}) AS BIGINT) AS s_o,
                   CAST(SUM(c{source_band}) AS BIGINT) AS s_s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM ({cells_sql}) GROUP BY cell_id
        ),
        gd_pass AS MATERIALIZED (
            SELECT cell_id,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "x")} AS ix,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "y")} AS iy
            FROM gd_agg WHERE s_o <= {obstacle_thresh} * n
        ),
        gd_offs AS (SELECT * FROM (VALUES (1, 0), (-1, 0), (0, 1), (0, -1))
                    AS t(dx, dy)),
        gd_bfs(cell_id, d) AS (
            SELECT cell_id, CAST(0 AS BIGINT) AS d
            FROM gd_agg
            WHERE s_o <= {obstacle_thresh} * n AND s_s > {source_thresh} * n
            UNION
            SELECT p.cell_id, b.d + 1
            FROM gd_bfs b
            JOIN gd_pass s ON s.cell_id = b.cell_id
            CROSS JOIN gd_offs o
            JOIN gd_pass p ON p.cell_id = {nbr}
            WHERE b.d < {cap}
              AND s.ix + o.dx BETWEEN 0 AND {hi}
              AND s.iy + o.dy BETWEEN 0 AND {hi}
        ),
        gd_min AS (SELECT cell_id, MIN(d) AS d FROM gd_bfs GROUP BY cell_id)
        SELECT a.cell_id,
               CASE WHEN a.s_o <= {obstacle_thresh} * a.n THEN 1 ELSE 0 END
                   AS passable,
               CAST(COALESCE(m.d, -1) AS BIGINT) AS dist
        FROM gd_agg a LEFT JOIN gd_min m ON m.cell_id = a.cell_id"""


def medoid_composite(geo, num_buckets: int | None = None,
                     rows_hint: int | None = None):
    """Medoid composite per cell: the observation minimizing the squared
    distance to the per-cell per-band LOWER medians — the cloud-robust
    best-pixel compositing rule (the medoid composite of the Landsat
    time-series literature; the reference's percentile composites'
    robust sibling, src/utils/s2process.py compositing family).

    Pinned rules: medians are the rank-ceil(n/2) pick on the ×100 int
    bands (the rolling_median convention — never interpolated); distance
    is Σ_b (c_b − med_b)² in exact int64; winner ties break
    (d2, doc_id, span_idx) ascending.

    Scale shape: ONE cell-bucketed exchange (the zonal holistic
    discipline — bounded, skew-safe buckets); inside a bucket both the
    medians AND the argmin run as whole-bucket vectorized passes
    (lexsort + segment offsets), zero per-cell Python.

    Output: (cell_id, doc_id, span_idx, c0..c5) — one winner row per cell.
    """
    import pandas as pd

    nb = num_buckets or _default_buckets(rows_hint)
    cols = ["cell_id", "doc_id", "span_idx"] + [f"c{b}" for b in range(6)]

    def fold(g: pd.DataFrame) -> pa.Table:
        cell = g["cell_id"].to_numpy(np.uint64)
        # per-bucket cell codes via sort order
        order = np.argsort(cell, kind="mergesort")
        cs = cell[order]
        first = np.ones(len(cs), bool)
        first[1:] = cs[1:] != cs[:-1]
        code_sorted = np.cumsum(first) - 1
        code = np.empty(len(cs), np.int64)
        code[order] = code_sorted
        ncell = int(code_sorted[-1]) + 1 if len(cs) else 0
        V = np.stack(
            [g[f"c{b}"].to_numpy(np.int64) for b in range(6)], axis=1
        )
        med = np.empty((ncell, 6), np.int64)
        # segment boundaries shared across bands
        starts = np.nonzero(first)[0]
        cnts = np.diff(np.concatenate([starts, [len(cs)]]))
        for b in range(6):
            o = np.lexsort((V[:, b], code))
            med[:, b] = V[o][starts + (cnts + 1) // 2 - 1, b]
        d2 = ((V - med[code]) ** 2).sum(axis=1)
        # winner per cell: (d2, doc_id, span_idx) ascending.  String ids
        # become ordinal codes first (np.unique sorts lexicographically)
        # so the lexsort runs on pure ints.
        doc = g["doc_id"].to_numpy()
        span = g["span_idx"].to_numpy(np.int64)
        _, dcode = np.unique(doc, return_inverse=True)
        w = np.lexsort((span, dcode, d2, code))
        wfirst = np.ones(len(w), bool)
        wfirst[1:] = code[w][1:] != code[w][:-1]
        win = w[wfirst]
        out = {
            "cell_id": pa.array(cell[win].astype(np.int64)),
            "doc_id": pa.array(doc[win], pa.string()),
            "span_idx": pa.array(span[win]),
        }
        for b in range(6):
            out[f"c{b}"] = pa.array(V[win, b])
        return pa.table(out)

    skinny = geo.select_columns(cols)
    return (
        _add_bucket(skinny, ["cell_id"], nb)
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .select_columns(cols)
    )


def medoid_composite_sql(cells_sql: str) -> str:
    """Oracle twin of :func:`medoid_composite`: long-form band unpivot,
    rank-ceil(n/2) medians, squared-distance sum, QUALIFY winner."""
    vals = ", ".join(f"({b}, c{b})" for b in range(6))
    return f"""
        md_in AS MATERIALIZED (
            SELECT cell_id, doc_id, span_idx, c0, c1, c2, c3, c4, c5
            FROM ({cells_sql})
        ),
        md_l AS (
            SELECT cell_id, doc_id, span_idx, b.band, b.v
            FROM md_in, LATERAL (VALUES {vals}) b(band, v)
        ),
        md_r AS (
            SELECT cell_id, band, v,
                   ROW_NUMBER() OVER (
                       PARTITION BY cell_id, band ORDER BY v
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY cell_id, band) AS n
            FROM md_l
        ),
        md_m AS (
            SELECT cell_id, band, v AS med FROM md_r WHERE rn = (n + 1) // 2
        ),
        md_d AS (
            SELECT l.cell_id, l.doc_id, l.span_idx,
                   CAST(SUM((l.v - m.med) * (l.v - m.med)) AS BIGINT) AS d2
            FROM md_l l
            JOIN md_m m ON m.cell_id = l.cell_id AND m.band = l.band
            GROUP BY 1, 2, 3
        ),
        md_w AS (
            SELECT cell_id, doc_id, span_idx FROM md_d
            QUALIFY row_number() OVER (
                PARTITION BY cell_id ORDER BY d2, doc_id, span_idx
            ) = 1
        )
        SELECT CAST(w.cell_id AS BIGINT) AS cell_id, w.doc_id,
               CAST(w.span_idx AS BIGINT) AS span_idx,
               i.c0, i.c1, i.c2, i.c3, i.c4, i.c5
        FROM md_w w
        JOIN md_in i ON i.cell_id = w.cell_id AND i.doc_id = w.doc_id
                    AND i.span_idx = w.span_idx"""


# ---------------------------------------------------------------------------
# Emerging hot spot analysis (space-time composite)
# ---------------------------------------------------------------------------

EHS_Z_CRIT = 1.96  # two-sided 5% hot/cold z threshold, pinned both branches


def emerging_hotspots(geo, band: int = 3, k: int = 1):
    """Emerging-hot-spot analysis — the space-time composite of the two
    primitives this layer already certifies separately: a per-YEAR
    Getis-Ord Gi* z-score per occupied cell (:func:`getis_ord` semantics,
    global mean/variance taken within each year), then a Mann-Kendall
    monotonic-trend test (:func:`mann_kendall` semantics) over each cell's
    z series, classified into the standard emerging-hotspot categories
    (new / intensifying / diminishing / persistent / historical, hot and
    cold) — the change-detection rollup the reference's annual land-cover
    series exists to feed (per-year composites, src/utils/s2process.py,
    followed by year-over-year change assessment, ProjectWorkflow.md).

    Determinism: per-(cell, year) lag/weight and per-year (n, S1, S2) are
    exact int64; the z expression is the SAME pinned IEEE double formula
    as :func:`getis_ord` (bit-identical to DuckDB's libm); the MK statistic
    sums integer signs of differences of those bit-identical doubles; the
    hot/cold flags compare them to the literal {EHS_Z_CRIT}; the category
    is an integer-rule CASE chain.  Years with fewer than 2 occupied cells
    carry no variance and are excluded on both branches; a (cell, year)
    whose pinned denominator is not > 0 (zero-variance year, or a
    neighborhood covering every occupied cell) has no defined z and is
    dropped by the identical `den > 0` rule on both branches.

    Scale shape: the corpus-sized work is the one ``zonal_sums`` reduce
    (raw observations never shuffle); the per-year fan, bucketed combine
    and MK classification all run on the AOI×years-bounded cell table —
    the same boundedness contract as :func:`getis_ord` (≤ 4^CELL_LEVEL
    cells/year; level 12 ⇒ ≤17M, real AOIs ~1e5).  The driver holds only
    the per-year scalar stats and the occupied-key array it broadcasts.

    Output: (cell_id:int64, n_years, n_hot, n_cold, s_stat, trend,
    hot_last, cold_last: int64, category:string).
    """
    import pandas as pd
    import ray
    import ray.data as rd

    from ..state.cells import CELL_LEVEL, decode, morton

    s_col = f"s_c{band}"
    yearly = zonal_sums(geo, keys=["cell_id", "year"], bands=(band,)).materialize()
    pdf = yearly.to_pandas()
    empty = pa.table(
        {
            "cell_id": pa.array([], pa.int64()),
            "n_years": pa.array([], pa.int64()),
            "n_hot": pa.array([], pa.int64()),
            "n_cold": pa.array([], pa.int64()),
            "s_stat": pa.array([], pa.int64()),
            "trend": pa.array([], pa.int64()),
            "hot_last": pa.array([], pa.int64()),
            "cold_last": pa.array([], pa.int64()),
            "category": pa.array([], pa.string()),
        }
    )
    st = (
        pdf.groupby("year")
        .agg(
            n=("cell_id", "size"),
            s1=(s_col, "sum"),
            s2=(s_col, lambda v: int((v.to_numpy(np.int64) ** 2).sum())),
        )
        .reset_index()
    )
    st = st[st["n"] >= 2]  # a 1-cell year has zero variance: excluded
    if len(st) == 0:
        return rd.from_arrow(empty)
    years_arr = np.sort(st["year"].to_numpy(np.int64))
    order = np.argsort(st["year"].to_numpy(np.int64), kind="stable")
    n_arr = st["n"].to_numpy(np.int64)[order]
    s1_arr = st["s1"].to_numpy(np.int64)[order]
    s2_arr = st["s2"].to_numpy(np.int64)[order]

    kept = pdf[pdf["year"].isin(years_arr)]
    occ_pack = np.sort(
        kept["cell_id"].to_numpy(np.int64) * 64
        + np.searchsorted(years_arr, kept["year"].to_numpy(np.int64))
    )
    consts_ref = ray.put((years_arr, n_arr, s1_arr, s2_arr, occ_pack))

    n_grid = np.int64(1) << CELL_LEVEL
    offsets = [(dx, dy) for dx in range(-k, k + 1) for dy in range(-k, k + 1)]
    year_set = set(int(y) for y in years_arr)

    def fan(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m_keep = pc.is_in(t.column("year"), pa.array(sorted(year_set), pa.int64()))
        t = t.filter(m_keep)
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        yr = t.column("year").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = decode(cid, CELL_LEVEL)
        parts = []
        for dx, dy in offsets:
            tx, ty = ix + dx, iy + dy
            m = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
            parts.append(
                pa.table(
                    {
                        "cell_id": pa.array(morton(tx[m], ty[m]), type=pa.int64()),
                        "year": pa.array(yr[m]),
                        "v_src": pa.array(v[m]),
                    }
                )
            )
        part = pa.concat_tables(parts)
        out = part.group_by(["cell_id", "year"]).aggregate(
            [("v_src", "sum"), ("cell_id", "count")]
        )
        return out.rename_columns(["cell_id", "year", "lag", "w"])

    agg = bucketed_sum(
        yearly.map_batches(fan, batch_format="pyarrow"),
        keys=["cell_id", "year"],
        sum_cols=["lag", "w"],
        rows_hint=len(pdf),
        recombine_batch_size=None,
    )

    def z_final(t: pa.Table) -> pa.Table:
        zt = pa.table(
            {
                "cell_id": pa.array([], pa.int64()),
                "year": pa.array([], pa.int64()),
                "z": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return zt
        years_a, n_a, s1_a, s2_a, occ = ray.get(consts_ref)
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        yr = t.column("year").to_numpy(zero_copy_only=False).astype(np.int64)
        yi = np.searchsorted(years_a, yr)
        pack = cid * 64 + yi
        pos = np.searchsorted(occ, pack)
        keep = (pos < len(occ)) & (occ[np.minimum(pos, len(occ) - 1)] == pack)
        if not keep.any():
            return zt
        cid, yr, yi = cid[keep], yr[keep], yi[keep]
        lag = t.column("lag").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        n, s1, s2 = n_a[yi], s1_a[yi], s2_a[yi]
        num = n * lag - w * s1
        n_d = n.astype(np.float64)
        w_d = w.astype(np.float64)
        den = np.sqrt(
            n_d * s2.astype(np.float64) - s1.astype(np.float64) * s1.astype(np.float64)
        ) * np.sqrt((n_d * w_d - w_d * w_d) / (n_d - 1.0))
        ok = den > 0  # z undefined at zero variance — same rule in SQL
        return pa.table(
            {
                "cell_id": pa.array(cid[ok], pa.int64()),
                "year": pa.array(yr[ok], pa.int64()),
                "z": pa.array(num[ok].astype(np.float64) / den[ok], pa.float64()),
            }
        )

    z_ds = agg.map_batches(z_final, batch_format="pyarrow")
    zc = EHS_Z_CRIT

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cell_id", "year"], kind="mergesort")
        cid = g["cell_id"].to_numpy(np.int64)
        z = g["z"].to_numpy(np.float64)
        brk = np.flatnonzero(np.concatenate(([True], cid[1:] != cid[:-1])))
        ends = np.concatenate((brk[1:], [len(cid)]))
        rows = []
        for s, e in zip(brk, ends):
            zs = z[s:e]
            ny = e - s
            if ny < 2:
                s_stat = 0
            else:
                ii, jj = np.triu_indices(ny, 1)
                s_stat = int(np.sign(zs[jj] - zs[ii]).sum())
            trend = int(np.sign(s_stat))
            n_hot = int((zs > zc).sum())
            n_cold = int((zs < -zc).sum())
            hot_last = int(zs[-1] > zc)
            cold_last = int(zs[-1] < -zc)
            # CASE chain — transliterated verbatim in emerging_hotspots_sql
            if hot_last and n_hot == 1:
                cat = "new_hot"
            elif hot_last and trend > 0:
                cat = "intensifying_hot"
            elif hot_last and trend < 0:
                cat = "diminishing_hot"
            elif hot_last:
                cat = "persistent_hot"
            elif n_hot > 0:
                cat = "historical_hot"
            elif cold_last and n_cold == 1:
                cat = "new_cold"
            elif cold_last and trend < 0:
                cat = "intensifying_cold"
            elif cold_last and trend > 0:
                cat = "diminishing_cold"
            elif cold_last:
                cat = "persistent_cold"
            elif n_cold > 0:
                cat = "historical_cold"
            else:
                cat = "none"
            rows.append(
                (int(cid[s]), ny, n_hot, n_cold, s_stat, trend, hot_last, cold_last, cat)
            )
        out = pd.DataFrame(
            rows,
            columns=[
                "cell_id",
                "n_years",
                "n_hot",
                "n_cold",
                "s_stat",
                "trend",
                "hot_last",
                "cold_last",
                "category",
            ],
        )
        for c in out.columns[:-1]:
            out[c] = out[c].astype(np.int64)
        return out

    return (
        _add_bucket(z_ds, ["cell_id"], _default_buckets())
        .groupby("bucket")
        .map_groups(classify, batch_format="pandas")
        .select_columns(
            [
                "cell_id",
                "n_years",
                "n_hot",
                "n_cold",
                "s_stat",
                "trend",
                "hot_last",
                "cold_last",
                "category",
            ]
        )
    )


def emerging_hotspots_sql(cells_sql: str, band: int = 3, k: int = 1) -> str:
    """Oracle twin of :func:`emerging_hotspots`: per-year fan + grouped
    integer sums, identical pinned z expression, MK pairwise sign self-join
    over the z doubles, verbatim CASE classification chain."""
    from ..state.cells import CELL_LEVEL, morton_decode_sql_expr, morton_sql_expr

    hi = (1 << CELL_LEVEL) - 1
    zc = EHS_Z_CRIT
    offs = ", ".join(
        f"({dx}, {dy})" for dx in range(-k, k + 1) for dy in range(-k, k + 1)
    )
    return f"""
        ehs_agg AS MATERIALIZED (
            SELECT cell_id, "year", CAST(SUM(c{band}) AS BIGINT) AS v
            FROM ({cells_sql}) GROUP BY cell_id, "year"
        ),
        ehs_tot AS (
            SELECT "year",
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(v) AS BIGINT) AS s1,
                   CAST(SUM(v * v) AS BIGINT) AS s2
            FROM ehs_agg GROUP BY "year" HAVING COUNT(*) >= 2
        ),
        ehs_dec AS (
            SELECT a.cell_id, a."year", a.v,
                   {morton_decode_sql_expr("a.cell_id", CELL_LEVEL, "x")} AS ix,
                   {morton_decode_sql_expr("a.cell_id", CELL_LEVEL, "y")} AS iy
            FROM ehs_agg a SEMI JOIN ehs_tot t ON a."year" = t."year"
        ),
        ehs_offs AS (SELECT * FROM (VALUES {offs}) AS t(dx, dy)),
        ehs_fan AS (
            SELECT {morton_sql_expr("(d.ix + o.dx)", "(d.iy + o.dy)", CELL_LEVEL)}
                       AS cell_id,
                   d."year", d.v AS v_src
            FROM ehs_dec d CROSS JOIN ehs_offs o
            WHERE d.ix + o.dx BETWEEN 0 AND {hi}
              AND d.iy + o.dy BETWEEN 0 AND {hi}
        ),
        ehs_loc AS (
            SELECT f.cell_id, f."year",
                   CAST(COUNT(*) AS BIGINT) AS w,
                   CAST(SUM(f.v_src) AS BIGINT) AS lag
            FROM ehs_fan f
            JOIN ehs_agg a ON f.cell_id = a.cell_id AND f."year" = a."year"
            GROUP BY f.cell_id, f."year"
        ),
        ehs_den AS (
            SELECT l.cell_id, l."year",
                   CAST(t.n * l.lag - l.w * t.s1 AS DOUBLE) AS num,
                   sqrt(CAST(t.n AS DOUBLE) * CAST(t.s2 AS DOUBLE)
                        - CAST(t.s1 AS DOUBLE) * CAST(t.s1 AS DOUBLE))
                   * sqrt((CAST(t.n AS DOUBLE) * CAST(l.w AS DOUBLE)
                           - CAST(l.w AS DOUBLE) * CAST(l.w AS DOUBLE))
                          / (CAST(t.n AS DOUBLE) - 1.0)) AS den
            FROM ehs_loc l JOIN ehs_tot t ON l."year" = t."year"
        ),
        ehs_z AS (
            SELECT cell_id, "year", num / den AS z
            FROM ehs_den WHERE den > 0
        ),
        ehs_mk AS (
            SELECT a.cell_id,
                   CAST(SUM(CASE WHEN b.z > a.z THEN 1
                                 WHEN b.z < a.z THEN -1 ELSE 0 END) AS BIGINT)
                       AS s_stat
            FROM ehs_z a JOIN ehs_z b
              ON a.cell_id = b.cell_id AND a."year" < b."year"
            GROUP BY a.cell_id
        ),
        ehs_cnt AS (
            SELECT cell_id,
                   CAST(COUNT(*) AS BIGINT) AS n_years,
                   CAST(SUM(CASE WHEN z > {zc} THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_hot,
                   CAST(SUM(CASE WHEN z < -{zc} THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_cold,
                   CAST(CASE WHEN max_by(z, "year") > {zc} THEN 1 ELSE 0 END
                        AS BIGINT) AS hot_last,
                   CAST(CASE WHEN max_by(z, "year") < -{zc} THEN 1 ELSE 0 END
                        AS BIGINT) AS cold_last
            FROM ehs_z GROUP BY cell_id
        )
        SELECT c.cell_id, c.n_years, c.n_hot, c.n_cold,
               COALESCE(m.s_stat, 0) AS s_stat,
               CAST(CASE WHEN COALESCE(m.s_stat, 0) > 0 THEN 1
                         WHEN COALESCE(m.s_stat, 0) < 0 THEN -1
                         ELSE 0 END AS BIGINT) AS trend,
               c.hot_last, c.cold_last,
               CASE
                 WHEN c.hot_last = 1 AND c.n_hot = 1 THEN 'new_hot'
                 WHEN c.hot_last = 1 AND COALESCE(m.s_stat, 0) > 0
                     THEN 'intensifying_hot'
                 WHEN c.hot_last = 1 AND COALESCE(m.s_stat, 0) < 0
                     THEN 'diminishing_hot'
                 WHEN c.hot_last = 1 THEN 'persistent_hot'
                 WHEN c.n_hot > 0 THEN 'historical_hot'
                 WHEN c.cold_last = 1 AND c.n_cold = 1 THEN 'new_cold'
                 WHEN c.cold_last = 1 AND COALESCE(m.s_stat, 0) < 0
                     THEN 'intensifying_cold'
                 WHEN c.cold_last = 1 AND COALESCE(m.s_stat, 0) > 0
                     THEN 'diminishing_cold'
                 WHEN c.cold_last = 1 THEN 'persistent_cold'
                 WHEN c.n_cold > 0 THEN 'historical_cold'
                 ELSE 'none'
               END AS category
        FROM ehs_cnt c LEFT JOIN ehs_mk m ON c.cell_id = m.cell_id"""


def focal_median(geo, band: int = 3, k: int = 1):
    """Focal MEDIAN smoothing over the zonal cell grid — the
    salt-and-pepper-robust companion of :func:`kring_smooth` (median
    filters are the standard despeckle/denoise pass a mean filter smears):
    each OCCUPIED cell takes the LOWER MEDIAN (the ⌈w/2⌉-th smallest, an
    exact integer — no interpolation) of the per-cell band totals over its
    (2k+1)² Chebyshev neighborhood's occupied cells, clipped at the grid
    boundary.

    Exactness: window values are the exact per-cell integer cent sums;
    lower-median selection is pure integer; the band-unit value is ONE
    pinned /100 double division.  Scale shape: the raw-observation groupby
    is the two-phase ``bucketed_sum``; the fan is a stateless (2k+1)²-way
    map over the AOI-bounded cell table carrying an is_self marker (no
    occupancy join); the median runs per hash bucket with ≤(2k+1)² rows
    per cell, selected by VECTORIZED segment arithmetic (sort once per
    bucket, no per-cell Python).

    Output: (cell_id:int64, nbr_n:int64, med_cents:int64, med_b{band}:f64).
    """
    import pandas as pd

    from ..state.cells import CELL_LEVEL, decode, morton

    s_col = f"s_c{band}"
    cellsums = zonal_sums(geo, keys=["cell_id"], bands=(band,))
    offsets = [(dx, dy) for dx in range(-k, k + 1) for dy in range(-k, k + 1)]
    n_grid = np.int64(1) << CELL_LEVEL

    def fan(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        s = t.column(s_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = decode(cid, CELL_LEVEL)
        parts = []
        for dx, dy in offsets:
            tx, ty = ix + dx, iy + dy
            m = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
            parts.append(
                pa.table(
                    {
                        "cell_id": pa.array(morton(tx[m], ty[m]), type=pa.int64()),
                        "v": pa.array(s[m]),
                        "is_self": pa.array(
                            np.full(
                                int(m.sum()),
                                1 if (dx == 0 and dy == 0) else 0,
                                dtype=np.int64,
                            )
                        ),
                    }
                )
            )
        return pa.concat_tables(parts)

    fanned = cellsums.map_batches(fan, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cid = g["cell_id"].to_numpy(np.int64)
        v = g["v"].to_numpy(np.int64)
        slf = g["is_self"].to_numpy(np.int64)
        order = np.lexsort((v, cid))
        cid, v, slf = cid[order], v[order], slf[order]
        starts = np.flatnonzero(np.concatenate(([True], cid[1:] != cid[:-1])))
        ends = np.concatenate((starts[1:], [len(cid)]))
        cnt = ends - starts
        med = v[starts + (cnt - 1) // 2]  # lower median, values sorted per key
        has_self = np.add.reduceat(slf, starts) > 0
        return pd.DataFrame(
            {
                "cell_id": cid[starts][has_self],
                "nbr_n": cnt[has_self],
                "med_cents": med[has_self],
            }
        )

    agg = (
        _add_bucket(fanned, ["cell_id"], _default_buckets())
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(["cell_id", "nbr_n", "med_cents"])
    )

    def finalize(t: pa.Table) -> pa.Table:
        med = t.column("med_cents").to_numpy(zero_copy_only=False)
        return t.append_column(
            f"med_b{band}", pa.array(med.astype(np.float64) / 100.0)
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def focal_median_sql(cells_sql: str, band: int = 3, k: int = 1) -> str:
    """Oracle twin of ``focal_median``: the kring fan chain + per-cell
    lower-median selection via row_number at (cnt+1)//2, the identical
    pinned /100 division.  Fragment for a caller's ``WITH {geo},
    {cells},``."""
    from ..state.cells import CELL_LEVEL, morton_decode_sql_expr, morton_sql_expr

    hi = (1 << CELL_LEVEL) - 1
    ds_vals = ", ".join(str(d) for d in range(-k, k + 1))
    return f"""
        fm_agg AS (
            SELECT cell_id, CAST(SUM(c{band}) AS BIGINT) AS v
            FROM ({cells_sql}) GROUP BY cell_id
        ),
        fm_dec AS (
            SELECT cell_id, v,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "x")} AS ix,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "y")} AS iy
            FROM fm_agg
        ),
        fm_offs AS (
            SELECT ox.d AS dx, oy.d AS dy
            FROM (SELECT unnest([{ds_vals}]) AS d) ox,
                 (SELECT unnest([{ds_vals}]) AS d) oy
        ),
        fm_fan AS (
            SELECT {morton_sql_expr("(d.ix + o.dx)", "(d.iy + o.dy)", CELL_LEVEL)}
                       AS cell_id,
                   d.v,
                   CASE WHEN o.dx = 0 AND o.dy = 0 THEN 1 ELSE 0 END AS is_self
            FROM fm_dec d CROSS JOIN fm_offs o
            WHERE d.ix + o.dx BETWEEN 0 AND {hi}
              AND d.iy + o.dy BETWEEN 0 AND {hi}
        ),
        fm_rn AS (
            SELECT cell_id, v,
                   row_number() OVER (PARTITION BY cell_id ORDER BY v) AS rn,
                   COUNT(*) OVER (PARTITION BY cell_id) AS cnt,
                   SUM(is_self) OVER (PARTITION BY cell_id) AS selfs
            FROM fm_fan
        )
        SELECT cell_id, CAST(cnt AS BIGINT) AS nbr_n,
               CAST(v AS BIGINT) AS med_cents,
               CAST(v AS DOUBLE) / 100.0 AS med_b{band}
        FROM fm_rn
        WHERE rn = (cnt + 1) // 2 AND selfs > 0"""


def morans_bivariate(geo, band_x: int = 3, band_y: int = 4, k: int = 1):
    """Bivariate Moran's I — cross-variable spatial correlation (is band-x
    HERE correlated with band-y NEXT DOOR?), the GeoDa-style companion to
    :func:`morans_i` for questions like "does vegetation track
    neighboring moisture":

        I_xy = (N/W) · Σ_ij z x_i z y_j / √(Σ z x² · Σ z y²)

    with z = (v − v̄)/v̄ per variable (the /v̄ scalings cancel in the
    ratio, exactly as in the univariate case).  Same scale shape as
    morans_i: exact per-cell integer sums for BOTH bands, one 8-way fan
    carrying x, a broadcast y lookup (AOI-bounded cell table), and
    per-term ⌊·2⁴⁰⌋ quantization so every big sum is order-free int64
    (the quantum cancels in num/√(dx·dy)).

    Output: ONE row (n_cells:int64, w_pairs:int64, num_q:int64,
    denx_q:int64, deny_q:int64, bimoran:f64).
    """
    import math

    import ray
    import ray.data as rd

    from ..state.cells import CELL_LEVEL, decode, morton

    sx = f"s_c{band_x}"
    sy = f"s_c{band_y}"
    bands = (band_x,) if band_x == band_y else (band_x, band_y)
    cellsums = zonal_sums(geo, keys=["cell_id"], bands=bands).materialize()

    tot = cellsums.map_batches(
        lambda t: pa.table(
            {
                "n": pa.array([len(t)], pa.int64()),
                "x": pa.array(
                    [int(t.column(sx).to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
                "y": pa.array(
                    [int(t.column(sy).to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    n_cells = int(tot["n"].sum())
    empty = pa.table(
        {
            "n_cells": pa.array([], pa.int64()),
            "w_pairs": pa.array([], pa.int64()),
            "num_q": pa.array([], pa.int64()),
            "denx_q": pa.array([], pa.int64()),
            "deny_q": pa.array([], pa.int64()),
            "bimoran": pa.array([], pa.float64()),
        }
    )
    if n_cells == 0:
        return rd.from_arrow(empty)
    xbar = float(int(tot["x"].sum())) / float(n_cells)
    ybar = float(int(tot["y"].sum())) / float(n_cells)
    scale = float(MORAN_SCALE_INT)
    n_grid = np.int64(1) << CELL_LEVEL
    offsets = [
        (dx, dy)
        for dx in range(-k, k + 1)
        for dy in range(-k, k + 1)
        if not (dx == 0 and dy == 0)
    ]

    def fan(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        v = t.column(sx).to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = decode(cid, CELL_LEVEL)
        parts = []
        for dx, dy in offsets:
            tx, ty = ix + dx, iy + dy
            m = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
            parts.append(
                pa.table(
                    {
                        "cell_id": pa.array(morton(tx[m], ty[m]), type=pa.int64()),
                        "x_src": pa.array(v[m]),
                    }
                )
            )
        return pa.concat_tables(parts)

    cells_pd = cellsums.to_pandas()
    ckeys = cells_pd["cell_id"].to_numpy(np.int64)
    cvals = cells_pd[sy].to_numpy(np.int64)
    corder = np.argsort(ckeys, kind="mergesort")
    side_ref = ray.put({"k": ckeys[corder], "v": cvals[corder]})

    def pair_partial(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        tgt = t.column("cell_id").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(side["k"], tgt)
        pos = np.minimum(pos, len(side["k"]) - 1)
        hit = side["k"][pos] == tgt
        a = t.column("x_src").to_numpy(zero_copy_only=False).astype(np.float64)[hit]
        b = side["v"][pos[hit]].astype(np.float64)
        za = (a - xbar) / xbar
        zb = (b - ybar) / ybar
        q = np.floor((za * zb) * scale).astype(np.int64)
        return pa.table(
            {
                "num_q": pa.array([int(q.sum())], pa.int64()),
                "w": pa.array([int(hit.sum())], pa.int64()),
            }
        )

    pp = (
        cellsums.map_batches(fan, batch_format="pyarrow")
        .map_batches(pair_partial, batch_format="pyarrow")
        .to_pandas()
    )
    num_q = int(pp["num_q"].sum())
    w_pairs = int(pp["w"].sum())

    def den_partial(t: pa.Table) -> pa.Table:
        vx = t.column(sx).to_numpy(zero_copy_only=False).astype(np.float64)
        vy = t.column(sy).to_numpy(zero_copy_only=False).astype(np.float64)
        zx = (vx - xbar) / xbar
        zy = (vy - ybar) / ybar
        return pa.table(
            {
                "dx": pa.array(
                    [int(np.floor((zx * zx) * scale).astype(np.int64).sum())],
                    pa.int64(),
                ),
                "dy": pa.array(
                    [int(np.floor((zy * zy) * scale).astype(np.int64).sum())],
                    pa.int64(),
                ),
            }
        )

    dq = cellsums.map_batches(den_partial, batch_format="pyarrow").to_pandas()
    denx_q = int(dq["dx"].sum())
    deny_q = int(dq["dy"].sum())
    if w_pairs == 0 or denx_q <= 0 or deny_q <= 0:
        return rd.from_arrow(empty)
    bimoran = (float(n_cells) / float(w_pairs)) * (
        float(num_q) / math.sqrt(float(denx_q) * float(deny_q))
    )
    return rd.from_arrow(
        pa.table(
            {
                "n_cells": pa.array([n_cells], pa.int64()),
                "w_pairs": pa.array([w_pairs], pa.int64()),
                "num_q": pa.array([num_q], pa.int64()),
                "denx_q": pa.array([denx_q], pa.int64()),
                "deny_q": pa.array([deny_q], pa.int64()),
                "bimoran": pa.array([bimoran], pa.float64()),
            }
        )
    )


def morans_bivariate_sql(cells_sql: str, band_x: int = 3, band_y: int = 4, k: int = 1) -> str:
    """Oracle twin of :func:`morans_bivariate`: the morans_i CTE chain
    with x on the fan side and y on the join side, the identical
    quantized term sums and the pinned (N/W)·num/√(dx·dy) chain."""
    from ..state.cells import CELL_LEVEL, morton_decode_sql_expr, morton_sql_expr

    hi = (1 << CELL_LEVEL) - 1
    offs = ", ".join(
        f"({dx}, {dy})"
        for dx in range(-k, k + 1)
        for dy in range(-k, k + 1)
        if not (dx == 0 and dy == 0)
    )
    S = float(MORAN_SCALE_INT)
    return f"""
        bm_agg AS MATERIALIZED (
            SELECT cell_id, CAST(SUM(c{band_x}) AS BIGINT) AS x,
                   CAST(SUM(c{band_y}) AS BIGINT) AS y
            FROM ({cells_sql}) GROUP BY cell_id
        ),
        bm_tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
                   CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS xbar,
                   CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ybar
            FROM bm_agg
        ),
        bm_dec AS (
            SELECT cell_id, x,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "x")} AS ix,
                   {morton_decode_sql_expr("cell_id", CELL_LEVEL, "y")} AS iy
            FROM bm_agg
        ),
        bm_offs AS (SELECT * FROM (VALUES {offs}) AS t(dx, dy)),
        bm_fan AS (
            SELECT {morton_sql_expr("(d.ix + o.dx)", "(d.iy + o.dy)", CELL_LEVEL)}
                       AS cell_id,
                   d.x AS x_src
            FROM bm_dec d CROSS JOIN bm_offs o
            WHERE d.ix + o.dx BETWEEN 0 AND {hi}
              AND d.iy + o.dy BETWEEN 0 AND {hi}
        ),
        bm_pairs AS (
            SELECT f.x_src, a.y AS y_tgt FROM bm_fan f
            JOIN bm_agg a ON f.cell_id = a.cell_id
        ),
        bm_num AS (
            SELECT CAST(SUM(CAST(floor(
                       (((CAST(x_src AS DOUBLE) - t.xbar) / t.xbar)
                        * ((CAST(y_tgt AS DOUBLE) - t.ybar) / t.ybar))
                       * {S!r}) AS BIGINT)) AS BIGINT) AS num_q,
                   CAST(COUNT(*) AS BIGINT) AS w_pairs
            FROM bm_pairs CROSS JOIN bm_tot t
        ),
        bm_den AS (
            SELECT CAST(SUM(CAST(floor(
                       (((CAST(x AS DOUBLE) - t.xbar) / t.xbar)
                        * ((CAST(x AS DOUBLE) - t.xbar) / t.xbar))
                       * {S!r}) AS BIGINT)) AS BIGINT) AS denx_q,
                   CAST(SUM(CAST(floor(
                       (((CAST(y AS DOUBLE) - t.ybar) / t.ybar)
                        * ((CAST(y AS DOUBLE) - t.ybar) / t.ybar))
                       * {S!r}) AS BIGINT)) AS BIGINT) AS deny_q
            FROM bm_agg CROSS JOIN bm_tot t
        )
        SELECT t.n_cells, n.w_pairs, n.num_q, d.denx_q, d.deny_q,
               (CAST(t.n_cells AS DOUBLE) / CAST(n.w_pairs AS DOUBLE))
                   * (CAST(n.num_q AS DOUBLE)
                      / sqrt(CAST(d.denx_q AS DOUBLE)
                             * CAST(d.deny_q AS DOUBLE))) AS bimoran
        FROM bm_tot t CROSS JOIN bm_num n CROSS JOIN bm_den d
        WHERE n.w_pairs > 0 AND d.denx_q > 0 AND d.deny_q > 0"""


def change_year(geo, band: int = 3):
    """Per-cell CHANGE-YEAR map — the change-detection product of an
    annual monitoring stack (which year did this cell's signal break?):
    for each cell with ≥2 observed years, the CUSUM peak over the yearly
    band totals,

        S_k = Σ_{j≤k}(x_j − x̄),   change_year = year after the argmax |S_k|

    (the classic cumulative-deviation estimator; ties → earliest year;
    the last prefix S_n ≡ 0 is excluded).  PURE INTEGER: multiplying
    through by n gives n·S_k = n·Σ_{j≤k}x_j − k·Σx — exact int64 — so
    argmax |n·S_k| needs no floats at all.

    Scale shape: the corpus-sized pass is the two-phase (cell, year)
    integer reduce; the per-cell scan runs vectorized per hash bucket
    over the AOI-bounded cell-year table (segment prefix sums, no
    per-cell Python).

    Output: (cell_id:int64, n_years:int64, change_year:int64,
    peak_q:int64) with peak_q = max |n·S_k|.
    """
    import pandas as pd

    ycol = f"s_c{band}"
    cy = zonal_sums(geo, keys=["cell_id", "year"], bands=(band,))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cell_id", "year"], kind="mergesort")
        cid = g["cell_id"].to_numpy(np.int64)
        yr = g["year"].to_numpy(np.int64)
        x = g[ycol].to_numpy(np.int64)
        starts = np.flatnonzero(np.concatenate(([True], cid[1:] != cid[:-1])))
        lens = np.diff(np.concatenate((starts, [len(cid)])))
        n_rep = np.repeat(lens, lens)
        tot = np.repeat(np.add.reduceat(x, starts), lens)
        csum = np.cumsum(x)
        base = np.repeat(csum[starts] - x[starts], lens)
        prefix = csum - base  # per-segment cumulative Σ_{j≤k} x_j
        k = (
            np.arange(len(cid), dtype=np.int64)
            - np.repeat(starts, lens)
            + np.int64(1)
        )
        ns = n_rep * prefix - k * tot  # n·S_k, exact int64
        mag = np.abs(ns)
        mag[k == n_rep] = -1  # exclude the trivial S_n = 0 terminal prefix
        seg_max = np.repeat(np.maximum.reduceat(mag, starts), lens)
        idx = np.arange(len(cid), dtype=np.int64)
        hit = mag == seg_max
        first = np.minimum.reduceat(
            np.where(hit, idx, len(cid)), starts
        )  # earliest year at the peak
        keep = lens >= 2
        f = first[keep]
        return pd.DataFrame(
            {
                "cell_id": cid[starts][keep],
                "n_years": lens[keep],
                "change_year": yr[f + 1],  # year AFTER the break prefix
                "peak_q": mag[f],
            }
        )

    return (
        _add_bucket(cy, ["cell_id"], _default_buckets())
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(["cell_id", "n_years", "change_year", "peak_q"])
    )


def change_year_sql(cells_sql: str, band: int = 3) -> str:
    """Oracle twin of :func:`change_year`: per-(cell, year) totals,
    window prefix sums, the identical exact n·S_k integers, and a
    row_number winner over (|nS| DESC, year ASC) excluding the terminal
    prefix.  Fragment for a caller's ``WITH {geo}, {cells},``."""
    return f"""
        cy_t AS (
            SELECT cell_id, "year", CAST(SUM(c{band}) AS BIGINT) AS x
            FROM ({cells_sql}) GROUP BY 1, 2
        ),
        cy_w AS (
            SELECT cell_id, "year", x,
                   CAST(COUNT(*) OVER (PARTITION BY cell_id) AS BIGINT) AS n,
                   CAST(SUM(x) OVER (PARTITION BY cell_id) AS BIGINT) AS tot,
                   CAST(SUM(x) OVER (
                       PARTITION BY cell_id ORDER BY "year"
                   ) AS BIGINT) AS prefix,
                   CAST(row_number() OVER (
                       PARTITION BY cell_id ORDER BY "year"
                   ) AS BIGINT) AS k
            FROM cy_t
        ),
        cy_s AS (
            SELECT cell_id, "year", n, k,
                   abs(n * prefix - k * tot) AS mag,
                   lead("year") OVER (
                       PARTITION BY cell_id ORDER BY "year"
                   ) AS next_year
            FROM cy_w
            QUALIFY n >= 2
        )
        SELECT cell_id, n AS n_years,
               CAST(next_year AS BIGINT) AS change_year,
               CAST(mag AS BIGINT) AS peak_q
        FROM cy_s
        WHERE k < n
        QUALIFY row_number() OVER (
            PARTITION BY cell_id ORDER BY mag DESC, "year" ASC
        ) = 1"""


def band_corr(geo, bands=(0, 1, 2, 3, 4, 5)):
    """Exact Pearson correlation matrix between reflectance bands — the
    feature-correlation report a covariate-engineering pass runs before
    model training (highly-correlated bands are redundant predictors):

        r_xy = (n·Σxy − Σx·Σy) / √((n·Σx² − Σx²ₜ)(n·Σy² − Σy²ₜ))

    over the exact integer cent values.  EXACT AT ANY SCALE: per-batch
    int64 partial sums are bounded by batch-size·cents², and the global
    fold runs in PYTHON INTS driver-side (the SQL twin uses HUGEINT), so
    nothing ever overflows; r is ONE pinned double chain of the
    once-converted big integers.

    Output: (band_a:int64, band_b:int64, r:f64) for a<b (the shared
    sample size n would be a repeated-constant column — recover it from
    any count query instead).
    """
    import math

    import ray.data as rd

    bl = list(bands)
    cols = [f"c{b}" for b in bl]

    def partial(t: pa.Table) -> pa.Table:
        arrs = [
            t.column(c).to_numpy(zero_copy_only=False).astype(np.int64)
            for c in cols
        ]
        out = {"n": pa.array([np.int64(len(t))], pa.int64())}
        for i, a in enumerate(arrs):
            out[f"s{i}"] = pa.array([int(a.sum())], pa.int64())
            for j in range(i, len(arrs)):
                out[f"p{i}_{j}"] = pa.array([int((a * arrs[j]).sum())], pa.int64())
        return pa.table(out)

    pp = (
        geo.select_columns(cols)
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # one skinny row per batch
    )
    empty = pa.table(
        {
            "band_a": pa.array([], pa.int64()),
            "band_b": pa.array([], pa.int64()),
            "r": pa.array([], pa.float64()),
        }
    )
    if len(pp) == 0:
        return rd.from_arrow(empty)
    n = int(pp["n"].sum())
    s = [sum(int(v) for v in pp[f"s{i}"]) for i in range(len(bl))]
    p = {
        (i, j): sum(int(v) for v in pp[f"p{i}_{j}"])
        for i in range(len(bl))
        for j in range(i, len(bl))
    }
    rows = []
    for i in range(len(bl)):
        for j in range(i + 1, len(bl)):
            num = n * p[(i, j)] - s[i] * s[j]  # python ints, exact
            dx = n * p[(i, i)] - s[i] * s[i]
            dy = n * p[(j, j)] - s[j] * s[j]
            if dx <= 0 or dy <= 0:
                continue
            r = float(num) / math.sqrt(float(dx) * float(dy))
            rows.append((bl[i], bl[j], r))
    return rd.from_arrow(
        pa.table(
            {
                "band_a": pa.array([r[0] for r in rows], pa.int64()),
                "band_b": pa.array([r[1] for r in rows], pa.int64()),
                "r": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
    )


def footprint_drift(geo):
    """Annual mean-center drift of the observation footprint — the
    sampling-bias monitor (is this year's data coming from the same
    place as last year's?): per year the exact integer coordinate sums
    of every observation's grid cell, the pinned mean center, and the
    planar drift distance from the previous year.

    Output: (year:int64, n:int64, sx:int64, sy:int64, mean_x:f64,
    mean_y:f64, drift:f64) — drift of the first year is 0.
    """
    import ray.data as rd

    from ..state.cells import CELL_LEVEL, decode

    def partial(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        yr = t.column("year").to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = decode(cid, CELL_LEVEL)
        g = (
            pa.table(
                {
                    "year": pa.array(yr),
                    "n": pa.array(np.ones(len(yr), np.int64)),
                    "sx": pa.array(ix.astype(np.int64)),
                    "sy": pa.array(iy.astype(np.int64)),
                }
            )
            .group_by(["year"])
            .aggregate([("n", "sum"), ("sx", "sum"), ("sy", "sum")])
        )
        return g.rename_columns(["year", "n", "sx", "sy"])

    rep = (
        bucketed_sum(
            geo.select_columns(["cell_id", "year"]).map_batches(
                partial, batch_format="pyarrow"
            ),
            ["year"],
            ["n", "sx", "sy"],
        )
        .to_pandas()  # ≤ |years| rows
    )
    empty = pa.table(
        {
            "year": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "sx": pa.array([], pa.int64()),
            "sy": pa.array([], pa.int64()),
            "mean_x": pa.array([], pa.float64()),
            "mean_y": pa.array([], pa.float64()),
            "drift": pa.array([], pa.float64()),
        }
    )
    if len(rep) == 0:
        return rd.from_arrow(empty)
    rep = rep.sort_values("year", kind="mergesort").reset_index(drop=True)
    n = rep["n"].to_numpy(np.int64)
    sx = rep["sx"].to_numpy(np.int64)
    sy = rep["sy"].to_numpy(np.int64)
    mx = sx.astype(np.float64) / n.astype(np.float64)
    my = sy.astype(np.float64) / n.astype(np.float64)
    dx = np.concatenate(([0.0], mx[1:] - mx[:-1]))
    dy = np.concatenate(([0.0], my[1:] - my[:-1]))
    drift = np.sqrt(dx * dx + dy * dy)
    return rd.from_arrow(
        pa.table(
            {
                "year": pa.array(rep["year"].to_numpy(np.int64)),
                "n": pa.array(n, pa.int64()),
                "sx": pa.array(sx, pa.int64()),
                "sy": pa.array(sy, pa.int64()),
                "mean_x": pa.array(mx, pa.float64()),
                "mean_y": pa.array(my, pa.float64()),
                "drift": pa.array(drift, pa.float64()),
            }
        )
    )
