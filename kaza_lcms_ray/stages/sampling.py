"""Seeded sampling, stratified selection, train/test split, spatial
near-dedup (SURVEY.md K2/K4/K5/K6, J2; reference: src/utils/sampling.py).

All randomness is splitmix64 keyed on (seed, row-key) — deterministic under
any partitioning / cluster size, unlike EE's opaque randomColumn, while
preserving the reference's semantics:

* ``add_random`` — the randomColumn analog (src/utils/sampling.py:188).
* ``split_train_test`` — random < 0.8 → train else test: provably disjoint +
  exhaustive (same hash both sides; src/utils/sampling.py:184-193).
* ``stratified_sample`` — per-class fixed-size take by smallest hash-random
  (the shuffle-then-limit(n) of src/utils/sampling.py:153 made deterministic:
  'random' order == seeded hash order).
* ``random_points_in_polygons`` — seeded rejection sampling in polygon bboxes
  (FeatureCollection.randomPoints analog, src/utils/sampling.py:101,144).
* ``spatial_near_dedup`` — the greedy distanceFilter
  (src/utils/sampling.py:12-49): drop any point within ``distance`` of an
  earlier-id point.  Reproduced deterministically: cell-grid self-join at
  resolution ≥ distance, neighbor-cell expansion, then a sequential greedy
  pass in global id order (driver-side over candidate pairs only — the
  pair set is tiny relative to the input).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state import cells
from ..state.geom import points_in_polygon
from ..state.hashing import DEFAULT_SEED, fnv1a_arr, hash_key, hash_unit


def add_random(ds, id_cols: list[str], seed: int = DEFAULT_SEED, col: str = "random", tag: str = "random"):
    """Seeded uniform [0,1) column keyed on the row's id columns.  ``tag``
    separates independent streams (e.g. the stratified-sample order vs the
    train/test split — coupling them would bias the split)."""

    def fn(t: pa.Table) -> pa.Table:
        key = _row_key(t, id_cols)
        arr = pa.array(hash_unit(seed, tag, key))
        idx = t.schema.get_field_index(col)
        if idx >= 0:  # replace (re-seeding an existing random column)
            return t.set_column(idx, col, arr)
        return t.append_column(col, arr)

    return ds.map_batches(fn, batch_format="pyarrow")


def _row_key(t: pa.Table, id_cols: list[str]) -> np.ndarray:
    key = np.zeros(len(t), dtype=np.uint64)
    for c in id_cols:
        col = t.column(c)
        if pa.types.is_integer(col.type):
            part = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            part = fnv1a_arr(col)  # vectorized, bit-identical to _str_h
        key = hash_key(key, part)
    return key


def _str_h(s) -> int:
    """Scalar FNV-1a (str-coerced) — see state.hashing.fnv1a_arr for the
    batch path; both must stay bit-identical to the SQL mirror."""
    h = 0xCBF29CE484222325
    for b in str(s).encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def split_train_test(ds, id_cols: list[str], seed: int = DEFAULT_SEED, frac: float = 0.8):
    """80/20 split (reference threshold lt 0.8): returns (train, test).

    Both sides derive the same hash per row → disjoint and exhaustive by
    construction, at any parallelism.
    """
    withr = add_random(ds, id_cols, seed, tag="split")
    train = withr.filter(expr=f"random < {frac}")
    test = withr.filter(expr=f"random >= {frac}")
    return train, test


SAMPLE_TAG = "sample_k"
KFOLD_TAG = "kfold"


def sample_k(ds, id_cols: list[str], k: int, seed: int = DEFAULT_SEED):
    """Deterministic uniform k-row sample — the distributed reservoir.

    The k rows with the smallest seeded hash priority ARE a uniform sample
    without replacement (every row's priority is an independent uniform
    draw), computed with the Dataset-native two-level ``top_k`` reduce:
    ≤ k rows leave each block, nothing corpus-sized reaches the driver,
    and the result is identical at any parallelism / block layout — the
    scale-safe replacement for a stateful reservoir actor.  Mirrors the
    reference's shuffle-then-``limit(n)`` idiom (src/utils/sampling.py:153)
    at whole-corpus granularity."""
    from .joins import top_k

    withr = add_random(ds, id_cols, seed, col="priority", tag=SAMPLE_TAG)
    return top_k(withr, "priority", k, tiebreak_col=id_cols[0], descending=False)


def kfold_assign(
    ds, id_cols: list[str], n_folds: int, seed: int = DEFAULT_SEED, col: str = "fold"
):
    """Seeded k-fold assignment: fold = full 64-bit row hash mod n_folds.

    Integer modulus (not ``floor(unit * k)``) so the SQL mirror is exact by
    construction; folds are disjoint + exhaustive at any partitioning, the
    k-way generalization of ``split_train_test``.  Stratification needs no
    extra work: within any class the hash stream is uniform, so folds are
    balanced per class in expectation exactly like the 80/20 split."""

    def fn(t: pa.Table) -> pa.Table:
        key = _row_key(t, id_cols)
        h = hash_key(seed, KFOLD_TAG, key)
        fold = pa.array((h % np.uint64(n_folds)).astype(np.int64))
        idx = t.schema.get_field_index(col)
        if idx >= 0:
            return t.set_column(idx, col, fold)
        return t.append_column(col, fold)

    return ds.map_batches(fn, batch_format="pyarrow")


def _row_hash_sql(docs_sql: str, tag: str, seed: int, id_col: str) -> str:
    """Subquery exposing ``hv`` = the full 64-bit hash_key(seed, tag,
    _row_key(id)) as HUGEINT — the SQL twin of ``add_random`` /
    ``kfold_assign`` for a single INTEGER id column (``_row_key`` folds the
    id from the constant splitmix64(0), then the (seed, tag) prefix folds
    once more; both constants precompute driver-side)."""
    from ..state import sqlhash as SH
    from ..state.hashing import splitmix64

    z0 = SH.hug(int(splitmix64(np.uint64(0))))
    pre = SH.hug(SH.hash_key_prefix(seed, tag))
    return SH.chain_select(
        f"SELECT *, CAST({id_col} AS HUGEINT) AS idh FROM ({docs_sql})",
        SH.splitmix_steps(SH.xor64(z0, "idh"), "rk", "sk0")
        + SH.splitmix_steps(SH.xor64(pre, "rk"), "hv", "sk1"),
    )


def sample_k_sql(
    docs_sql: str,
    k: int,
    cols: str,
    seed: int = DEFAULT_SEED,
    id_col: str = "doc_id",
) -> str:
    """Oracle: same splitmix64 chain, priority = (hv >> 11) · 2⁻⁵³ (exact —
    a ≤53-bit integer times a power of two), ORDER BY (priority, id) LIMIT k
    replays the (value, tiebreak) top-k rule."""
    eps = repr(2.0**-53)
    return f"""
        SELECT {cols}, CAST(hv // 2048 AS BIGINT) * {eps} AS priority
        FROM ({_row_hash_sql(docs_sql, SAMPLE_TAG, seed, id_col)})
        ORDER BY priority, {id_col} LIMIT {k}"""


def kfold_sql(
    docs_sql: str,
    n_folds: int,
    seed: int = DEFAULT_SEED,
    id_col: str = "doc_id",
) -> str:
    """Oracle: fold = hv % n_folds over the identical hash chain."""
    return f"""
        SELECT * EXCLUDE (idh, rk, hv, sk0_z0, sk0_z1, sk0_z2,
                          sk1_z0, sk1_z1, sk1_z2),
               CAST(hv % {n_folds} AS BIGINT) AS fold
        FROM ({_row_hash_sql(docs_sql, KFOLD_TAG, seed, id_col)})"""


def stratified_sample(
    ds,
    class_col: str,
    id_cols: list[str],
    class_points: dict[int, int],
    seed: int = DEFAULT_SEED,
):
    """Per-class fixed-size sample: the n rows with smallest hash-random.

    Matches the reference's randomColumn().limit(n,'random') per class
    (src/utils/sampling.py:103-104,153) with the 'random' column made
    deterministic.  Executed as groupby(class).map_groups: per class sort by
    (random, id) and head(n).
    """
    withr = add_random(ds, id_cols, seed, tag="strat")

    def take(g: pd.DataFrame) -> pd.DataFrame:
        cv = g[class_col].iloc[0]
        n = class_points.get(int(cv) if not isinstance(cv, str) else cv, 0)
        return g.sort_values(["random"] + id_cols, kind="mergesort").head(n)

    return withr.groupby(class_col).map_groups(take, batch_format="pandas")


def random_points_in_polygons(
    polys: list[tuple[str, int, list[np.ndarray]]],
    n_per_poly: int,
    seed: int = DEFAULT_SEED,
    max_attempts: int = 64,
) -> pd.DataFrame:
    """Seeded uniform points inside each polygon (rejection sampling in the
    bbox; splitmix64 stream keyed on (seed, poly_id, point, attempt)).
    Returns DataFrame[poly_id, LANDCOVER, lon, lat, pt_idx]."""
    rows = []
    for poly_id, landcover, rings in polys:
        ring = rings[0]
        bx0, by0 = ring[:, 0].min(), ring[:, 1].min()
        bx1, by1 = ring[:, 0].max(), ring[:, 1].max()
        pk = _str_h(poly_id)
        for j in range(n_per_poly):
            for attempt in range(max_attempts):
                # stay in uint64: an int64 array + uint64 scalar silently
                # promotes to float64 and mangles keys past 2^53
                with np.errstate(over="ignore"):
                    key = np.asarray([pk], dtype=np.uint64) + np.uint64(
                        j * max_attempts + attempt
                    )
                u = hash_unit(seed, "rpt", key)
                v = hash_unit(seed, "rpt2", key)
                x = bx0 + float(u[0]) * (bx1 - bx0)
                y = by0 + float(v[0]) * (by1 - by0)
                if points_in_polygon(np.array([x]), np.array([y]), rings)[0]:
                    rows.append((poly_id, landcover, x, y, j))
                    break
    return pd.DataFrame(rows, columns=["poly_id", "LANDCOVER", "lon", "lat", "pt_idx"])


def spatial_near_dedup(
    ds,
    id_col: str,
    distance: float,
    lon_col="lon",
    lat_col="lat",
    max_pairs: int = 2_000_000,
):
    """Greedy order-dependent near-dedup (distanceFilter semantics).

    The reference keeps iterating matches in feature-id order, dropping any
    point whose id appears in an earlier point's neighbor list
    (src/utils/sampling.py:37-49) — i.e. a point survives iff no
    smaller-id point lies within ``distance``.

    Plan: choose grid level with cell size ≥ distance; key each point by its
    cell; for each point, candidate partners live in the 3×3 k_ring.  Emit
    (cell, point) for every neighbor cell (×9 fan-out), groupby cell, find
    pairs within distance inside each group — each cross-cell pair is seen in
    the cell that owns it (both points' fan-outs meet in every shared cell;
    pairs are deduped by (a,b)).  The surviving set is computed by the exact
    greedy pass over the (tiny) pair list, collected to the driver — the
    reference's own semantics are inherently sequential; only the pair
    *discovery* needs the cluster.
    Returns (kept_ids_set, pairs_df).
    """
    level = _level_for_distance(distance)

    def fanout(t: pa.Table) -> pa.Table:
        lon = t.column(lon_col).to_numpy(zero_copy_only=False)
        lat = t.column(lat_col).to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_pylist()
        n = len(ids)
        ix, iy = cells.grid_coords(lon, lat, level)
        out_cell, out_id, out_lon, out_lat, out_home = [], [], [], [], []
        ncell = np.int64(1) << level
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                jx, jy = ix + dx, iy + dy
                ok = (jx >= 0) & (jx < ncell) & (jy >= 0) & (jy < ncell)
                out_cell.append(cells.morton(jx[ok], jy[ok]))
                idx = np.nonzero(ok)[0]
                out_id.extend([ids[i] for i in idx])
                out_lon.append(lon[ok])
                out_lat.append(lat[ok])
                out_home.append((np.asarray([dx == 0] * int(ok.sum())) & (dy == 0)))
        return pa.table(
            {
                "cell": pa.array(np.concatenate(out_cell)),
                id_col: pa.array(out_id),
                lon_col: pa.array(np.concatenate(out_lon)),
                lat_col: pa.array(np.concatenate(out_lat)),
                "home": pa.array(np.concatenate(out_home)),
            }
        )

    fan = ds.map_batches(fanout, batch_format="pyarrow")

    d2max = distance * distance

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        # pairs where at least one member is 'home' in this cell, to bound
        # duplication; final dedup happens in the driver pass anyway
        lon = g[lon_col].to_numpy()
        lat = g[lat_col].to_numpy()
        ids = g[id_col].to_numpy()
        dx = lon[:, None] - lon[None, :]
        dy = lat[:, None] - lat[None, :]
        d2 = dx * dx + dy * dy
        ii, jj = np.nonzero((d2 <= d2max) & (ids[:, None] < ids[None, :]))
        if ii.size == 0:
            return pd.DataFrame({"a": [], "b": []})
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]}).drop_duplicates()

    # The greedy survive-iff-no-smaller-id-neighbor pass is inherently
    # sequential (reference iterate semantics), so the *pair list* — not the
    # corpus — comes to the driver.  Guard the collection: count on the
    # materialized pair Dataset first and refuse clearly past ``max_pairs``
    # rather than OOM-ing the driver on a pathologically dense point set.
    pair_ds = fan.groupby("cell").map_groups(pairs, batch_format="pandas").materialize()
    n_pairs = pair_ds.count()
    if n_pairs > max_pairs:
        raise ValueError(
            f"spatial_near_dedup: {n_pairs} candidate pairs exceed "
            f"max_pairs={max_pairs}; the point set is too dense for the "
            f"reference's sequential greedy semantics — reduce `distance`, "
            f"pre-thin the input, or raise max_pairs explicitly."
        )
    pair_df = pair_ds.to_pandas().drop_duplicates().sort_values(["a", "b"])

    # exact greedy pass in id order (reference's iterate semantics)
    dropped: set = set()
    nbrs: dict = {}
    for a, b in pair_df.itertuples(index=False):
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    for pid in sorted(nbrs):
        if pid in dropped:
            continue
        for other in nbrs[pid]:
            if other > pid:
                dropped.add(other)
    return dropped, pair_df


def _level_for_distance(distance: float) -> int:
    """Finest grid level whose cell side (degrees lat) ≥ distance."""
    level = 0
    while (180.0 / (1 << (level + 1))) >= distance and level < 24:
        level += 1
    return level


def random_points_ds(polygons_path: str, n_per_poly: int = 5, seed: int = DEFAULT_SEED, kinds=("reference",)):
    """Distributed FeatureCollection.randomPoints analog: one map_batches
    over the polygon table emits ``n_per_poly`` seeded rejection-sampled
    points per polygon (first accepted of ≤64 bbox attempts, splitmix64
    streams keyed on (seed, fnv(poly_id), slot) — deterministic and
    replayed exactly by the SQL oracle).

    Returns Dataset[poly_id, LANDCOVER, pt_idx, lon, lat]."""
    import pyarrow as _pa

    import ray.data as rd

    def per_batch(t: _pa.Table) -> _pa.Table:
        polys = []
        lcs = t.column("LANDCOVER").to_numpy(zero_copy_only=False)
        ids = t.column("poly_id").to_pylist()
        rings_col = t.column("rings").to_pylist()
        for i in range(len(t)):
            rings = [
                np.array([[p["x"], p["y"]] for p in ring]) for ring in rings_col[i]
            ]
            polys.append((ids[i], int(lcs[i]), rings))
        df = random_points_in_polygons(polys, n_per_poly, seed=seed)
        return _pa.Table.from_pandas(df, preserve_index=False)

    ds = rd.read_parquet(polygons_path)
    expr = " or ".join(f"kind == '{k}'" for k in kinds)
    ds = ds.filter(expr=expr)
    return ds.map_batches(per_batch, batch_format="pyarrow")


WSAMPLE_TAG = "wsample"


def weighted_sample_k(
    ds,
    id_cols: list[str],
    weight_col: str,
    k: int,
    seed: int = DEFAULT_SEED,
):
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    each row draws priority = ln(u)/w with an independent seeded uniform
    u ∈ (0, 1] and weight w = max(weight_col, 1); the k rows with the
    LARGEST priority are exactly a w-proportional sample without
    replacement.  The curation use: sample documents proportional to
    length/quality for inspection or distillation without a global sort.

    Determinism contract: u = ((hash_key(seed, tag, id) >> 11) + 1)·2⁻⁵³ —
    never zero, exact as a double; ln is libm (np.frompyfunc(math.log) =
    DuckDB ln); w int→double exact; ties break on id.  Identical under any
    partitioning.

    Scale shape: stateless priority map + the Dataset-native two-level
    ``top_k`` — ≤k rows leave each block, nothing corpus-sized reaches the
    driver (same as ``sample_k``)."""
    from .joins import top_k

    def fn(t: pa.Table) -> pa.Table:
        import math

        _ln = np.frompyfunc(math.log, 1, 1)
        key = _row_key(t, id_cols)
        h = hash_key(seed, WSAMPLE_TAG, key)
        u = ((h >> np.uint64(11)) + np.uint64(1)).astype(np.float64) * (2.0**-53)
        w = np.maximum(
            t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64),
            1.0,
        )
        pr = _ln(u).astype(np.float64) / w
        return t.append_column("priority", pa.array(pr))

    withp = ds.map_batches(fn, batch_format="pyarrow")
    return top_k(withp, "priority", k, tiebreak_col=id_cols[0], descending=True)


def weighted_sample_k_sql(
    docs_sql: str,
    k: int,
    cols: str,
    weight_col: str,
    seed: int = DEFAULT_SEED,
    id_col: str = "doc_id",
) -> str:
    """Oracle: identical hash chain, u = (hv//2048 + 1)·2⁻⁵³, priority =
    ln(u)/greatest(w, 1), ORDER BY (priority DESC, id) LIMIT k."""
    eps = repr(2.0**-53)
    return f"""
        SELECT {cols},
               ln(CAST(hv // 2048 + 1 AS BIGINT) * {eps})
                   / greatest({weight_col}, 1) AS priority
        FROM ({_row_hash_sql(docs_sql, WSAMPLE_TAG, seed, id_col)})
        ORDER BY priority DESC, {id_col} LIMIT {k}"""


# ------------------------------------------------- Poisson bootstrap
#
# The online/Poisson bootstrap (Chamandy et al.; Kleiner's BLB family): at
# corpus scale you cannot resample-with-replacement (a replicate would be a
# full shuffle), but Poisson(1) per-row weights are an excellent
# approximation to multinomial resampling and need ONE streaming pass for
# ALL replicates.  Deterministic: weights come from the house splitmix64
# stream keyed (seed, "boot", doc_id, rep), so any partitioning / cluster
# size / rerun yields the identical replicate table.

BOOT_TAG = "boot"
BOOT_REPS = 32
_U53 = 1 << 53


def _poisson1_thresholds(kmax: int = 8) -> list[int]:
    """floor(CDF_Poisson(1)(k) · 2⁵³) for k = 0..kmax-1 — PINNED integer
    literals shared by engine and SQL (the SQL embeds these values, it
    never recomputes exp), so the inverse-CDF draw is bit-identical.
    w = #{T_k ≤ u53} ∈ 0..kmax; P(w ≥ 9) < 1e-6 mass lands on w = kmax."""
    import math

    c = 0.0
    pmf = math.exp(-1.0)
    out = []
    for k in range(kmax):
        c += pmf
        out.append(int(math.floor(c * float(_U53))))
        pmf /= k + 1
    return out


POIS1_T = tuple(_poisson1_thresholds())


def bootstrap_mean(
    ds,
    value_col: str,
    reps: int = BOOT_REPS,
    seed: int = DEFAULT_SEED,
    id_col: str = "doc_id",
):
    """Per-replicate Poisson-bootstrap mean of an integer column: one
    streaming pass computes ALL ``reps`` weighted partial sums (a batch
    emits ``reps`` partial rows), a ≤reps-row bucketed combine finishes.

    Output: (rep, n_eff, sum_x, mean_x) — mean_x is the single pinned
    division sum_x/n_eff (NaN when a replicate drew zero total weight).
    The spread of mean_x across replicates IS the bootstrap SE of the
    corpus mean — computed without ever reshuffling the corpus.
    """
    from ..state.hashing import splitmix64
    from .zonal import bucketed_sum

    pre = hash_key(seed, BOOT_TAG)
    z0 = splitmix64(np.uint64(0))
    t_arr = np.asarray(POIS1_T, dtype=np.uint64)
    rvec = np.arange(reps, dtype=np.uint64)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "rep": pa.array([], pa.int64()),
                    "n_eff": pa.array([], pa.int64()),
                    "sum_x": pa.array([], pa.int64()),
                }
            )
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        x = t.column(value_col).to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            rk = splitmix64(z0 ^ ids)
            hv = splitmix64(pre ^ rk)
            hr = splitmix64(hv[:, None] ^ rvec[None, :])
        u53 = (hr >> np.uint64(11)).astype(np.uint64)
        w = np.searchsorted(t_arr, u53, side="right").astype(np.int64)
        return pa.table(
            {
                "rep": pa.array(np.arange(reps, dtype=np.int64)),
                "n_eff": pa.array(w.sum(axis=0)),
                "sum_x": pa.array((w * x[:, None]).sum(axis=0)),
            }
        )

    agg = bucketed_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["rep"],
        ["n_eff", "sum_x"],
    )

    def finish(t: pa.Table) -> pa.Table:
        ne = t.column("n_eff").to_numpy(zero_copy_only=False).astype(np.int64)
        sx = t.column("sum_x").to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = np.where(
                ne > 0, sx.astype(np.float64) / ne.astype(np.float64), np.nan
            )
        return t.append_column("mean_x", pa.array(mean))

    return agg.map_batches(finish, batch_format="pyarrow")


def bootstrap_mean_sql(
    docs_sql: str,
    value_col: str,
    reps: int = BOOT_REPS,
    seed: int = DEFAULT_SEED,
    id_col: str = "doc_id",
) -> str:
    """Oracle twin: identical hash chain (hv from _row_hash_sql, one more
    splitmix fold of the replicate index), the PINNED threshold literals
    of :data:`POIS1_T`, grouped integer sums, one pinned division."""
    from ..state import sqlhash as SH

    base = _row_hash_sql(docs_sql, BOOT_TAG, seed, id_col)
    chain = SH.chain_select(
        f"SELECT * FROM ({base}) CROSS JOIN range({reps}) t(r)",
        SH.splitmix_steps(SH.xor64("hv", "CAST(r AS HUGEINT)"), "hr", "bt"),
    )
    w = " + ".join(
        f"(CASE WHEN hr // 2048 >= {t} THEN 1 ELSE 0 END)" for t in POIS1_T
    )
    return f"""
        WITH boot_w AS (
            SELECT CAST(r AS BIGINT) AS rep, ({w}) AS w, {value_col} AS x
            FROM ({chain})
        ),
        boot_agg AS (
            SELECT rep, CAST(SUM(w) AS BIGINT) AS n_eff,
                   CAST(SUM(w * x) AS BIGINT) AS sum_x
            FROM boot_w GROUP BY rep
        )
        SELECT rep, n_eff, sum_x,
               CASE WHEN n_eff > 0
                    THEN CAST(sum_x AS DOUBLE) / CAST(n_eff AS DOUBLE)
                    ELSE CAST('nan' AS DOUBLE) END AS mean_x
        FROM boot_agg"""


def spatial_folds(geo, k: int = 5, block_levels: int = 4):
    """Spatial BLOCK cross-validation folds — the leakage-free
    alternative to random k-fold for spatial data (random splits leak
    through autocorrelation; block folds hold out whole contiguous
    areas): each observation's cell maps to its Morton block
    (``block_levels`` up) and the fold is the checkerboard assignment
    (block_x + block_y) mod k, so folds interleave spatially and every
    fold's test set is a union of contiguous blocks.

    Pure integer, stateless, zero shuffle; reshard-invariant by
    construction.

    Output: (doc_id:string, span_idx:int64, cell_id:int64, fold:int64).
    """
    from ..state.cells import CELL_LEVEL, decode

    shift = np.int64(block_levels)

    def fn(t: pa.Table) -> pa.Table:
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        ix, iy = decode(cid, CELL_LEVEL)
        bx = ix.astype(np.int64) >> shift
        by = iy.astype(np.int64) >> shift
        fold = (bx + by) % np.int64(k)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "span_idx": pa.array(
                    t.column("span_idx")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "cell_id": pa.array(cid.astype(np.int64)),
                "fold": pa.array(fold, pa.int64()),
            }
        )

    return geo.map_batches(fn, batch_format="pyarrow")
