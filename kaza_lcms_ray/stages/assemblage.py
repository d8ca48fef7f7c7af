"""Assemblage: per-tile argmax over per-class primitive probabilities →
LANDCOVER label (SURVEY.md 2.5-K3/K7; reference: src/utils/assemblage.py).

Reference semantics (src/utils/assemblage.py:12-25): band-order argmax over
the alphanumerically-sorted class probability bands, ties resolved to the
lowest band index, then +1 to land in the 1-based strata values
(src/misc/strata.py:12-21).  Our primitives table already carries 1-based
``class``, so the tie rule is: winner = lowest ``class`` among the max-prob
rows.

Execution is fully decomposable (NO map_groups over millions of tiny groups):
``(prob, class)`` is packed into one monotonic int64 score —
``float32_bits(prob) * 256 + (256 − class)`` — whose Max over any combine
order selects max prob then min class.  Per-batch partial max → small
``groupby().aggregate(Max)`` → decode.  Exact, vectorized, skew-free.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


_KEYS = ["tile_id", "year"]


def _pack_score(prob: np.ndarray, cls: np.ndarray) -> np.ndarray:
    # positive float32 bit patterns are order-isomorphic to their values
    bits = np.asarray(prob, dtype=np.float32).view(np.uint32).astype(np.int64)
    return bits * 256 + (256 - cls.astype(np.int64))


def _unpack_score(score: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    cls = (256 - (score % 256)).astype(np.int32)
    prob = (score // 256).astype(np.uint32).view(np.float32)
    return prob, cls


def _partial(batch: pa.Table) -> pa.Table:
    score = _pack_score(
        batch.column("prob").to_numpy(zero_copy_only=False),
        batch.column("class").to_numpy(zero_copy_only=False),
    )
    t = pa.table(
        {
            "tile_id": batch.column("tile_id"),
            "year": batch.column("year"),
            "score": pa.array(score),
        }
    )
    out = t.group_by(_KEYS).aggregate([("score", "max")])
    return out.rename_columns(_KEYS + ["score"])


def _decode(batch: pa.Table) -> pa.Table:
    prob, cls = _unpack_score(batch.column("score").to_numpy(zero_copy_only=False))
    return pa.table(
        {
            "tile_id": batch.column("tile_id"),
            "year": batch.column("year"),
            "LANDCOVER": pa.array(cls, type=pa.int32()),
            "prob": pa.array(prob, type=pa.float32()),
        }
    )


def assemble_tile_labels(primitives):
    """Dataset[tile_id, year, class, prob] → Dataset[tile_id, year,
    LANDCOVER, prob] (the winning class and its probability).

    Combine step is hash-bucketed (same pattern as zonal.bucketed_sum):
    with millions of tiles, a bucketed pandas max beats the sort-based
    groupby aggregate by an order of magnitude."""
    import pandas as pd

    from .zonal import _add_bucket, _default_buckets

    partial = primitives.map_batches(_partial, batch_format="pyarrow")
    # second-level partial over large batches before the shuffle (same
    # rationale as zonal.bucketed_sum's recombine pass); num_cpus=1.01
    # breaks fusion with the upstream map — fused, the big batch_size
    # bundles input blocks and collapses upstream parallelism (see
    # bucketed_sum)
    partial = partial.map_batches(
        lambda t: t.group_by(_KEYS)
        .aggregate([("score", "max")])
        .rename_columns(_KEYS + ["score"]),
        batch_format="pyarrow",
        batch_size=512 * 1024,
        num_cpus=1.01,
    )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(_KEYS, as_index=False)["score"].max()

    return (
        _add_bucket(partial, _KEYS, _default_buckets())
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
        .select_columns(_KEYS + ["score"])
        .map_batches(_decode, batch_format="pyarrow")
    )


def change_matrix(primitives, year_a: int, year_b: int):
    """Land-cover CHANGE (transition) matrix between two assemblage years
    — the reference workflow's change-detection product (per-tile label in
    ``year_a`` vs ``year_b``, counted per (from, to) class pair).

    Scale shape: tile labels reduce through the bucketed max-by
    (``assemble_tile_labels``); the two year slices hash-join on tile_id
    (tiles are the bounded assemblage grid — the join is cell-table-sized,
    never observation-sized), then counts collapse per batch to ≤k² rows
    before one tiny grouped sum.

    Output: (from_class:int64, to_class:int64, n_tiles:int64).
    """
    import pyarrow.compute as pc

    from ..runtime import join_partitions
    from .zonal import bucketed_sum

    # materialize ONCE: both year slices re-read the reduced label table
    # (bounded by the assemblage grid) instead of re-running the whole
    # max-by reduction per side
    labels = assemble_tile_labels(primitives).materialize()
    n_tiles_hint = labels.count()

    def slice_year(y: int, out: str):
        def fn(t: pa.Table) -> pa.Table:
            m = pc.equal(t.column("year"), y)
            s = t.filter(m)
            return pa.table(
                {
                    "tile_id": pc.cast(s.column("tile_id"), pa.int64()),
                    out: pc.cast(s.column("LANDCOVER"), pa.int64()),
                }
            )

        return labels.map_batches(fn, batch_format="pyarrow")

    joined = slice_year(year_a, "from_class").join(
        slice_year(year_b, "to_class"),
        join_type="inner",
        num_partitions=join_partitions(n_tiles_hint),
        on=("tile_id",),
    )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["from_class", "to_class"])
            .group_by(["from_class", "to_class"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["from_class", "to_class", "n_tiles"])

    return bucketed_sum(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["from_class", "to_class"],
        ["n_tiles"],
        recombine_batch_size=None,
    )


def majority_smooth(primitives, year: int = 2022):
    """Majority (modal) filter over the assembled label raster — the
    standard post-classification cleanup (the reference applies
    focal-mode smoothing to its assemblage rasters before area
    reporting): each labeled tile takes the most frequent LANDCOVER among
    its 3×3 neighborhood's labeled tiles (self included); ties break to
    the SMALLEST class id.

    Exactness: votes are integer counts; the winner is selected through
    the same pack-max trick as :func:`assemble_tile_labels`
    (score = n·256 + (256 − class) — max ⇒ highest count, then lowest
    class), so every step is integer arithmetic.

    Scale shape: everything after the assemble reduce runs on the
    AOI-bounded tile table — 9-way fan, broadcast occupancy probe,
    bucketed integer count combine, bucketed max.

    Output: (tile_id:int64, smooth_label:int64, n_votes:int64).
    """
    import pandas as pd

    import ray

    from ..state.cells import TILE_LEVEL, decode, morton
    from .zonal import _add_bucket, _default_buckets, bucketed_sum

    labels = (
        assemble_tile_labels(primitives)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
        .materialize()
    )
    lab_pd = labels.to_pandas()
    empty = pa.table(
        {
            "tile_id": pa.array([], pa.int64()),
            "smooth_label": pa.array([], pa.int64()),
            "n_votes": pa.array([], pa.int64()),
        }
    )
    if len(lab_pd) == 0:
        import ray.data as rd

        return rd.from_arrow(empty)

    n_grid = np.int64(1) << TILE_LEVEL
    occ_ref = ray.put(np.sort(lab_pd["tile_id"].to_numpy(np.int64)))

    def fan(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        lc = t.column("LANDCOVER").to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = decode(tid, TILE_LEVEL)
        occ = ray.get(occ_ref)
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tx, ty = ix + dx, iy + dy
                m = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
                tgt = morton(tx[m], ty[m]).astype(np.int64)
                pos = np.searchsorted(occ, tgt)
                hit = (pos < len(occ)) & (
                    occ[np.minimum(pos, len(occ) - 1)] == tgt
                )
                parts.append(
                    pa.table(
                        {
                            "tile_id": pa.array(tgt[hit]),
                            "lc": pa.array(lc[m][hit]),
                        }
                    )
                )
        part = pa.concat_tables(parts)
        out = part.group_by(["tile_id", "lc"]).aggregate([([], "count_all")])
        return out.rename_columns(["tile_id", "lc", "n"])

    counts = bucketed_sum(
        labels.map_batches(fan, batch_format="pyarrow"),
        keys=["tile_id", "lc"],
        sum_cols=["n"],
        rows_hint=len(lab_pd),
        recombine_batch_size=None,
    )

    def pack(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        lc = t.column("lc").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "tile_id": t.column("tile_id"),
                "score": pa.array(n * 256 + (256 - lc)),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["tile_id"], as_index=False)["score"].max()

    def unpack(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        s = t.column("score").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "tile_id": t.column("tile_id").cast(pa.int64()),
                "smooth_label": pa.array(256 - (s % 256)),
                "n_votes": pa.array(s // 256),
            }
        )

    return (
        _add_bucket(
            counts.map_batches(pack, batch_format="pyarrow"),
            ["tile_id"],
            _default_buckets(len(lab_pd)),
        )
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
        .select_columns(["tile_id", "score"])
        .map_batches(unpack, batch_format="pyarrow")
    )


def clump_sizes(primitives, year: int = 2022, block_levels: int = 4, mmu: int = 4):
    """Block-bounded connected components of the classified label raster —
    the `connectedPixelCount` / clump analog (EE caps the transform with
    ``maxSize`` for exactly this locality reason), plus the
    minimum-mapping-unit sieve flag the land-cover post-processing
    literature applies before area reporting: components smaller than
    ``mmu`` tiles are flagged for relabeling.

    Semantics: components are 4-connected same-LANDCOVER tiles WITHIN a
    2^block_levels × 2^block_levels Morton block (block = parent
    ``block_levels`` up).  The block cap is the documented partitioning
    assumption: like EE's connectedPixelCount(maxSize=…), a component is
    never traced across block boundaries, which keeps every task's state
    bounded at block² tiles no matter the corpus size.

    Exactness: component id = MIN tile_id in the component and size = its
    tile count — pure graph properties of the integer adjacency, so the
    result is algorithm-independent (the engine runs an in-block min-label
    propagation to fixpoint; the oracle a recursive-CTE closure) and every
    output column is int64.

    Scale shape: corpus-sized work is only the assemble reduce; blocks
    hash-bucket across tasks and each block's propagation touches ≤
    (2^block_levels)² rows.

    Output: (tile_id:int64, LANDCOVER:int64, comp_id:int64,
    comp_size:int64, sieve:int64).
    """
    import pandas as pd

    import ray.data as rd

    from ..state.cells import TILE_LEVEL, decode, morton
    from .zonal import _add_bucket, _default_buckets

    labels = (
        assemble_tile_labels(primitives)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
        .materialize()
    )
    cols = ["tile_id", "LANDCOVER", "comp_id", "comp_size", "sieve"]
    n_rows = labels.count()
    if n_rows == 0:
        return rd.from_arrow(
            pa.table({c: pa.array([], pa.int64()) for c in cols})
        )
    shift = np.int64(2 * block_levels)

    def add_blk(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        return t.append_column("blk", pa.array(tid >> shift))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("tile_id", kind="mergesort")
        tid = g["tile_id"].to_numpy(np.int64)
        lc = g["LANDCOVER"].to_numpy(np.int64)
        blk = tid >> shift
        brk = np.flatnonzero(np.concatenate(([True], blk[1:] != blk[:-1])))
        ends = np.concatenate((brk[1:], [len(tid)]))
        out = []
        for s, e in zip(brk, ends):
            ids = tid[s:e]
            labv = lc[s:e]
            ix, iy = decode(ids, TILE_LEVEL)
            ea_l, eb_l = [], []
            for dx, dy in ((1, 0), (0, 1)):
                nb = morton(ix + dx, iy + dy).astype(np.int64)
                pos = np.minimum(np.searchsorted(ids, nb), len(ids) - 1)
                hit = (ids[pos] == nb) & (labv[pos] == labv)
                ea_l.append(np.flatnonzero(hit))
                eb_l.append(pos[hit])
            ea = np.concatenate(ea_l)
            eb = np.concatenate(eb_l)
            comp = ids.copy()
            while True:
                new = comp.copy()
                if len(ea):
                    np.minimum.at(new, ea, comp[eb])
                    np.minimum.at(new, eb, comp[ea])
                if np.array_equal(new, comp):
                    break
                comp = new
            uniq, inv, cnt = np.unique(comp, return_inverse=True, return_counts=True)
            size = cnt[inv]
            out.append(
                pd.DataFrame(
                    {
                        "tile_id": ids,
                        "LANDCOVER": labv,
                        "comp_id": comp,
                        "comp_size": size.astype(np.int64),
                        "sieve": (size < mmu).astype(np.int64),
                    }
                )
            )
        return pd.concat(out, ignore_index=True).astype(np.int64)

    return (
        _add_bucket(
            labels.map_batches(add_blk, batch_format="pyarrow"),
            ["blk"],
            _default_buckets(n_rows),
        )
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(cols)
    )


CORE_ZONE_BIAS = 32  # packs signed elevation zones into the tile·256+z key


def core_area(primitives, year: int = 2022, band_m: float = 100.0):
    """FRAGSTATS core-area index (CAI) per ELEVATION BELT over the study
    footprint: each labeled tile is assigned the zone
    ``floor(elev(tile_center) / band_m)`` from the analytic DEM (the smooth
    static ancillary surface, state/dem.py — the classified land-cover
    raster itself is deliberately NOT used because core area of a
    salt-and-pepper field is identically zero); a tile is CORE iff all
    four of its 4-neighbors are in-bounds, on-footprint and share its
    zone (the 1-tile-depth edge rule — edge and boundary tiles are never
    core); CAI_z = 100·core_z/area_z.  Reference analog: the per-stratum
    area rollups over DEM-derived zones (src/misc/strata.py shape).

    Rides the :func:`class_shape` key machinery: because adjacency is
    symmetric, the number of directed probes landing ON key
    (tile·256+zone) from same-zone neighbors IS that tile's same-zone
    neighbor count, so core = keys with n_base = 1 and n_probe = 4 — the
    ONE bucketed combine already decides it; per-zone partials then
    collapse through a tiny grouped sum.  area/core exact ints; CAI ONE
    pinned double division (elev is libm-closed-form, bit-identical to
    the SQL oracle, so the floor-quantized zone is exact on both sides).

    Output: (zone:int64, area:int64, core:int64, cai:float64).
    """
    import ray.data as rd

    from ..state import cells, dem
    from ..state.cells import TILE_LEVEL
    from .joins import distinct
    from .zonal import bucketed_sum

    labels = (
        distinct(
            primitives.filter(expr=f"year == {year}").select_columns(["tile_id"]),
            ["tile_id"],
        )
        .materialize()
    )
    if labels.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "zone": pa.array([], pa.int64()),
                    "area": pa.array([], pa.int64()),
                    "core": pa.array([], pa.int64()),
                    "cai": pa.array([], pa.float64()),
                }
            )
        )
    hi = (1 << TILE_LEVEL) - 1

    def fan(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        lon, lat = cells.cell_center(tid, TILE_LEVEL)
        lc = np.floor(dem.elev(lon, lat) / band_m).astype(np.int64) + np.int64(
            CORE_ZONE_BIAS
        )
        assert ((lc >= 0) & (lc < 256)).all(), "zone out of key-pack range"
        ix, iy = cells.decode(tid, TILE_LEVEL)
        parts = [
            pa.table(
                {
                    "k": pa.array(tid * np.int64(256) + lc, pa.int64()),
                    "n_probe": pa.array(np.zeros(len(tid), np.int64)),
                    "n_base": pa.array(np.ones(len(tid), np.int64)),
                }
            )
        ]
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            m = (ix + dx >= 0) & (ix + dx <= hi) & (iy + dy >= 0) & (iy + dy <= hi)
            nbr = cells.morton(ix[m] + dx, iy[m] + dy)
            g = (
                pa.table({"k": pa.array(nbr * np.int64(256) + lc[m], pa.int64())})
                .group_by(["k"])
                .aggregate([([], "count_all")])
            )
            parts.append(
                pa.table(
                    {
                        "k": g.column("k"),
                        "n_probe": g.column("count_all"),
                        "n_base": pa.array(np.zeros(g.num_rows, np.int64)),
                    }
                )
            )
        return pa.concat_tables(parts)

    per_key = bucketed_sum(
        labels.map_batches(fan, batch_format="pyarrow"),
        ["k"],
        ["n_probe", "n_base"],
    )

    def partial(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        npb = t.column("n_probe").to_numpy(zero_copy_only=False)
        nb = t.column("n_base").to_numpy(zero_copy_only=False)
        z = (k & np.int64(255)) - np.int64(CORE_ZONE_BIAS)
        g = (
            pa.table(
                {
                    "zone": pa.array(z, pa.int64()),
                    "area": pa.array(nb, pa.int64()),
                    "core": pa.array(
                        ((nb > 0) & (npb == 4)).astype(np.int64), pa.int64()
                    ),
                }
            )
            .group_by(["zone"])
            .aggregate([("area", "sum"), ("core", "sum")])
        )
        return g.rename_columns(["zone", "area", "core"])


    agg = bucketed_sum(
        per_key.map_batches(partial, batch_format="pyarrow"),
        ["zone"],
        ["area", "core"],
        max_keys_hint=1 << 16,  # |zones| — tree reduce
    ).to_pandas()  # ≤ |zones| rows
    z = agg["zone"].to_numpy(np.int64)
    area = agg["area"].to_numpy(np.int64)
    core = agg["core"].to_numpy(np.int64)
    order = np.argsort(z, kind="mergesort")
    z, area, core = z[order], area[order], core[order]
    cai = (100 * core).astype(np.float64) / area.astype(np.float64)
    return rd.from_arrow(
        pa.table(
            {
                "zone": pa.array(z, pa.int64()),
                "area": pa.array(area, pa.int64()),
                "core": pa.array(core, pa.int64()),
                "cai": pa.array(cai, pa.float64()),
            }
        )
    )


def class_shape(primitives, year: int = 2022):
    """FRAGSTATS-style CLASS-level shape metrics over the classified label
    raster — the landscape-ecology report card (area, perimeter, landscape
    share, landscape shape index) a land-cover monitoring product ships
    next to its per-class areas (reference analog: the per-class area
    rollups of src/misc/strata.py over the assembled LANDCOVER raster).

    Semantics (4-connected, grid-bounded): for class c,
      area_c       = # tiles labeled c;
      perimeter_c  = # tile edges whose other side is a different class,
                     an unlabeled tile, or the grid boundary
                   = 4·area_c − (# directed same-class adjacencies);
      share_c      = area_c / Σ area (ONE double division);
      lsi_c        = 0.25·perimeter_c / √area_c (the FRAGSTATS LSI
                     numerator form; ×0.25 is exact in IEEE, then one
                     division by an exactly-rounded sqrt).

    Exactness: area/perimeter are pure integers; the directed same-class
    adjacency count is membership of (neighbor_tile, own_class) keys in
    the (tile, class) label set, so any combine order agrees bit-for-bit
    and the two doubles are pinned single-operation chains the SQL oracle
    repeats verbatim.

    Scale shape: one fan pass emits ≤4 in-bounds probe keys per tile
    (pre-aggregated per batch), labels contribute (key, base=1) rows; ONE
    bucketed integer combine joins them by key; per-batch (class, area,
    same) partials then collapse through a ≤|classes|·buckets-row final
    sum — raw tiles never reach the driver.

    Output: (LANDCOVER:int64, area:int64, perimeter:int64, share:float64,
    lsi:float64), one row per class present.
    """
    import ray.data as rd

    from ..state import cells
    from ..state.cells import TILE_LEVEL
    from .zonal import bucketed_sum

    labels = (
        assemble_tile_labels(primitives)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
        .materialize()
    )
    out_cols = ["LANDCOVER", "area", "perimeter", "share", "lsi"]
    if labels.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "LANDCOVER": pa.array([], pa.int64()),
                    "area": pa.array([], pa.int64()),
                    "perimeter": pa.array([], pa.int64()),
                    "share": pa.array([], pa.float64()),
                    "lsi": pa.array([], pa.float64()),
                }
            )
        )
    hi = (1 << TILE_LEVEL) - 1

    def fan(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        lc = t.column("LANDCOVER").to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = cells.decode(tid, TILE_LEVEL)
        parts = [
            pa.table(
                {
                    "k": pa.array(tid * np.int64(256) + lc, pa.int64()),
                    "n_probe": pa.array(np.zeros(len(tid), np.int64)),
                    "n_base": pa.array(np.ones(len(tid), np.int64)),
                }
            )
        ]
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            m = (ix + dx >= 0) & (ix + dx <= hi) & (iy + dy >= 0) & (iy + dy <= hi)
            nbr = cells.morton(ix[m] + dx, iy[m] + dy)
            g = (
                pa.table({"k": pa.array(nbr * np.int64(256) + lc[m], pa.int64())})
                .group_by(["k"])
                .aggregate([([], "count_all")])
            )
            parts.append(
                pa.table(
                    {
                        "k": g.column("k"),
                        "n_probe": g.column("count_all"),
                        "n_base": pa.array(
                            np.zeros(g.num_rows, np.int64)
                        ),
                    }
                )
            )
        return pa.concat_tables(parts)

    per_key = bucketed_sum(
        labels.map_batches(fan, batch_format="pyarrow"),
        ["k"],
        ["n_probe", "n_base"],
    )

    def partial(t: pa.Table) -> pa.Table:
        k = t.column("k").to_numpy(zero_copy_only=False)
        npb = t.column("n_probe").to_numpy(zero_copy_only=False)
        nb = t.column("n_base").to_numpy(zero_copy_only=False)
        lc = k & np.int64(255)
        present = nb > 0
        g = (
            pa.table(
                {
                    "LANDCOVER": pa.array(lc, pa.int64()),
                    "area": pa.array(nb, pa.int64()),
                    "same": pa.array(np.where(present, npb, 0), pa.int64()),
                }
            )
            .group_by(["LANDCOVER"])
            .aggregate([("area", "sum"), ("same", "sum")])
        )
        return g.rename_columns(["LANDCOVER", "area", "same"])


    agg = bucketed_sum(
        per_key.map_batches(partial, batch_format="pyarrow"),
        ["LANDCOVER"],
        ["area", "same"],
        max_keys_hint=1 << 16,  # |classes| — tree reduce
    ).to_pandas()  # ≤ |classes| rows
    lc = agg["LANDCOVER"].to_numpy(np.int64)
    area = agg["area"].to_numpy(np.int64)
    same = agg["same"].to_numpy(np.int64)
    order = np.argsort(lc, kind="mergesort")
    lc, area, same = lc[order], area[order], same[order]
    per = 4 * area - same
    total = int(area.sum())
    share = area.astype(np.float64) / np.float64(total)
    lsi = per.astype(np.float64) * 0.25 / np.sqrt(area.astype(np.float64))
    return rd.from_arrow(
        pa.table(
            {
                "LANDCOVER": pa.array(lc, pa.int64()),
                "area": pa.array(area, pa.int64()),
                "perimeter": pa.array(per, pa.int64()),
                "share": pa.array(share, pa.float64()),
                "lsi": pa.array(lsi, pa.float64()),
            }
        )
    )


SHDI_SCALE = 1 << 30  # quantization of the per-label entropy terms


def landscape_diversity(primitives, year: int = 2022):
    """Shannon diversity index (SHDI) of the 3×3 label neighborhood per
    labeled tile — the standard landscape-ecology heterogeneity metric
    over a classified raster:

        H = Σ_labels −(n/N)·ln(n/N)

    Exactness: neighborhood label counts are the integer votes of
    :func:`majority_smooth`; every entropy term floor-quantizes to
    ⌊−(n/N)·ln(n/N)·2³⁰⌋ int64 (libm ln — order-free integer sum over
    the ≤|classes| labels of a tile); the reported H is one pinned
    division h_q/2³⁰.

    Output: (tile_id:int64, n_labels:int64, n_votes:int64, h_q:int64,
    shannon:f64).
    """
    import math

    import pandas as pd

    import ray

    from ..state.cells import TILE_LEVEL, decode, morton
    from .zonal import _add_bucket, _default_buckets, bucketed_sum

    labels = (
        assemble_tile_labels(primitives)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
        .materialize()
    )
    lab_pd = labels.to_pandas()
    empty = pd.DataFrame(
        {
            "tile_id": pd.Series([], dtype=np.int64),
            "n_labels": pd.Series([], dtype=np.int64),
            "n_votes": pd.Series([], dtype=np.int64),
            "h_q": pd.Series([], dtype=np.int64),
            "shannon": pd.Series([], dtype=np.float64),
        }
    )
    if len(lab_pd) == 0:
        import ray.data as rd

        return rd.from_pandas(empty)

    n_grid = np.int64(1) << TILE_LEVEL
    occ_ref = ray.put(np.sort(lab_pd["tile_id"].to_numpy(np.int64)))

    def fan(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        lc = t.column("LANDCOVER").to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = decode(tid, TILE_LEVEL)
        occ = ray.get(occ_ref)
        parts = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                tx, ty = ix + dx, iy + dy
                m = (tx >= 0) & (tx < n_grid) & (ty >= 0) & (ty < n_grid)
                tgt = morton(tx[m], ty[m]).astype(np.int64)
                pos = np.searchsorted(occ, tgt)
                hit = (pos < len(occ)) & (
                    occ[np.minimum(pos, len(occ) - 1)] == tgt
                )
                parts.append(
                    pa.table(
                        {
                            "tile_id": pa.array(tgt[hit]),
                            "lc": pa.array(lc[m][hit]),
                        }
                    )
                )
        part = pa.concat_tables(parts)
        out = part.group_by(["tile_id", "lc"]).aggregate([([], "count_all")])
        return out.rename_columns(["tile_id", "lc", "n"])

    counts = bucketed_sum(
        labels.map_batches(fan, batch_format="pyarrow"),
        keys=["tile_id", "lc"],
        sum_cols=["n"],
        rows_hint=len(lab_pd),
        recombine_batch_size=None,
    )

    S = float(SHDI_SCALE)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        log_u = np.frompyfunc(math.log, 1, 1)
        g = g.sort_values(["tile_id"], kind="mergesort")
        tid = g["tile_id"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        tot = g.groupby("tile_id")["n"].transform("sum").to_numpy(np.int64)
        frac = n.astype(np.float64) / tot.astype(np.float64)
        term = np.floor(
            -(frac * log_u(frac).astype(np.float64)) * S
        ).astype(np.int64)
        out = pd.DataFrame({"tile_id": tid, "term": term, "one": 1, "n": n})
        agg = out.groupby("tile_id", as_index=False).agg(
            n_labels=("one", "sum"), n_votes=("n", "sum"), h_q=("term", "sum")
        )
        agg["shannon"] = agg["h_q"].to_numpy(np.float64) / S
        return agg.astype(
            {
                "tile_id": np.int64,
                "n_labels": np.int64,
                "n_votes": np.int64,
                "h_q": np.int64,
                "shannon": np.float64,
            }
        )

    return (
        _add_bucket(counts, ["tile_id"], _default_buckets(len(lab_pd)))
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(["tile_id", "n_labels", "n_votes", "h_q", "shannon"])
    )


def label_pyramid(primitives, year: int = 2022, levels_up=(1, 2)):
    """Majority-rule categorical overviews of the assembled label raster —
    the categorical counterpart of zonal.raster_pyramid's mean pyramid
    (continuous bands average; LABELS take the modal child, the standard
    categorical-overview resample rule): each parent tile at
    TILE_LEVEL−k takes the most frequent LANDCOVER among its labeled
    child tiles, ties to the smallest class id.

    Exactness: integer votes, the same n·256 + (256 − class) pack-max
    winner as :func:`majority_smooth` — bit-stable at any partitioning.

    Scale shape: per-batch parent re-key (bit shift) + in-batch counts,
    one bucketed integer combine over the AOI-bounded (level, parent,
    class) table, bucketed pack-max.

    Output: (level_up:int64, tile_id:int64 [parent at TILE_LEVEL−k],
    LANDCOVER:int64, n_votes:int64).
    """
    import pandas as pd

    from ..state.cells import TILE_LEVEL, decode, morton
    from .zonal import _add_bucket, _default_buckets, bucketed_sum

    labels = (
        assemble_tile_labels(primitives)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
    )
    empty = pa.table(
        {
            "level_up": pa.array([], pa.int64()),
            "tile_id": pa.array([], pa.int64()),
            "LANDCOVER": pa.array([], pa.int64()),
            "n_votes": pa.array([], pa.int64()),
        }
    )

    def fan(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        lc = t.column("LANDCOVER").to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = decode(tid, TILE_LEVEL)
        parts = []
        for k in levels_up:
            parent = morton(
                ix.astype(np.int64) >> k, iy.astype(np.int64) >> k
            ).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        "level_up": pa.array(np.full(len(parent), k, np.int64)),
                        "tile_id": pa.array(parent),
                        "lc": pa.array(lc),
                    }
                )
            )
        cat = pa.concat_tables(parts)
        out = cat.group_by(["level_up", "tile_id", "lc"]).aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["level_up", "tile_id", "lc", "n"])

    counts = bucketed_sum(
        labels.map_batches(fan, batch_format="pyarrow"),
        keys=["level_up", "tile_id", "lc"],
        sum_cols=["n"],
        recombine_batch_size=None,
    )

    def pack(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        lc = t.column("lc").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "level_up": t.column("level_up"),
                "tile_id": t.column("tile_id"),
                "score": pa.array(n * 256 + (256 - lc)),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["level_up", "tile_id"], as_index=False)["score"].max()

    def unpack(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return empty
        s = t.column("score").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "level_up": t.column("level_up").cast(pa.int64()),
                "tile_id": t.column("tile_id").cast(pa.int64()),
                "LANDCOVER": pa.array(256 - (s % 256)),
                "n_votes": pa.array(s // 256),
            }
        )

    return (
        _add_bucket(
            counts.map_batches(pack, batch_format="pyarrow"),
            ["level_up", "tile_id"],
            _default_buckets(None),
        )
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
        .select_columns(["level_up", "tile_id", "score"])
        .map_batches(unpack, batch_format="pyarrow")
    )


def label_pyramid_sql(labels_sql: str, levels_up=(1, 2)) -> str:
    """Oracle twin of :func:`label_pyramid`: bit-shift parent re-key per
    level, grouped counts, (n DESC, class ASC) QUALIFY winner (the same
    selection the pack-max encodes)."""
    from ..state.cells import TILE_LEVEL, morton_decode_sql_expr, morton_sql_expr

    ix = morton_decode_sql_expr("tile_id", TILE_LEVEL, "x")
    iy = morton_decode_sql_expr("tile_id", TILE_LEVEL, "y")
    branches = []
    for k in levels_up:
        parent = morton_sql_expr(f"(({ix}) // {1 << k})", f"(({iy}) // {1 << k})",
                                 TILE_LEVEL - k)
        branches.append(f"""
            SELECT {k} AS level_up, {parent} AS tile_id,
                   CAST("LANDCOVER" AS BIGINT) AS lc
            FROM ({labels_sql})""")
    union = " UNION ALL ".join(branches)
    return f"""
        lp_f AS ({union}),
        lp_c AS (
            SELECT level_up, tile_id, lc, CAST(COUNT(*) AS BIGINT) AS n
            FROM lp_f GROUP BY 1, 2, 3
        )
        SELECT CAST(level_up AS BIGINT) AS level_up, tile_id,
               lc AS "LANDCOVER", n AS n_votes
        FROM lp_c QUALIFY row_number() OVER (
            PARTITION BY level_up, tile_id ORDER BY n DESC, lc ASC
        ) = 1"""


IJI_SCALE = float(1 << 30)  # entropy-term quantum (landscape_diversity's 2^30)


def _adjacency_counts(labels, lab_pd, include_same: bool):
    """Directed 4-neighbor class-pair counts over the label raster: the
    AOI-bounded (tile→class) table broadcasts once via ``ray.put`` (the
    morans_i precedent) and each batch resolves its neighbors' classes by
    searchsorted — NO shuffle; per-batch pair counts collapse to ≤m² rows
    before one tiny groupby.  ``include_same`` keeps the i = k diagonal
    (contag) or drops it (iji).  Returns a ≤m²-row pandas frame (i, k, n).
    """
    import ray


    from ..state.cells import TILE_LEVEL, decode, morton

    tids = lab_pd["tile_id"].to_numpy(np.int64)
    lcs = lab_pd["LANDCOVER"].to_numpy(np.int64)
    order = np.argsort(tids)
    side_ref = ray.put({"tids": tids[order], "lcs": lcs[order]})
    hi = (1 << TILE_LEVEL) - 1

    def pair_counts(t: pa.Table) -> pa.Table:
        side = ray.get(side_ref)
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        lc = t.column("LANDCOVER").to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = decode(tid, TILE_LEVEL)
        packed = []
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            tx, ty = ix + dx, iy + dy
            mk = (tx >= 0) & (tx <= hi) & (ty >= 0) & (ty <= hi)
            tgt = morton(tx[mk], ty[mk]).astype(np.int64)
            pos = np.searchsorted(side["tids"], tgt)
            hit = (pos < len(side["tids"])) & (
                side["tids"][np.minimum(pos, len(side["tids"]) - 1)] == tgt
            )
            klc = side["lcs"][np.minimum(pos, len(side["tids"]) - 1)][hit]
            ilc = lc[mk][hit]
            if include_same:
                packed.append(ilc * np.int64(256) + klc)
            else:
                cross = ilc != klc
                packed.append(ilc[cross] * np.int64(256) + klc[cross])
        keys, cnts = np.unique(np.concatenate(packed), return_counts=True)
        return pa.table(
            {
                "i": pa.array(keys >> np.int64(8), pa.int64()),
                "k": pa.array(keys & np.int64(255), pa.int64()),
                "n": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    from .zonal import bucketed_sum
    return bucketed_sum(
        labels.map_batches(pair_counts, batch_format="pyarrow"),
        ["i", "k"],
        ["n"],
        max_keys_hint=1 << 16,  # m² class pairs — tree reduce
    ).to_pandas()  # ≤ m² rows


def iji(primitives, year: int = 2022):
    """FRAGSTATS Interspersion–Juxtaposition Index per class: how evenly a
    class's patch edges are shared among the OTHER classes (100 = equally
    interspersed with every other class, →0 = adjacent to only one) — the
    cross-class companion of :func:`class_shape`'s same-class adjacency
    (reference analog: the per-class adjacency rollups next to the area
    report, src/misc/strata.py shape):

        IJI_i = 100 · [ −Σ_{k≠i} (e_ik/E_i)·ln(e_ik/E_i) ] / ln(m−1)

    with e_ik = 4-neighbor grid edges between classes i and k (each edge
    once per direction — symmetric, so the directed count IS e_ik), E_i
    their sum, m = classes present.  Distribution shape: the label table
    is AOI-bounded so (tile→class) broadcasts once via ``ray.put`` (the
    morans_i precedent) and each batch resolves its neighbors' classes by
    searchsorted — NO shuffle; per-batch pair counts collapse to ≤m² rows
    before the one tiny groupby.  Exactness: e/E exact ints; each entropy
    term floor-quantizes to ⌊−(r·ln r)·2³⁰⌋ (order-free integer sum);
    final IJI is ONE pinned double chain h_q/2³⁰/ln(m−1)·100.

    Output: (LANDCOVER:int64, e_total:int64, n_partners:int64, h_q:int64,
    iji:f64), one row per class present (m ≥ 3 required — with fewer
    classes the index is undefined and the result is empty).
    """
    import ray.data as rd

    empty = pa.table(
        {
            "LANDCOVER": pa.array([], pa.int64()),
            "e_total": pa.array([], pa.int64()),
            "n_partners": pa.array([], pa.int64()),
            "h_q": pa.array([], pa.int64()),
            "iji": pa.array([], pa.float64()),
        }
    )
    labels = (
        assemble_tile_labels(primitives)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
        .materialize()
    )
    lab_pd = labels.to_pandas()
    if len(lab_pd) == 0 or lab_pd["LANDCOVER"].nunique() < 3:
        return rd.from_arrow(empty)
    m = lab_pd["LANDCOVER"].nunique()
    e = _adjacency_counts(labels, lab_pd, include_same=False)
    if len(e) == 0:
        return rd.from_arrow(empty)
    i_arr = e["i"].to_numpy(np.int64)
    n_arr = e["n"].to_numpy(np.int64)
    classes = np.unique(i_arr)
    e_tot = np.zeros(len(classes), np.int64)
    n_part = np.zeros(len(classes), np.int64)
    h_q = np.zeros(len(classes), np.int64)
    pos = np.searchsorted(classes, i_arr)
    np.add.at(e_tot, pos, n_arr)
    np.add.at(n_part, pos, 1)
    import math

    r = n_arr.astype(np.float64) / e_tot[pos].astype(np.float64)
    # libm ln (frompyfunc) — numpy's SIMD log is ±1 ulp off libm, which
    # can flip a floor(x·2^24) boundary against the DuckDB oracle's ln()
    log_u = np.frompyfunc(math.log, 1, 1)
    terms = np.floor(-(r * log_u(r).astype(np.float64)) * IJI_SCALE).astype(
        np.int64
    )
    np.add.at(h_q, pos, terms)
    iji_val = (
        h_q.astype(np.float64) / IJI_SCALE / np.log(np.float64(m) - 1.0) * 100.0
    )
    return rd.from_arrow(
        pa.table(
            {
                "LANDCOVER": pa.array(classes, pa.int64()),
                "e_total": pa.array(e_tot, pa.int64()),
                "n_partners": pa.array(n_part, pa.int64()),
                "h_q": pa.array(h_q, pa.int64()),
                "iji": pa.array(iji_val, pa.float64()),
            }
        )
    )


COHESION_SCALE = float(1 << 16)  # p·√a term quantum (≤2^30/term → ~8e9 patches)
PAFRAC_SCALE = float(1 << 24)  # ln-moment quantum (≤2^30/term at 2^8-tile blocks)


def patch_metrics(primitives, year: int = 2022, block_levels: int = 4):
    """Per-PATCH area and perimeter over the block-bounded clump components
    (:func:`clump_sizes` semantics: 4-connected same-LANDCOVER tiles within
    a 2^block_levels-square Morton block; comp_id = min tile_id) — the
    patch table every FRAGSTATS patch-level metric derives from.

    Perimeter of a patch = Σ_tiles (4 − same-component 4-neighbor count):
    grid- AND block-boundary sides count as edge, consistent with the
    block-bounded component semantics (a same-class tile across the block
    line is a DIFFERENT patch, so that side is perimeter).

    Scale shape: identical to clump_sizes — blocks hash-bucket across
    tasks, each block's labeling + degree count touches ≤ (2^bl)² rows,
    and the output is one row per patch (never wider than the tile table).
    All columns exact int64.

    Output: (comp_id:int64, LANDCOVER:int64, a:int64, p:int64).
    """
    import pandas as pd

    import ray.data as rd

    from ..state.cells import TILE_LEVEL, decode, morton
    from .zonal import _add_bucket, _default_buckets

    labels = (
        assemble_tile_labels(primitives)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
        .materialize()
    )
    cols = ["comp_id", "LANDCOVER", "a", "p"]
    n_rows = labels.count()
    if n_rows == 0:
        return rd.from_arrow(pa.table({c: pa.array([], pa.int64()) for c in cols}))
    shift = np.int64(2 * block_levels)

    def add_blk(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        return t.append_column("blk", pa.array(tid >> shift))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("tile_id", kind="mergesort")
        tid = g["tile_id"].to_numpy(np.int64)
        lc = g["LANDCOVER"].to_numpy(np.int64)
        blk = tid >> shift
        brk = np.flatnonzero(np.concatenate(([True], blk[1:] != blk[:-1])))
        ends = np.concatenate((brk[1:], [len(tid)]))
        out = []
        for s, e in zip(brk, ends):
            ids = tid[s:e]
            labv = lc[s:e]
            ix, iy = decode(ids, TILE_LEVEL)
            ea_l, eb_l = [], []
            for dx, dy in ((1, 0), (0, 1)):
                nb = morton(ix + dx, iy + dy).astype(np.int64)
                pos = np.minimum(np.searchsorted(ids, nb), len(ids) - 1)
                hit = (ids[pos] == nb) & (labv[pos] == labv)
                ea_l.append(np.flatnonzero(hit))
                eb_l.append(pos[hit])
            ea = np.concatenate(ea_l)
            eb = np.concatenate(eb_l)
            comp = ids.copy()
            while True:
                new = comp.copy()
                if len(ea):
                    np.minimum.at(new, ea, comp[eb])
                    np.minimum.at(new, eb, comp[ea])
                if np.array_equal(new, comp):
                    break
                comp = new
            deg = np.bincount(
                np.concatenate([ea, eb]), minlength=len(ids)
            ).astype(np.int64)
            uniq, inv, cnt = np.unique(comp, return_inverse=True, return_counts=True)
            p = np.zeros(len(uniq), np.int64)
            np.add.at(p, inv, 4 - deg)
            lc_u = np.zeros(len(uniq), np.int64)
            lc_u[inv] = labv  # constant within a component
            out.append(
                pd.DataFrame(
                    {
                        "comp_id": uniq,
                        "LANDCOVER": lc_u,
                        "a": cnt.astype(np.int64),
                        "p": p,
                    }
                )
            )
        return pd.concat(out, ignore_index=True).astype(np.int64)

    return (
        _add_bucket(
            labels.map_batches(add_blk, batch_format="pyarrow"),
            ["blk"],
            _default_buckets(n_rows),
        )
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(cols)
    )


def cohesion(primitives, year: int = 2022, block_levels: int = 4):
    """FRAGSTATS patch-cohesion index per class — physical connectedness
    of a class's patches (→100 as the class clumps into fewer, more
    compact patches; →0 as it shatters into isolated tiles):

        COHESION_i = [1 − Σp_j / Σ(p_j·√a_j)] · [1 − 1/√A]⁻¹ · 100

    over class-i patches j (block-bounded, :func:`patch_metrics`), with
    A = total landscape tiles.  Exactness: Σp exact int; each p·√a term
    floor-quantizes to ⌊p·√a·2¹⁶⌋ (libm sqrt, order-free int sum); the
    final index is ONE pinned double chain.  Scale shape: per-batch
    per-class partials → one tiny grouped sum; only ≤|classes| rows ever
    reach the driver.

    Output: (LANDCOVER:int64, n_patches:int64, p_sum:int64, paq_sum:int64,
    cohesion:f64), classes sorted.
    """
    import ray.data as rd


    pm = patch_metrics(primitives, year=year, block_levels=block_levels)
    S = COHESION_SCALE

    def partial(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        p = t.column("p").to_numpy(zero_copy_only=False)
        q = np.floor(
            (p.astype(np.float64) * np.sqrt(a.astype(np.float64))) * S
        ).astype(np.int64)
        g = (
            pa.table(
                {
                    "LANDCOVER": t.column("LANDCOVER"),
                    "n_patches": pa.array(np.ones(len(a), np.int64)),
                    "p_sum": pa.array(p),
                    "paq_sum": pa.array(q),
                    "area": pa.array(a),
                }
            )
            .group_by(["LANDCOVER"])
            .aggregate(
                [("n_patches", "sum"), ("p_sum", "sum"), ("paq_sum", "sum"),
                 ("area", "sum")]
            )
        )
        return g.rename_columns(
            ["LANDCOVER", "n_patches", "p_sum", "paq_sum", "area"]
        )

    from .zonal import bucketed_sum
    agg = bucketed_sum(
        pm.map_batches(partial, batch_format="pyarrow"),
        ["LANDCOVER"],
        ["n_patches", "p_sum", "paq_sum", "area"],
        max_keys_hint=1 << 16,  # |classes| — tree reduce
    ).to_pandas()  # ≤ |classes| rows
    empty = pa.table(
        {
            "LANDCOVER": pa.array([], pa.int64()),
            "n_patches": pa.array([], pa.int64()),
            "p_sum": pa.array([], pa.int64()),
            "paq_sum": pa.array([], pa.int64()),
            "cohesion": pa.array([], pa.float64()),
        }
    )
    A = int(agg["area"].sum()) if len(agg) else 0
    if A < 2:
        return rd.from_arrow(empty)
    lc = agg["LANDCOVER"].to_numpy(np.int64)
    order = np.argsort(lc, kind="mergesort")
    lc = lc[order]
    n = agg["n_patches"].to_numpy(np.int64)[order]
    ps = agg["p_sum"].to_numpy(np.int64)[order]
    qs = agg["paq_sum"].to_numpy(np.int64)[order]
    coh = (
        (1.0 - ps.astype(np.float64) / (qs.astype(np.float64) / S))
        / (1.0 - 1.0 / np.sqrt(np.float64(A)))
        * 100.0
    )
    return rd.from_arrow(
        pa.table(
            {
                "LANDCOVER": pa.array(lc, pa.int64()),
                "n_patches": pa.array(n, pa.int64()),
                "p_sum": pa.array(ps, pa.int64()),
                "paq_sum": pa.array(qs, pa.int64()),
                "cohesion": pa.array(coh, pa.float64()),
            }
        )
    )


def pafrac(primitives, year: int = 2022, block_levels: int = 4):
    """FRAGSTATS perimeter-area fractal dimension per class — shape
    complexity across scales (PAFRAC = 2/b, b the OLS slope of ln p on
    ln a over the class's patches; ≈1 for simple compact shapes, →2 for
    highly convoluted ones).

    Exactness: per-patch ln-moments floor-quantize to
    ⌊ln(a)·2²⁴⌋ / ⌊ln(p)·2²⁴⌋ / ⌊(ln a·ln a)·2²⁴⌋ / ⌊(ln a·ln p)·2²⁴⌋
    int64 (libm ln — order-free sums); the slope and PAFRAC are ONE
    pinned double chain from the five integer sums.  Classes with fewer
    than 2 patches or zero quantized ln-area variance are omitted (the
    regression is undefined there).

    Output: (LANDCOVER:int64, n_patches:int64, x_sum:int64, y_sum:int64,
    xx_sum:int64, xy_sum:int64, pafrac:f64), classes sorted.
    """
    import ray.data as rd


    pm = patch_metrics(primitives, year=year, block_levels=block_levels)
    Q = PAFRAC_SCALE

    def partial(t: pa.Table) -> pa.Table:
        import math

        a = t.column("a").to_numpy(zero_copy_only=False).astype(np.float64)
        p = t.column("p").to_numpy(zero_copy_only=False).astype(np.float64)
        # libm ln (frompyfunc) as the docstring claims — numpy's SIMD log
        # is ±1 ulp off libm and can flip a floor(x·Q) boundary vs DuckDB
        log_u = np.frompyfunc(math.log, 1, 1)
        ln_a = log_u(a).astype(np.float64)
        ln_p = log_u(p).astype(np.float64)
        g = (
            pa.table(
                {
                    "LANDCOVER": t.column("LANDCOVER"),
                    "n_patches": pa.array(np.ones(len(a), np.int64)),
                    "x_sum": pa.array(np.floor(ln_a * Q).astype(np.int64)),
                    "y_sum": pa.array(np.floor(ln_p * Q).astype(np.int64)),
                    "xx_sum": pa.array(
                        np.floor((ln_a * ln_a) * Q).astype(np.int64)
                    ),
                    "xy_sum": pa.array(
                        np.floor((ln_a * ln_p) * Q).astype(np.int64)
                    ),
                }
            )
            .group_by(["LANDCOVER"])
            .aggregate(
                [("n_patches", "sum"), ("x_sum", "sum"), ("y_sum", "sum"),
                 ("xx_sum", "sum"), ("xy_sum", "sum")]
            )
        )
        return g.rename_columns(
            ["LANDCOVER", "n_patches", "x_sum", "y_sum", "xx_sum", "xy_sum"]
        )

    from .zonal import bucketed_sum
    agg = bucketed_sum(
        pm.map_batches(partial, batch_format="pyarrow"),
        ["LANDCOVER"],
        ["n_patches", "x_sum", "y_sum", "xx_sum", "xy_sum"],
        max_keys_hint=1 << 16,  # |classes| — tree reduce
    ).to_pandas()  # ≤ |classes| rows
    if len(agg) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "LANDCOVER": pa.array([], pa.int64()),
                    "n_patches": pa.array([], pa.int64()),
                    "x_sum": pa.array([], pa.int64()),
                    "y_sum": pa.array([], pa.int64()),
                    "xx_sum": pa.array([], pa.int64()),
                    "xy_sum": pa.array([], pa.int64()),
                    "pafrac": pa.array([], pa.float64()),
                }
            )
        )
    lc = agg["LANDCOVER"].to_numpy(np.int64)
    order = np.argsort(lc, kind="mergesort")
    agg = agg.iloc[order]
    n = agg["n_patches"].to_numpy(np.int64)
    nn = n.astype(np.float64)
    sx = agg["x_sum"].to_numpy(np.int64).astype(np.float64) / Q
    sy = agg["y_sum"].to_numpy(np.int64).astype(np.float64) / Q
    sxx = agg["xx_sum"].to_numpy(np.int64).astype(np.float64) / Q
    sxy = agg["xy_sum"].to_numpy(np.int64).astype(np.float64) / Q
    den = nn * sxx - sx * sx
    with np.errstate(divide="ignore", invalid="ignore"):
        paf = 2.0 / ((nn * sxy - sx * sy) / den)
    keep = (n >= 2) & (den > 0.0)
    return rd.from_arrow(
        pa.table(
            {
                "LANDCOVER": pa.array(
                    agg["LANDCOVER"].to_numpy(np.int64)[keep], pa.int64()
                ),
                "n_patches": pa.array(n[keep], pa.int64()),
                "x_sum": pa.array(agg["x_sum"].to_numpy(np.int64)[keep], pa.int64()),
                "y_sum": pa.array(agg["y_sum"].to_numpy(np.int64)[keep], pa.int64()),
                "xx_sum": pa.array(agg["xx_sum"].to_numpy(np.int64)[keep], pa.int64()),
                "xy_sum": pa.array(agg["xy_sum"].to_numpy(np.int64)[keep], pa.int64()),
                "pafrac": pa.array(paf[keep], pa.float64()),
            }
        )
    )


def contag(primitives, year: int = 2022):
    """FRAGSTATS landscape CONTAGION index — the single-number texture of
    the whole classified raster (→100 when one class dominates in large
    clumps, →0 when classes are maximally interspersed), the
    landscape-level companion of :func:`iji`:

        CONTAG = [1 + Σ_{i,k} r_ik·ln(r_ik) / (2·ln m)] · 100,
        r_ik = P_i · g_ik/G_i

    with P_i = class-i share of the landscape, g_ik = directed 4-neighbor
    adjacencies from class i to class k (diagonal INCLUDED — same-class
    adjacency is what contagion rewards), G_i their row sum, m = classes
    present (m ≥ 2 required, else empty).  Same broadcast-lookup fan as
    :func:`iji` (no shuffle); each r·ln r term floor-quantizes to
    ⌊r·ln(r)·2³⁰⌋ (terms are negative; the sum is order-free int); the
    index is ONE pinned (1 + (s_q/2³⁰)/(2·ln m))·100 chain.

    Output: ONE row (n_classes:int64, area:int64, g_total:int64,
    s_q:int64, contag:f64).
    """
    import ray.data as rd

    empty = pa.table(
        {
            "n_classes": pa.array([], pa.int64()),
            "area": pa.array([], pa.int64()),
            "g_total": pa.array([], pa.int64()),
            "s_q": pa.array([], pa.int64()),
            "contag": pa.array([], pa.float64()),
        }
    )
    labels = (
        assemble_tile_labels(primitives)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
        .materialize()
    )
    lab_pd = labels.to_pandas()
    if len(lab_pd) == 0 or lab_pd["LANDCOVER"].nunique() < 2:
        return rd.from_arrow(empty)
    m = lab_pd["LANDCOVER"].nunique()
    g = _adjacency_counts(labels, lab_pd, include_same=True)
    if len(g) == 0:
        return rd.from_arrow(empty)
    A = len(lab_pd)
    cls_u, a_u = np.unique(lab_pd["LANDCOVER"].to_numpy(np.int64), return_counts=True)
    i_arr = g["i"].to_numpy(np.int64)
    n_arr = g["n"].to_numpy(np.int64)
    gi = np.zeros(len(cls_u), np.int64)
    pos = np.searchsorted(cls_u, i_arr)
    np.add.at(gi, pos, n_arr)
    import math

    pi = a_u.astype(np.float64)[pos] / np.float64(A)
    r = pi * (n_arr.astype(np.float64) / gi.astype(np.float64)[pos])
    # libm ln — SIMD np.log is ±1 ulp off and can flip the floor boundary
    log_u = np.frompyfunc(math.log, 1, 1)
    s_q = int(
        np.floor((r * log_u(r).astype(np.float64)) * IJI_SCALE)
        .astype(np.int64)
        .sum()
    )
    contag_val = (
        1.0 + (np.float64(s_q) / IJI_SCALE) / (2.0 * np.log(np.float64(m)))
    ) * 100.0
    return rd.from_arrow(
        pa.table(
            {
                "n_classes": pa.array([np.int64(m)], pa.int64()),
                "area": pa.array([np.int64(A)], pa.int64()),
                "g_total": pa.array([np.int64(n_arr.sum())], pa.int64()),
                "s_q": pa.array([np.int64(s_q)], pa.int64()),
                "contag": pa.array([contag_val], pa.float64()),
            }
        )
    )


def mesh(primitives, year: int = 2022, block_levels: int = 4):
    """FRAGSTATS effective mesh size + landscape division index per class
    — the fragmentation pair used in connectivity planning (MESH = the
    expected patch size a random landscape point sits in, restricted to
    class i; DIVISION = probability two random points fall in different
    class-i patches):

        MESH_i = Σ_j a_ij² / A        DIVISION_i = 1 − Σ_j (a_ij/A)²

    over class-i patches j (block-bounded, :func:`patch_metrics`) with
    A = total landscape tiles.  Exactness: Σa² is EXACT int64 (patch
    area ≤ block² = 2^(2·bl) tiles, so a² ≤ 2³² per term — no quantum
    needed); MESH and DIVISION are each ONE pinned double expression.

    Output: (LANDCOVER:int64, n_patches:int64, a_sum:int64, a2_sum:int64,
    mesh:f64, division:f64), classes sorted.
    """
    import ray.data as rd


    pm = patch_metrics(primitives, year=year, block_levels=block_levels)

    def partial(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        g = (
            pa.table(
                {
                    "LANDCOVER": t.column("LANDCOVER"),
                    "n_patches": pa.array(np.ones(len(a), np.int64)),
                    "a_sum": pa.array(a),
                    "a2_sum": pa.array(a * a),
                }
            )
            .group_by(["LANDCOVER"])
            .aggregate([("n_patches", "sum"), ("a_sum", "sum"), ("a2_sum", "sum")])
        )
        return g.rename_columns(["LANDCOVER", "n_patches", "a_sum", "a2_sum"])

    from .zonal import bucketed_sum
    agg = bucketed_sum(
        pm.map_batches(partial, batch_format="pyarrow"),
        ["LANDCOVER"],
        ["n_patches", "a_sum", "a2_sum"],
        max_keys_hint=1 << 16,  # |classes| — tree reduce
    ).to_pandas()  # ≤ |classes| rows
    empty = pa.table(
        {
            "LANDCOVER": pa.array([], pa.int64()),
            "n_patches": pa.array([], pa.int64()),
            "a_sum": pa.array([], pa.int64()),
            "a2_sum": pa.array([], pa.int64()),
            "mesh": pa.array([], pa.float64()),
            "division": pa.array([], pa.float64()),
        }
    )
    if len(agg) == 0:
        return rd.from_arrow(empty)
    A = int(agg["a_sum"].sum())
    lc = agg["LANDCOVER"].to_numpy(np.int64)
    order = np.argsort(lc, kind="mergesort")
    lc = lc[order]
    n = agg["n_patches"].to_numpy(np.int64)[order]
    a_sum = agg["a_sum"].to_numpy(np.int64)[order]
    a2 = agg["a2_sum"].to_numpy(np.int64)[order]
    Af = np.float64(A)
    mesh_v = a2.astype(np.float64) / Af
    division = 1.0 - a2.astype(np.float64) / (Af * Af)
    return rd.from_arrow(
        pa.table(
            {
                "LANDCOVER": pa.array(lc, pa.int64()),
                "n_patches": pa.array(n, pa.int64()),
                "a_sum": pa.array(a_sum, pa.int64()),
                "a2_sum": pa.array(a2, pa.int64()),
                "mesh": pa.array(mesh_v, pa.float64()),
                "division": pa.array(division, pa.float64()),
            }
        )
    )


def std_ellipse(primitives, year: int = 2022):
    """Standard deviational ellipse per class — the centrographic summary
    (mean center, standard distance, orientation, semi-axes) GIS reports
    use to describe WHERE a class sits and how it spreads (the classic
    CrimeStat/ArcGIS "directional distribution" statistic), over the
    labeled tile grid in GRID coordinates (ix/iy at TILE_LEVEL — the
    affine to lon/lat is the caller's concern; integer coordinates keep
    every moment exact).

    Decomposable: per-batch per-class INTEGER moments (n, Σx, Σy, Σx²,
    Σy², Σxy — x, y ≤ 2¹⁴ so Σx² ≤ n·2²⁸ holds corpus-scale in int64) →
    one tiny grouped sum → driver-side pinned double chains:

        mx = Σx/n,  vx = Σx²/n − mx·mx  (same for y, xy)
        std_dist = √(vx+vy)
        theta    = 0.5·atan2(2·cxy, vx−vy)      (math.atan2 — libm, the
                                                 harmonic-phase precedent)
        r        = √(((vx−vy)/2)² + cxy·cxy)
        semi_major/minor = √(max(0, (vx+vy)/2 ± r))

    Output: (LANDCOVER:int64, n:int64, sx:int64, sy:int64, sxx:int64,
    syy:int64, sxy:int64, mean_x:f64, mean_y:f64, std_dist:f64,
    theta:f64, semi_major:f64, semi_minor:f64), classes sorted.
    """
    import math

    import ray.data as rd


    from ..state.cells import TILE_LEVEL, decode

    labels = assemble_tile_labels(primitives).filter(
        expr=f"year == {year}"
    ).select_columns(["tile_id", "LANDCOVER"])

    def partial(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        lc = t.column("LANDCOVER").to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = decode(tid, TILE_LEVEL)
        ix = ix.astype(np.int64)
        iy = iy.astype(np.int64)
        g = (
            pa.table(
                {
                    "LANDCOVER": pa.array(lc),
                    "n": pa.array(np.ones(len(lc), np.int64)),
                    "sx": pa.array(ix),
                    "sy": pa.array(iy),
                    "sxx": pa.array(ix * ix),
                    "syy": pa.array(iy * iy),
                    "sxy": pa.array(ix * iy),
                }
            )
            .group_by(["LANDCOVER"])
            .aggregate(
                [("n", "sum"), ("sx", "sum"), ("sy", "sum"), ("sxx", "sum"),
                 ("syy", "sum"), ("sxy", "sum")]
            )
        )
        return g.rename_columns(
            ["LANDCOVER", "n", "sx", "sy", "sxx", "syy", "sxy"]
        )

    from .zonal import bucketed_sum
    agg = bucketed_sum(
        labels.map_batches(partial, batch_format="pyarrow"),
        ["LANDCOVER"],
        ["n", "sx", "sy", "sxx", "syy", "sxy"],
        max_keys_hint=1 << 16,  # |classes| — tree reduce
    ).to_pandas()  # ≤ |classes| rows
    if len(agg) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    c: pa.array([], pa.float64() if c.startswith(("mean", "std", "theta", "semi")) else pa.int64())
                    for c in ("LANDCOVER", "n", "sx", "sy", "sxx", "syy",
                              "sxy", "mean_x", "mean_y", "std_dist", "theta",
                              "semi_major", "semi_minor")
                }
            )
        )
    agg = agg.sort_values("LANDCOVER", kind="mergesort").reset_index(drop=True)
    n = agg["n"].to_numpy(np.int64).astype(np.float64)
    sx = agg["sx"].to_numpy(np.int64).astype(np.float64)
    sy = agg["sy"].to_numpy(np.int64).astype(np.float64)
    sxx = agg["sxx"].to_numpy(np.int64).astype(np.float64)
    syy = agg["syy"].to_numpy(np.int64).astype(np.float64)
    sxy = agg["sxy"].to_numpy(np.int64).astype(np.float64)
    mx = sx / n
    my = sy / n
    vx = sxx / n - mx * mx
    vy = syy / n - my * my
    cxy = sxy / n - mx * my
    std_dist = np.sqrt(vx + vy)
    theta = np.array(
        [math.atan2(2.0 * c, dx) for c, dx in zip(cxy, vx - vy)], np.float64
    ) * 0.5
    r = np.sqrt(((vx - vy) / 2.0) * ((vx - vy) / 2.0) + cxy * cxy)
    semi_major = np.sqrt(np.maximum(0.0, (vx + vy) / 2.0 + r))
    semi_minor = np.sqrt(np.maximum(0.0, (vx + vy) / 2.0 - r))
    return rd.from_arrow(
        pa.table(
            {
                "LANDCOVER": pa.array(agg["LANDCOVER"].to_numpy(np.int64)),
                "n": pa.array(agg["n"].to_numpy(np.int64)),
                "sx": pa.array(agg["sx"].to_numpy(np.int64)),
                "sy": pa.array(agg["sy"].to_numpy(np.int64)),
                "sxx": pa.array(agg["sxx"].to_numpy(np.int64)),
                "syy": pa.array(agg["syy"].to_numpy(np.int64)),
                "sxy": pa.array(agg["sxy"].to_numpy(np.int64)),
                "mean_x": pa.array(mx, pa.float64()),
                "mean_y": pa.array(my, pa.float64()),
                "std_dist": pa.array(std_dist, pa.float64()),
                "theta": pa.array(theta, pa.float64()),
                "semi_major": pa.array(semi_major, pa.float64()),
                "semi_minor": pa.array(semi_minor, pa.float64()),
            }
        )
    )


def join_counts(primitives, year: int = 2022):
    """Join-count statistics per class — the CATEGORICAL spatial-
    autocorrelation test (Cliff & Ord; the Moran/Geary analog for a
    classified raster): treating class c as Black and everything else as
    White, count BB / BW joins over the undirected 4-neighbor edge set
    and compare BB to its expectation under nonfree sampling,

        E[BB_c] = m · n_c(n_c−1) / (n(n−1)),   ratio = BB_c / E[BB_c]

    (ratio > 1 = clumped, < 1 = dispersed).  Counts come straight from
    the shared :func:`_adjacency_counts` fan (no shuffle): directed
    same-class pairs halve to undirected BB (each edge appears once per
    direction); the directed cross fan-out from c IS BW.  All counts
    exact int64; E and the ratio are pinned double chains.

    Output: (LANDCOVER:int64, n_b:int64, bb:int64, bw:int64,
    exp_bb:f64, ratio:f64), classes sorted (the landscape scalars n, m
    live inside exp_bb — a per-row repeated column would read as
    degenerate).
    """
    import ray.data as rd

    empty = pa.table(
        {
            "LANDCOVER": pa.array([], pa.int64()),
            "n_b": pa.array([], pa.int64()),
            "bb": pa.array([], pa.int64()),
            "bw": pa.array([], pa.int64()),
            "exp_bb": pa.array([], pa.float64()),
            "ratio": pa.array([], pa.float64()),
        }
    )
    labels = (
        assemble_tile_labels(primitives)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
        .materialize()
    )
    lab_pd = labels.to_pandas()
    n = len(lab_pd)
    if n < 2:
        return rd.from_arrow(empty)
    g = _adjacency_counts(labels, lab_pd, include_same=True)
    if len(g) == 0:
        return rd.from_arrow(empty)
    cls_u, n_b = np.unique(lab_pd["LANDCOVER"].to_numpy(np.int64), return_counts=True)
    n_b = n_b.astype(np.int64)
    i_arr = g["i"].to_numpy(np.int64)
    k_arr = g["k"].to_numpy(np.int64)
    cnt = g["n"].to_numpy(np.int64)
    m = int(cnt.sum()) // 2  # undirected edge count
    pos = np.searchsorted(cls_u, i_arr)
    bb = np.zeros(len(cls_u), np.int64)
    bw = np.zeros(len(cls_u), np.int64)
    same = i_arr == k_arr
    np.add.at(bb, pos[same], cnt[same])
    bb //= 2  # halve AFTER summing: the directed same-class count is even
    np.add.at(bw, pos[~same], cnt[~same])
    nf = np.float64(n)
    exp_bb = (
        np.float64(m)
        * (n_b.astype(np.float64) * (n_b.astype(np.float64) - 1.0))
        / (nf * (nf - 1.0))
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = bb.astype(np.float64) / exp_bb
    return rd.from_arrow(
        pa.table(
            {
                "LANDCOVER": pa.array(cls_u, pa.int64()),
                "n_b": pa.array(n_b, pa.int64()),
                "bb": pa.array(bb, pa.int64()),
                "bw": pa.array(bw, pa.int64()),
                "exp_bb": pa.array(exp_bb, pa.float64()),
                "ratio": pa.array(ratio, pa.float64()),
            }
        )
    )


def label_stability(primitives):
    """Temporal label-stability map over ALL assemblage years — the
    change/consistency product a land-cover monitoring system ships next
    to its per-year maps (reference analog: the multi-year assemblage
    stack of src/utils/assemblage.py consumed by change reporting):
    per tile, how many distinct labels it ever took, the MODAL label
    (most years; ties to the smallest class), in how many years that
    modal label held, and a stable flag (one label across all years).

    PURE INTEGER, fully decomposable: the assemble reduce → per
    (tile, label) year counts (bucketed sum) → per-tile pack-max combine
    (score = n·256 + (256−label) picks most-years-then-smallest-class
    under ANY combine order) fused with the n_years / n_labels margins.

    Output: (tile_id:int64, n_years:int64, n_labels:int64,
    modal_label:int64, modal_years:int64, stable:int64).
    """
    import ray.data as rd

    from .zonal import bucketed_combine, bucketed_sum

    labels = assemble_tile_labels(primitives).select_columns(
        ["tile_id", "year", "LANDCOVER"]
    )

    def tl_partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    "tile_id": pa.array(
                        t.column("tile_id")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                    ),
                    "lc": pa.array(
                        t.column("LANDCOVER")
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                    ),
                }
            )
            .group_by(["tile_id", "lc"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["tile_id", "lc", "n"])

    tl = bucketed_sum(
        labels.map_batches(tl_partial, batch_format="pyarrow"),
        ["tile_id", "lc"],
        ["n"],
    )

    def tile_partial(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        lc = t.column("lc").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "tile_id": t.column("tile_id"),
                "score": pa.array(n * np.int64(256) + (np.int64(256) - lc)),
                "n_years": pa.array(n),
                "n_labels": pa.array(np.ones(len(n), np.int64)),
            }
        )

    per_tile = bucketed_combine(
        tl.map_batches(tile_partial, batch_format="pyarrow"),
        ["tile_id"],
        {"score": "max", "n_years": "sum", "n_labels": "sum"},
    )

    def finalize(t: pa.Table) -> pa.Table:
        score = t.column("score").to_numpy(zero_copy_only=False)
        nl = t.column("n_labels").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "tile_id": t.column("tile_id"),
                "n_years": t.column("n_years"),
                "n_labels": t.column("n_labels"),
                "modal_label": pa.array(
                    np.int64(256) - (score % np.int64(256)), pa.int64()
                ),
                "modal_years": pa.array(score // np.int64(256), pa.int64()),
                "stable": pa.array((nl == 1).astype(np.int64), pa.int64()),
            }
        )

    return per_tile.map_batches(finalize, batch_format="pyarrow")


def patch_gini(primitives, year: int = 2022, block_levels: int = 4):
    """Gini coefficient of PATCH SIZES per class — landscape dominance/
    inequality (0 = all patches equal, →1 = one giant patch among
    fragments), the distributional companion of LPI/MESH over the
    block-bounded patch table.

    Exact decomposition (token_gini's rank identity): Gini depends only
    on the sorted size multiset, which reduces over the
    frequency-of-frequencies histogram m_f (patch areas are block-capped
    ints, ≤ 2^(2·bl) distinct values per class):

        Σᵢ i·a₍ᵢ₎ = Σ_f f·(m_f·R_f + m_f(m_f+1)/2)   (all integers)

    with the identical pinned 2·num/(n·total) − (n+1)/n double chain.

    Output: (LANDCOVER:int64, n_patches:int64, area:int64, gini:f64),
    classes sorted.
    """
    import pandas as pd

    import ray.data as rd

    from .zonal import bucketed_sum

    pm = patch_metrics(primitives, year=year, block_levels=block_levels)

    def hist_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["LANDCOVER", "a"])
            .group_by(["LANDCOVER", "a"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["LANDCOVER", "f", "m"])

    hist = bucketed_sum(
        pm.map_batches(hist_partial, batch_format="pyarrow"),
        ["LANDCOVER", "f"],
        ["m"],
    ).to_pandas()  # ≤ |classes|·block² rows
    if len(hist) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "LANDCOVER": pa.array([], pa.int64()),
                    "n_patches": pa.array([], pa.int64()),
                    "area": pa.array([], pa.int64()),
                    "gini": pa.array([], pa.float64()),
                }
            )
        )
    hist = hist.sort_values(["LANDCOVER", "f"], kind="mergesort")
    out_lc, out_n, out_area, out_g = [], [], [], []
    for lc, g in hist.groupby("LANDCOVER", sort=True):
        fs = g["f"].to_numpy(np.int64)
        ms = g["m"].to_numpy(np.int64)
        r = 0
        num = 0
        for f, m in zip(fs.tolist(), ms.tolist()):
            num += f * (m * r + m * (m + 1) // 2)
            r += m
        n = int(ms.sum())
        tot = int((fs * ms).sum())
        gini = (2.0 * np.float64(num)) / (np.float64(n) * np.float64(tot)) - (
            np.float64(n) + 1.0
        ) / np.float64(n)
        out_lc.append(int(lc))
        out_n.append(n)
        out_area.append(tot)
        out_g.append(float(gini))
    return rd.from_arrow(
        pa.table(
            {
                "LANDCOVER": pa.array(out_lc, pa.int64()),
                "n_patches": pa.array(out_n, pa.int64()),
                "area": pa.array(out_area, pa.int64()),
                "gini": pa.array(out_g, pa.float64()),
            }
        )
    )


def isolation_index(primitives, year: int = 2022):
    """Massey–Denton isolation index P*_ii per class — the segregation
    statistic (the probability that a random same-neighborhood contact
    of a class-i tile is ALSO class i; > landscape share ⇒ spatially
    isolated/clumped, = share ⇒ evenly mixed), with the CELL_LEVEL
    parent cell as the neighborhood (each cell = a 4×4 tile block):

        P*_ii = Σ_c (n_ic/N_i)·(n_ic/T_c)

    Exactness: all counts exact ints; each product of the two exact
    rationals is ONE double chain quantized to ⌊·2⁴⁰⌋ so per-class sums
    are order-free; the reported index is q/2⁴⁰.  Scale shape: one
    bucketed (cell, class) reduce, ≤|classes| broadcast totals, whole
    cells per hash bucket, ≤|classes| partial rows per bucket.

    Output: (LANDCOVER:int64, n_total:int64, iso_q:int64,
    isolation:f64, share:f64), classes sorted (share = N_i/T for the
    evenness baseline).
    """
    import pandas as pd

    import ray.data as rd

    from ..state.cells import CELL_LEVEL, TILE_LEVEL
    from .zonal import _add_bucket, _default_buckets, bucketed_sum

    ISO_SCALE = float(1 << 40)
    shift = np.int64(2 * (TILE_LEVEL - CELL_LEVEL))
    labels = (
        assemble_tile_labels(primitives)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
    )

    def cc_partial(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        lc = t.column("LANDCOVER").to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pa.table(
                {
                    "cell": pa.array(tid >> shift, pa.int64()),
                    "lc": pa.array(lc),
                }
            )
            .group_by(["cell", "lc"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["cell", "lc", "n"])

    cc = bucketed_sum(
        labels.map_batches(cc_partial, batch_format="pyarrow"),
        ["cell", "lc"],
        ["n"],
    ).materialize()

    tp = cc.map_batches(
        lambda t: t.select(["lc", "n"])
        .group_by(["lc"])
        .aggregate([("n", "sum")])
        .rename_columns(["lc", "n"]),
        batch_format="pyarrow",
    ).to_pandas()
    empty_iso = pa.table(
        {
            "LANDCOVER": pa.array([], pa.int64()),
            "n_total": pa.array([], pa.int64()),
            "iso_q": pa.array([], pa.int64()),
            "isolation": pa.array([], pa.float64()),
            "share": pa.array([], pa.float64()),
        }
    )
    if len(tp) == 0:
        return rd.from_arrow(empty_iso)
    tot = tp.groupby("lc", as_index=False)["n"].sum()
    cls = tot["lc"].to_numpy(np.int64)
    order = np.argsort(cls, kind="mergesort")
    cls, ntot = cls[order], tot["n"].to_numpy(np.int64)[order]
    T = int(ntot.sum())
    n_of = dict(zip(cls.tolist(), ntot.tolist()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cell = g["cell"].to_numpy(np.int64)
        lc = g["lc"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        o = np.argsort(cell, kind="mergesort")
        cell, lc, n = cell[o], lc[o], n[o]
        starts = np.flatnonzero(np.concatenate(([True], cell[1:] != cell[:-1])))
        lens = np.diff(np.concatenate((starts, [len(cell)])))
        tc = np.repeat(np.add.reduceat(n, starts), lens)
        Ni = np.array([n_of[int(c)] for c in lc], np.int64)
        term = (n.astype(np.float64) / Ni.astype(np.float64)) * (
            n.astype(np.float64) / tc.astype(np.float64)
        )
        q = np.floor(term * ISO_SCALE).astype(np.int64)
        return (
            pd.DataFrame({"lc": lc, "iso_q": q})
            .groupby("lc", as_index=False)["iso_q"]
            .sum()
        )

    agg = (
        _add_bucket(cc, ["cell"], _default_buckets())
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(["lc", "iso_q"])
        .to_pandas()
        .groupby("lc", as_index=False)["iso_q"]
        .sum()
        .sort_values("lc", kind="mergesort")
        .reset_index(drop=True)
    )
    iso_q = agg["iso_q"].to_numpy(np.int64)
    iso = iso_q.astype(np.float64) / ISO_SCALE
    share = ntot.astype(np.float64) / np.float64(T)
    return rd.from_arrow(
        pa.table(
            {
                "LANDCOVER": pa.array(cls, pa.int64()),
                "n_total": pa.array(ntot, pa.int64()),
                "iso_q": pa.array(iso_q, pa.int64()),
                "isolation": pa.array(iso, pa.float64()),
                "share": pa.array(share, pa.float64()),
            }
        )
    )


def dissimilarity_index(primitives, year: int = 2022):
    """Duncan's dissimilarity index D for every class pair — the other
    half of the segregation report next to :func:`isolation_index`
    (the share of either class that would have to move cells to make
    the two distributions identical; 0 = same spatial pattern, 1 =
    complete separation):

        D_ij = ½ Σ_c |n_ic/N_i − n_jc/N_j|

    over CELL_LEVEL parent-cell neighborhoods.  Exactness: each |·|
    term is one double chain of two exact-rational divisions, quantized
    to ⌊·2⁴⁰⌋ so sums are order-free; D is ONE pinned (q/2⁴⁰)·0.5
    chain.  Scale shape: whole cells per hash bucket; each bucket folds
    to a single m×m integer matrix before the tiny grouped sum.

    Output: (class_a:int64, class_b:int64, d_q:int64, dissimilarity:f64),
    pairs a<b sorted.
    """
    import pandas as pd

    import ray.data as rd

    from ..state.cells import CELL_LEVEL, TILE_LEVEL
    from .zonal import _add_bucket, _default_buckets, bucketed_sum

    S = float(1 << 40)
    shift = np.int64(2 * (TILE_LEVEL - CELL_LEVEL))
    labels = (
        assemble_tile_labels(primitives)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
    )

    def cc_partial(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        lc = t.column("LANDCOVER").to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pa.table(
                {"cell": pa.array(tid >> shift, pa.int64()), "lc": pa.array(lc)}
            )
            .group_by(["cell", "lc"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["cell", "lc", "n"])

    cc = bucketed_sum(
        labels.map_batches(cc_partial, batch_format="pyarrow"),
        ["cell", "lc"],
        ["n"],
    ).materialize()

    tp = cc.map_batches(
        lambda t: t.select(["lc", "n"])
        .group_by(["lc"])
        .aggregate([("n", "sum")])
        .rename_columns(["lc", "n"]),
        batch_format="pyarrow",
    ).to_pandas()
    if len(tp) == 0:
        tot = tp
        cls = np.empty(0, np.int64)
        N = np.empty(0, np.float64)
    else:
        tot = tp.groupby("lc", as_index=False)["n"].sum().sort_values(
            "lc", kind="mergesort"
        )
        cls = tot["lc"].to_numpy(np.int64)
        N = tot["n"].to_numpy(np.int64).astype(np.float64)
    m = len(cls)
    empty = pa.table(
        {
            "class_a": pa.array([], pa.int64()),
            "class_b": pa.array([], pa.int64()),
            "d_q": pa.array([], pa.int64()),
            "dissimilarity": pa.array([], pa.float64()),
        }
    )
    if m < 2:
        return rd.from_arrow(empty)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cell = g["cell"].to_numpy(np.int64)
        lc = g["lc"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        ucell, cidx = np.unique(cell, return_inverse=True)
        kidx = np.searchsorted(cls, lc)
        M = np.zeros((len(ucell), m), np.float64)
        M[cidx, kidx] = n.astype(np.float64)
        share = M / N[None, :]
        diff = np.abs(share[:, :, None] - share[:, None, :])
        q = np.floor(diff * S).astype(np.int64).sum(axis=0)  # (m, m)
        ia, ib = np.triu_indices(m, k=1)
        return pd.DataFrame(
            {
                "class_a": cls[ia],
                "class_b": cls[ib],
                "d_q": q[ia, ib],
            }
        )

    agg = (
        _add_bucket(cc, ["cell"], _default_buckets())
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(["class_a", "class_b", "d_q"])
        .to_pandas()
        .groupby(["class_a", "class_b"], as_index=False)["d_q"]
        .sum()
        .sort_values(["class_a", "class_b"], kind="mergesort")
        .reset_index(drop=True)
    )
    dq = agg["d_q"].to_numpy(np.int64)
    d = dq.astype(np.float64) / S * 0.5
    return rd.from_arrow(
        pa.table(
            {
                "class_a": pa.array(agg["class_a"].to_numpy(np.int64)),
                "class_b": pa.array(agg["class_b"].to_numpy(np.int64)),
                "d_q": pa.array(dq, pa.int64()),
                "dissimilarity": pa.array(d, pa.float64()),
            }
        )
    )


def theil_h(primitives, year: int = 2022):
    """Theil's multigroup entropy segregation index H — the third member
    of the segregation report next to :func:`isolation_index` and
    :func:`dissimilarity_index` (0 = every cell mirrors the landscape
    composition, 1 = cells are single-class):

        H = Σ_c T_c·(E − E_c) / (T·E)

    with E the landscape-level and E_c the cell-level Shannon entropy of
    class shares over CELL_LEVEL parent cells.  Exactness: every entropy
    term floor-quantizes to ⌊−(p·ln p)·2³⁰⌋ (libm ln, order-free integer
    sums); each cell's contribution re-quantizes once more so the global
    sum is order-free; H is ONE pinned chain of the three integers.

    Output: ONE row (n_cells:int64, area:int64, e_q:int64, num_q:int64,
    theil_h:f64).
    """
    import math

    import pandas as pd

    import ray.data as rd

    from ..state.cells import CELL_LEVEL, TILE_LEVEL
    from .zonal import _add_bucket, _default_buckets, bucketed_sum

    S = float(1 << 30)
    shift = np.int64(2 * (TILE_LEVEL - CELL_LEVEL))
    labels = (
        assemble_tile_labels(primitives)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
    )

    def cc_partial(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        lc = t.column("LANDCOVER").to_numpy(zero_copy_only=False).astype(np.int64)
        g = (
            pa.table(
                {"cell": pa.array(tid >> shift, pa.int64()), "lc": pa.array(lc)}
            )
            .group_by(["cell", "lc"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["cell", "lc", "n"])

    cc = bucketed_sum(
        labels.map_batches(cc_partial, batch_format="pyarrow"),
        ["cell", "lc"],
        ["n"],
    ).materialize()
    tp = cc.map_batches(
        lambda t: t.select(["lc", "n"])
        .group_by(["lc"])
        .aggregate([("n", "sum")])
        .rename_columns(["lc", "n"]),
        batch_format="pyarrow",
    ).to_pandas()
    tot = (
        tp.groupby("lc", as_index=False)["n"].sum() if len(tp) else tp
    )
    empty = pa.table(
        {
            "n_cells": pa.array([], pa.int64()),
            "area": pa.array([], pa.int64()),
            "e_q": pa.array([], pa.int64()),
            "num_q": pa.array([], pa.int64()),
            "theil_h": pa.array([], pa.float64()),
        }
    )
    if len(tot) == 0:
        return rd.from_arrow(empty)
    ni = tot["n"].to_numpy(np.int64)
    T = int(ni.sum())
    e_q = sum(
        int(math.floor(-((int(v) / float(T)) * math.log(int(v) / float(T))) * S))
        for v in ni
    )
    if e_q <= 0:
        return rd.from_arrow(empty)  # single-class landscape: H undefined
    Ef = float(e_q)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cell = g["cell"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        o = np.argsort(cell, kind="mergesort")
        cell, n = cell[o], n[o]
        starts = np.flatnonzero(np.concatenate(([True], cell[1:] != cell[:-1])))
        lens = np.diff(np.concatenate((starts, [len(cell)])))
        tc = np.repeat(np.add.reduceat(n, starts), lens)
        p = n.astype(np.float64) / tc.astype(np.float64)
        log_u = np.frompyfunc(math.log, 1, 1)
        terms = np.floor(-(p * log_u(p).astype(np.float64)) * S).astype(np.int64)
        ec_q = np.add.reduceat(terms, starts)
        tcs = np.add.reduceat(n, starts).astype(np.float64)
        contrib = np.floor(
            (tcs * (Ef / S - ec_q.astype(np.float64) / S)) * S
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "num_q": [int(contrib.sum())],
                "n_cells": [int(len(starts))],
            }
        )

    agg = (
        _add_bucket(cc, ["cell"], _default_buckets())
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .select_columns(["num_q", "n_cells"])
        .to_pandas()
    )
    num_q = int(agg["num_q"].sum())
    n_cells = int(agg["n_cells"].sum())
    h = (float(num_q) / S) / (float(T) * (float(e_q) / S))
    return rd.from_arrow(
        pa.table(
            {
                "n_cells": pa.array([np.int64(n_cells)]),
                "area": pa.array([np.int64(T)]),
                "e_q": pa.array([np.int64(e_q)]),
                "num_q": pa.array([np.int64(num_q)]),
                "theil_h": pa.array([h], pa.float64()),
            }
        )
    )


def class_aspect(primitives, year: int = 2022):
    """Aspect-octant distribution per class — which compass direction
    each land-cover class faces (the terrain-ecology cross every
    mountain land-cover report includes: south-facing grassland,
    north-facing forest):  per labeled tile, the analytic-DEM aspect at
    the tile center (the hillshade central-difference convention) folds
    to one of 8 octants (0 = N-ish [0°,45°), …), counted per
    (class, octant) with a pinned share.

    Exactness: gradients and aspect come from the closed-form elevation
    (bit-identical both sides); atan2 runs through libm; the octant is
    an integer floor of the same normalized double; counts exact.

    Output: (LANDCOVER:int64, octant:int64, n:int64, share:f64),
    sorted; share = n / class total.
    """
    import math

    import ray.data as rd

    from ..state import cells, dem
    from ..state.cells import TILE_LEVEL
    from .sar import DEG
    from .zonal import bucketed_sum

    n_grid = float(np.int64(1) << TILE_LEVEL)
    labels = (
        assemble_tile_labels(primitives)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
    )

    def partial(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        lc = t.column("LANDCOVER").to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = cells.decode(tid, TILE_LEVEL)
        ixf = ix.astype(np.float64)
        iyf = iy.astype(np.float64)

        def z(dx, dy):
            lon = (ixf + dx + 0.5) / n_grid * 360.0 - 180.0
            lat = (iyf + dy + 0.5) / n_grid * 180.0 - 90.0
            return dem.elev(lon, lat)

        gx = (z(1.0, 0.0) - z(-1.0, 0.0)) / 2.0
        gy = (z(0.0, 1.0) - z(0.0, -1.0)) / 2.0
        atan2_u = np.frompyfunc(math.atan2, 2, 1)
        aspect = atan2_u(gx, gy).astype(np.float64) * DEG
        a360 = np.where(aspect < 0.0, aspect + 360.0, aspect)
        octant = np.floor(a360 / 45.0).astype(np.int64)
        g = (
            pa.table(
                {
                    "LANDCOVER": pa.array(lc),
                    "octant": pa.array(octant),
                }
            )
            .group_by(["LANDCOVER", "octant"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["LANDCOVER", "octant", "n"])

    cnt = (
        bucketed_sum(
            labels.map_batches(partial, batch_format="pyarrow"),
            ["LANDCOVER", "octant"],
            ["n"],
        )
        .to_pandas()  # ≤ |classes|·8 rows
        .reset_index(drop=True)
    )
    if len(cnt) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "LANDCOVER": pa.array([], pa.int64()),
                    "octant": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "share": pa.array([], pa.float64()),
                }
            )
        )
    cnt = cnt.sort_values(["LANDCOVER", "octant"], kind="mergesort").reset_index(
        drop=True
    )
    tot = cnt.groupby("LANDCOVER")["n"].transform("sum").to_numpy(np.int64)
    n = cnt["n"].to_numpy(np.int64)
    share = n.astype(np.float64) / tot.astype(np.float64)
    return rd.from_arrow(
        pa.table(
            {
                "LANDCOVER": pa.array(cnt["LANDCOVER"].to_numpy(np.int64)),
                "octant": pa.array(cnt["octant"].to_numpy(np.int64)),
                "n": pa.array(n, pa.int64()),
                "share": pa.array(share, pa.float64()),
            }
        )
    )


def hypsometric(primitives, year: int = 2022, band_m: float = 100.0):
    """Hypsometric (area–elevation) table over the labeled footprint —
    the terrain-analysis staple (what fraction of the landscape lies
    below each elevation belt): tiles bin into the same analytic-DEM
    zones as :func:`core_area` (⌊elev/band⌋), with exact areas and the
    cumulative share climbing the belts.

    Exact ints + one pinned division per row.

    Output: (zone:int64, area:int64, cum_area:int64, cum_share:f64),
    zones ascending.
    """
    import ray.data as rd

    from ..state import cells, dem
    from ..state.cells import TILE_LEVEL
    from .joins import distinct
    from .zonal import bucketed_sum

    fp = distinct(
        primitives.filter(expr=f"year == {year}").select_columns(["tile_id"]),
        ["tile_id"],
    )

    def partial(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        lon, lat = cells.cell_center(tid, TILE_LEVEL)
        z = np.floor(dem.elev(lon, lat) / band_m).astype(np.int64)
        g = (
            pa.table({"zone": pa.array(z, pa.int64())})
            .group_by(["zone"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["zone", "area"])

    zones = bucketed_sum(
        fp.map_batches(partial, batch_format="pyarrow"),
        ["zone"],
        ["area"],
    ).to_pandas()  # ≤ |zones| rows
    if len(zones):
        zones = zones.sort_values("zone", kind="mergesort").reset_index(drop=True)
    empty = pa.table(
        {
            "zone": pa.array([], pa.int64()),
            "area": pa.array([], pa.int64()),
            "cum_area": pa.array([], pa.int64()),
            "cum_share": pa.array([], pa.float64()),
        }
    )
    if len(zones) == 0:
        return rd.from_arrow(empty)
    area = zones["area"].to_numpy(np.int64)
    cum = np.cumsum(area)
    total = int(cum[-1])
    share = cum.astype(np.float64) / np.float64(total)
    return rd.from_arrow(
        pa.table(
            {
                "zone": pa.array(zones["zone"].to_numpy(np.int64)),
                "area": pa.array(area, pa.int64()),
                "cum_area": pa.array(cum, pa.int64()),
                "cum_share": pa.array(share, pa.float64()),
            }
        )
    )


def class_elevation(primitives, year: int = 2022, band_m: float = 100.0):
    """Elevation-niche profile per class — which elevation belts each
    land-cover class occupies (the class × zone contingency every
    mountain land-cover report pairs with the aspect cross): labeled
    tiles bin into the :func:`core_area` analytic-DEM zones, counted per
    (class, zone) with the share of the class's area in that belt.

    Exact ints + one pinned division per row.

    Output: (LANDCOVER:int64, zone:int64, n:int64, share:f64), sorted.
    """
    import ray.data as rd

    from ..state import cells, dem
    from ..state.cells import TILE_LEVEL
    from .zonal import bucketed_sum

    labels = (
        assemble_tile_labels(primitives)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
    )

    def partial(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        lc = t.column("LANDCOVER").to_numpy(zero_copy_only=False).astype(np.int64)
        lon, lat = cells.cell_center(tid, TILE_LEVEL)
        z = np.floor(dem.elev(lon, lat) / band_m).astype(np.int64)
        g = (
            pa.table(
                {"LANDCOVER": pa.array(lc), "zone": pa.array(z, pa.int64())}
            )
            .group_by(["LANDCOVER", "zone"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["LANDCOVER", "zone", "n"])

    cnt = (
        bucketed_sum(
            labels.map_batches(partial, batch_format="pyarrow"),
            ["LANDCOVER", "zone"],
            ["n"],
        )
        .to_pandas()  # ≤ |classes|·|zones| rows
        .reset_index(drop=True)
    )
    if len(cnt) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "LANDCOVER": pa.array([], pa.int64()),
                    "zone": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "share": pa.array([], pa.float64()),
                }
            )
        )
    cnt = cnt.sort_values(["LANDCOVER", "zone"], kind="mergesort").reset_index(
        drop=True
    )
    tot = cnt.groupby("LANDCOVER")["n"].transform("sum").to_numpy(np.int64)
    n = cnt["n"].to_numpy(np.int64)
    share = n.astype(np.float64) / tot.astype(np.float64)
    return rd.from_arrow(
        pa.table(
            {
                "LANDCOVER": pa.array(cnt["LANDCOVER"].to_numpy(np.int64)),
                "zone": pa.array(cnt["zone"].to_numpy(np.int64)),
                "n": pa.array(n, pa.int64()),
                "share": pa.array(share, pa.float64()),
            }
        )
    )


def class_slope(primitives, year: int = 2022, band_deg: float = 5.0):
    """Slope-band distribution per class — the third terrain cross next
    to :func:`class_elevation` and :func:`class_aspect` (steepland vs
    flatland composition per land-cover class): per labeled tile the
    analytic-DEM Horn slope at the tile center
    (atan(√(gx²+gy²)/SLOPE_SCALE)·180/π — the hillshade chain), binned
    into ``band_deg``-degree bands.

    Exactness: gradients/slope from the closed-form elevation (libm
    atan); the band is an integer floor of the same double; counts
    exact; shares pinned.

    Output: (LANDCOVER:int64, band:int64, n:int64, share:f64), sorted.
    """
    import math

    import ray.data as rd

    from ..state import cells, dem
    from ..state.cells import TILE_LEVEL
    from .sar import DEG
    from .terrain import SLOPE_SCALE
    from .zonal import bucketed_sum

    n_grid = float(np.int64(1) << TILE_LEVEL)
    labels = (
        assemble_tile_labels(primitives)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
    )

    def partial(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        lc = t.column("LANDCOVER").to_numpy(zero_copy_only=False).astype(np.int64)
        ix, iy = cells.decode(tid, TILE_LEVEL)
        ixf = ix.astype(np.float64)
        iyf = iy.astype(np.float64)

        def z(dx, dy):
            lon = (ixf + dx + 0.5) / n_grid * 360.0 - 180.0
            lat = (iyf + dy + 0.5) / n_grid * 180.0 - 90.0
            return dem.elev(lon, lat)

        gx = (z(1.0, 0.0) - z(-1.0, 0.0)) / 2.0
        gy = (z(0.0, 1.0) - z(0.0, -1.0)) / 2.0
        atan_u = np.frompyfunc(math.atan, 1, 1)
        slope = (
            atan_u(np.sqrt(gx * gx + gy * gy) / SLOPE_SCALE).astype(np.float64)
            * DEG
        )
        band = np.floor(slope / band_deg).astype(np.int64)
        g = (
            pa.table({"LANDCOVER": pa.array(lc), "band": pa.array(band)})
            .group_by(["LANDCOVER", "band"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["LANDCOVER", "band", "n"])

    cnt = (
        bucketed_sum(
            labels.map_batches(partial, batch_format="pyarrow"),
            ["LANDCOVER", "band"],
            ["n"],
        )
        .to_pandas()
        .reset_index(drop=True)
    )
    if len(cnt) == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "LANDCOVER": pa.array([], pa.int64()),
                    "band": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "share": pa.array([], pa.float64()),
                }
            )
        )
    cnt = cnt.sort_values(["LANDCOVER", "band"], kind="mergesort").reset_index(
        drop=True
    )
    tot = cnt.groupby("LANDCOVER")["n"].transform("sum").to_numpy(np.int64)
    n = cnt["n"].to_numpy(np.int64)
    share = n.astype(np.float64) / tot.astype(np.float64)
    return rd.from_arrow(
        pa.table(
            {
                "LANDCOVER": pa.array(cnt["LANDCOVER"].to_numpy(np.int64)),
                "band": pa.array(cnt["band"].to_numpy(np.int64)),
                "n": pa.array(n, pa.int64()),
                "share": pa.array(share, pa.float64()),
            }
        )
    )
