"""Point-in-polygon spatial join (SURVEY.md J3/T3/M21).

Reference analog: ``paint(ref_polys, label)`` + ``updateMask`` /
``filterBounds(aoi)`` (src/utils/s2process.py:172,177,18) — there a
server-side rasterize; here a real vectorized ray-casting join: an STR-packed
R-tree over polygon bboxes prefilters candidates, then one vectorized even-odd
crossing test per candidate polygon over the batch's point arrays.

The polygon side is small (hundreds–thousands of polygons) so it is a
broadcast side: each actor in the pool builds the ``PolygonIndex`` ONCE in
``__init__`` from an object-store handle (``ray.put`` once on the driver) and
every batch streams through it — no shuffle, which is the correct plan at
10^12-document scale.  Inner / semi / anti variants cover the reference's
keep-inside and mask-out uses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..state.geom import PolygonIndex


def load_polygon_index(polygons_path: str, kinds: list[str] | None = None) -> PolygonIndex:
    import pyarrow.parquet as pq

    tbl = pq.read_table(polygons_path)
    if kinds is not None:
        import pyarrow.compute as pc

        tbl = tbl.filter(pc.is_in(tbl.column("kind"), pa.array(kinds)))
    return PolygonIndex.from_arrow(tbl)


class PIPJoiner:
    """Actor-pool callable: geo_obs batch → (point, polygon) join rows.

    mode='inner'  → one output row per containment pair
                    (doc_id, span_idx, poly_id, kind, LANDCOVER)
    mode='semi'   → input rows with ≥1 match (columns preserved)
    mode='anti'   → input rows with no match (the updateMask complement)
    mode='label'  → input rows + (poly_id, LANDCOVER) of the first matching
                    polygon in poly_id order (deterministic label attach)
    """

    def __init__(self, index_ref, mode: str = "inner"):
        self.index: PolygonIndex = (
            ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref
        )
        assert mode in ("inner", "semi", "anti", "label")
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        px = batch.column("lon").to_numpy(zero_copy_only=False)
        py = batch.column("lat").to_numpy(zero_copy_only=False)
        pt, pl = self.index.join_points(px, py)
        if self.mode == "inner":
            out = {
                "doc_id": batch.column("doc_id").take(pa.array(pt)),
                "span_idx": batch.column("span_idx").take(pa.array(pt)),
                "poly_id": pa.array(self.index.poly_ids[pl].astype(object), type=pa.string()),
                "kind": pa.array(self.index.kinds[pl].astype(object), type=pa.string()),
                "LANDCOVER": pa.array(self.index.landcover[pl], type=pa.int32()),
            }
            return pa.table(out)
        matched = np.zeros(len(batch), dtype=bool)
        matched[pt] = True
        if self.mode == "semi":
            return batch.filter(pa.array(matched))
        if self.mode == "anti":
            return batch.filter(pa.array(~matched))
        # label: first matching polygon in (point, poly_id) order — pairs come
        # back sorted, so the first pair per point is the min poly_id.
        first = np.zeros(len(batch), dtype=np.int64)
        seen = np.zeros(len(batch), dtype=bool)
        if pt.shape[0]:
            uniq_pt, first_pos = np.unique(pt, return_index=True)
            seen[uniq_pt] = True
            first[uniq_pt] = pl[first_pos]
        poly_id = np.where(seen, self.index.poly_ids[first], "").astype(object)
        lc = np.where(seen, self.index.landcover[first], 0).astype(np.int32)
        return batch.append_column(
            "poly_id", pa.array(poly_id, type=pa.string())
        ).append_column("LANDCOVER", pa.array(lc, type=pa.int32()))


# worker-process-local index cache (flagship-labeler pattern): stateless
# tasks fuse with the upstream read→parse and scale to every CPU; each
# worker pays the ray.get once
_INDEX_CACHE: dict = {}


def _cached_index(index_ref):
    key = index_ref.hex()
    idx = _INDEX_CACHE.get(key)
    if idx is None:
        _INDEX_CACHE.clear()
        idx = _INDEX_CACHE.setdefault(key, ray.get(index_ref))
    return idx


def pip_join(
    geo,
    polygons_path: str,
    kinds: list[str] | None = None,
    mode: str = "inner",
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
):
    """geo_obs Dataset → PIP join Dataset.

    The index is built once on the driver and broadcast through the object
    store.  Default execution is STATELESS map_batches tasks with a
    worker-local index cache (fuses with the upstream read, uses every
    CPU — measured ~2× over a 40%-pool); pass ``concurrency`` to force an
    explicit actor pool instead.
    """
    index_ref = ray.put(load_polygon_index(polygons_path, kinds))
    if concurrency is not None:
        return geo.map_batches(
            PIPJoiner,
            fn_constructor_kwargs={"index_ref": index_ref, "mode": mode},
            batch_format="pyarrow",
            batch_size=batch_size or 16384,
            concurrency=concurrency,
            num_cpus=1,
        )

    def fn(batch: pa.Table) -> pa.Table:
        worker = PIPJoiner.__new__(PIPJoiner)
        worker.index = _cached_index(index_ref)
        worker.mode = mode
        return worker(batch)

    return geo.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def _flatten_bbox(t: pa.Table, id_col: str):
    """(ids, minx, miny, maxx, maxy) numpy views of a bbox-struct table."""
    import pyarrow.compute as pc

    ids = t.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    bb = t.column("bbox")
    out = []
    for f in ("minx", "miny", "maxx", "maxy"):
        c = pc.struct_field(bb, f)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        out.append(c.to_numpy(zero_copy_only=False).astype(np.float64))
    return ids, out[0], out[1], out[2], out[3]


def _bbox_cover(t: pa.Table, id_col: str, side: int, cell_deg: float) -> pa.Table:
    """Replicate each rectangle onto every grid cell its bbox covers at
    ``cell_deg`` resolution (the PBSM partition stage).  Fully vectorized:
    per-rect cover counts → one np.repeat + local-index arithmetic."""
    ids, minx, miny, maxx, maxy = _flatten_bbox(t, id_col)
    ix0 = np.floor(minx / cell_deg).astype(np.int64)
    ix1 = np.floor(maxx / cell_deg).astype(np.int64)
    iy0 = np.floor(miny / cell_deg).astype(np.int64)
    iy1 = np.floor(maxy / cell_deg).astype(np.int64)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    reps = nx * ny
    total = int(reps.sum())
    rect = np.repeat(np.arange(len(t), dtype=np.int64), reps)
    first = np.zeros(len(t), dtype=np.int64)
    if len(t) > 1:
        np.cumsum(reps[:-1], out=first[1:])
    loc = np.arange(total, dtype=np.int64) - first[rect]
    cx = ix0[rect] + loc % nx[rect]
    cy = iy0[rect] + loc // nx[rect]
    # one shuffle key: grid coords are bounded by 360/cell_deg, so a
    # 2^21-offset pack never collides
    ckey = (cx + (1 << 20)) * (1 << 21) + (cy + (1 << 20))
    return pa.table(
        {
            "ckey": pa.array(ckey),
            "cx": pa.array(cx),
            "cy": pa.array(cy),
            "side": pa.array(np.full(total, side, dtype=np.int64)),
            "rid": ids.take(pa.array(rect)),
            "minx": pa.array(minx[rect]),
            "miny": pa.array(miny[rect]),
            "maxx": pa.array(maxx[rect]),
            "maxy": pa.array(maxy[rect]),
        }
    )


def bbox_join(a_ds, b_ds, cell_deg: float = 4.0, a_id: str = "poly_id", b_id: str = "poly_id"):
    """Rectangle-overlap spatial range join (PBSM — partition-based spatial
    merge): emit (a_id, b_id, overlap area) for every pair of bboxes that
    intersect (closed intervals: touching edges count).

    Reference analog: ``filterBounds`` / footprint-overlap pre-tests
    (/root/reference/src/utils/s2process.py:18, sentinel1.py:41-44) done
    between two VECTOR sets rather than collection-vs-geometry.

    Scale shape: each side's rectangles are replicated onto the grid cells
    they cover at ``cell_deg`` resolution (a bounded fan-out when cells are
    sized near the median rectangle), the only all-to-all moves those
    skinny cover rows, and each cell tests its own A×B candidates
    vectorized.  A pair intersecting many shared cells is REPORTED EXACTLY
    ONCE — by the cell containing the intersection's min corner (the
    canonical owner-cell rule: that cell is provably inside both covers) —
    so no global distinct pass is needed.  Hot cells bound the A×B work:
    pick ``cell_deg`` so no cell holds more than ~10⁴ rects per side (at
    planetary scale, level the grid and salt by splitting A-side runs).

    Returns Dataset[a_id, b_id, overlap_w, overlap_h] (degrees; doubles
    derived from the input coordinates by max/min only, so exactly
    replayable)."""
    from ..runtime import cluster_cpus
    from ..state.hashing import hash_key

    nb = max(8, cluster_cpus() * 2)

    def cover(t: pa.Table, idc: str, side: int) -> pa.Table:
        out = _bbox_cover(t, idc, side, cell_deg)
        # shuffle by a BUCKET of cells, not per cell — one map_groups task
        # per bucket (the repo's bucketed-combine pattern), segments split
        # per ckey inside
        ck = out.column("ckey").to_numpy(zero_copy_only=False)
        bucket = (hash_key(ck.astype(np.uint64)) % np.uint64(nb)).astype(np.int64)
        return out.append_column("bucket", pa.array(bucket))

    cover_a = a_ds.map_batches(lambda t: cover(t, a_id, 0), batch_format="pyarrow")
    cover_b = b_ds.map_batches(lambda t: cover(t, b_id, 1), batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        rid = g.column("rid")
        if isinstance(rid, pa.ChunkedArray):
            rid = rid.combine_chunks()
        empty = pa.table(
            {
                "a_id": pa.array([], type=rid.type),
                "b_id": pa.array([], type=rid.type),
                "overlap_w": pa.array([], type=pa.float64()),
                "overlap_h": pa.array([], type=pa.float64()),
            }
        )
        if len(g) == 0:
            return empty
        ckey = g.column("ckey").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        cxs = g.column("cx").to_numpy(zero_copy_only=False)
        cys = g.column("cy").to_numpy(zero_copy_only=False)
        cols = {
            c: g.column(c).to_numpy(zero_copy_only=False)
            for c in ("minx", "miny", "maxx", "maxy")
        }
        order = np.argsort(ckey, kind="mergesort")
        bounds = np.nonzero(np.diff(ckey[order]))[0] + 1
        segs = np.split(order, bounds)
        out_a, out_b, out_w, out_h = [], [], [], []
        for seg in segs:
            ia = seg[side[seg] == 0]
            ib = seg[side[seg] == 1]
            if ia.size == 0 or ib.size == 0:
                continue
            # vectorized all-pairs closed-interval intersection test
            axl, ayl = cols["minx"][ia][:, None], cols["miny"][ia][:, None]
            axh, ayh = cols["maxx"][ia][:, None], cols["maxy"][ia][:, None]
            bxl, byl = cols["minx"][ib][None, :], cols["miny"][ib][None, :]
            bxh, byh = cols["maxx"][ib][None, :], cols["maxy"][ib][None, :]
            hit = (axl <= bxh) & (bxl <= axh) & (ayl <= byh) & (byl <= ayh)
            # owner-cell rule: report only where this cell holds the
            # intersection's min corner
            mx = np.maximum(axl, bxl)
            my = np.maximum(ayl, byl)
            own = (np.floor(mx / cell_deg).astype(np.int64) == cxs[seg[0]]) & (
                np.floor(my / cell_deg).astype(np.int64) == cys[seg[0]]
            )
            ii, jj = np.nonzero(hit & own)
            if ii.size == 0:
                continue
            out_a.append(ia[ii])
            out_b.append(ib[jj])
            out_w.append((np.minimum(axh, bxh) - mx)[ii, jj])
            out_h.append((np.minimum(ayh, byh) - my)[ii, jj])
        if not out_a:
            return empty
        return pa.table(
            {
                "a_id": rid.take(pa.array(np.concatenate(out_a))),
                "b_id": rid.take(pa.array(np.concatenate(out_b))),
                "overlap_w": pa.array(np.concatenate(out_w)),
                "overlap_h": pa.array(np.concatenate(out_h)),
            }
        )

    return (
        cover_a.union(cover_b)
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )


def nearest_poly_bbox(geo, polygons_path: str, kinds: list[str] | None = None):
    """Nearest-polygon attach: per geo span, the (poly_id, distance) of the
    closest polygon envelope — planar-degree point-to-rectangle distance
    (dx = max(minx−x, 0, x−maxx), analogous dy, √(dx²+dy²)); ties (e.g.
    dist 0 inside overlapping boxes) break to the smallest poly_id.
    The proximity analog of the reference's filterBounds / withinDistance
    uses (src/utils/sampling.py:12-28) — "how far is this observation from
    the nearest protected area".

    Scale shape: the polygon side is the bounded ancillary table (S5) —
    ``ray.put`` once, worker-local cache (the flagship-labeler pattern);
    the op is ONE stateless fused pass over the corpus, batch×n_poly
    vectorized distance matrix, no shuffle.  Output:
    (doc_id, span_idx, poly_id, dist_deg)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(polygons_path)
    if kinds is not None:
        tbl = tbl.filter(pc.is_in(tbl.column("kind"), pa.array(kinds)))
    tbl = tbl.sort_by("poly_id")  # np.argmin first-hit == min-poly_id tie-break
    bbox = tbl.column("bbox").combine_chunks()
    side_ref = ray.put(
        {
            "minx": bbox.field("minx").to_numpy(zero_copy_only=False),
            "miny": bbox.field("miny").to_numpy(zero_copy_only=False),
            "maxx": bbox.field("maxx").to_numpy(zero_copy_only=False),
            "maxy": bbox.field("maxy").to_numpy(zero_copy_only=False),
            "ids": tbl.column("poly_id").to_numpy(zero_copy_only=False),
        }
    )

    def fn(batch: pa.Table) -> pa.Table:
        s = _cached_index(side_ref)
        x = batch.column("lon").to_numpy(zero_copy_only=False)[:, None]
        y = batch.column("lat").to_numpy(zero_copy_only=False)[:, None]
        dx = np.maximum(np.maximum(s["minx"] - x, 0.0), x - s["maxx"])
        dy = np.maximum(np.maximum(s["miny"] - y, 0.0), y - s["maxy"])
        d = np.sqrt(dx * dx + dy * dy)
        j = np.argmin(d, axis=1)
        rows = np.arange(len(batch))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "span_idx": batch.column("span_idx"),
                "poly_id": pa.array(s["ids"][j].astype(object), type=pa.string()),
                "dist_deg": pa.array(d[rows, j]),
            }
        )

    return geo.map_batches(fn, batch_format="pyarrow")


def cell_coverage(
    geo,
    polygons_path: str,
    kinds: list[str] | None = None,
    level: int | None = None,
    ss: int = 4,
):
    """Per-(cell, polygon) coverage fraction by ss×ss supersampled PIP —
    the raster↔vector rasterization-with-area-fraction the reference's
    ``paint``/``updateMask`` path approximates with ALL_TOUCHED pixels
    (reference analog: src/utils/s2process.py:172,177).

    Each distinct cell is sampled at ss² interior sub-points; a polygon's
    coverage of the cell is the exact count of contained sub-points (and
    its /ss² fraction).  Scale shape: the corpus reduces to DISTINCT
    cell ids first (skinny two-phase); every cell then lives in exactly
    ONE block, so the per-(cell,poly) counts complete inside a stateless
    map_batches against the broadcast polygon index — no post-shuffle.
    Sub-point placement mirrors the oracle SQL operation-for-operation,
    so containment decisions are bit-identical.

    Output: (cell_id, poly_id, covered:int64, frac:double).
    """
    from ..state import cells as cellmod
    from .joins import distinct

    lvl = cellmod.CELL_LEVEL if level is None else level
    nn = float(np.int64(1) << lvl)
    index_ref = ray.put(load_polygon_index(polygons_path, kinds))

    def cover(t: pa.Table) -> pa.Table:
        idx = _cached_index(index_ref)
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        ix, iy = cellmod.decode(cid.astype(np.uint64), lvl)
        fx = ix.astype(np.float64)
        fy = iy.astype(np.float64)
        cc, pp = [], []
        for u in range(ss):
            for v in range(ss):
                lon = (fx + (u + 0.5) / ss) / nn * 360.0 - 180.0
                lat = (fy + (v + 0.5) / ss) / nn * 180.0 - 90.0
                pt, pl = idx.join_points(lon, lat)
                if pt.shape[0]:
                    cc.append(cid[pt])
                    pp.append(idx.poly_ids[pl])
        if cc:
            cc_a = np.concatenate(cc)
            pp_a = np.concatenate(pp).astype(object)
        else:
            cc_a = np.empty(0, cid.dtype)
            pp_a = np.empty(0, object)
        tb = pa.table(
            {
                "cell_id": pa.array(cc_a),
                "poly_id": pa.array(pp_a, type=pa.string()),
            }
        )
        out = tb.group_by(["cell_id", "poly_id"]).aggregate([([], "count_all")])
        out = out.rename_columns(["cell_id", "poly_id", "covered"])
        frac = out.column("covered").to_numpy(zero_copy_only=False) / float(ss * ss)
        return out.append_column("frac", pa.array(frac))

    cells_ds = distinct(geo.select_columns(["cell_id"]), ["cell_id"])
    return cells_ds.map_batches(cover, batch_format="pyarrow")


def poly_overlay(
    geo,
    polygons_path: str,
    kind_a: str = "reference",
    kind_b: str = "protected_area",
    level: int | None = None,
    ss: int = 4,
):
    """Pairwise polygon-overlay intersection measure between two layers —
    the vector-overlay product (reference analog: clipping reference
    polygons to protected areas before area reporting): for every
    (layer-A polygon, layer-B polygon) pair, the count of supersampled
    grid points (ss² per distinct occupied cell, the
    :func:`cell_coverage` placement) contained in BOTH.

    Exactness: identical sub-point placement and even-odd ray-cast as
    cell_coverage, so each point's two containment decisions are
    bit-identical to the SQL twin; the pair count is a pure integer.

    Scale shape: corpus reduces to DISTINCT cells (skinny two-phase);
    one stateless map holds BOTH broadcast polygon indexes and joins
    the per-point hit lists with a vectorized sorted-merge (no Python
    per point); only (poly_a, poly_b, n) partial rows — bounded by the
    overlapping-pair count, not the corpus — enter the bucketed integer
    combine.

    Output: (poly_a:string, poly_b:string, n_sub:int64,
    frac_of_cell:double = n_sub / ss²).
    """
    from ..state import cells as cellmod
    from .joins import distinct
    from .zonal import bucketed_sum

    lvl = cellmod.CELL_LEVEL if level is None else level
    nn = float(np.int64(1) << lvl)
    idx_a_ref = ray.put(load_polygon_index(polygons_path, [kind_a]))
    idx_b_ref = ray.put(load_polygon_index(polygons_path, [kind_b]))

    def overlay(t: pa.Table) -> pa.Table:
        ia = _cached_index(idx_a_ref)
        ib = _cached_index(idx_b_ref)
        cid = t.column("cell_id").to_numpy(zero_copy_only=False)
        ix, iy = cellmod.decode(cid.astype(np.uint64), lvl)
        fx = ix.astype(np.float64)
        fy = iy.astype(np.float64)
        pas, pbs = [], []
        for u in range(ss):
            for v in range(ss):
                lon = (fx + (u + 0.5) / ss) / nn * 360.0 - 180.0
                lat = (fy + (v + 0.5) / ss) / nn * 180.0 - 90.0
                a_pt, a_pl = ia.join_points(lon, lat)
                if not a_pt.shape[0]:
                    continue
                b_pt, b_pl = ib.join_points(lon, lat)
                if not b_pt.shape[0]:
                    continue
                ordb = np.argsort(b_pt, kind="mergesort")
                b_pt_s, b_pl_s = b_pt[ordb], b_pl[ordb]
                lo = np.searchsorted(b_pt_s, a_pt, "left")
                hi = np.searchsorted(b_pt_s, a_pt, "right")
                cnt = hi - lo
                tot = int(cnt.sum())
                if not tot:
                    continue
                ai = np.repeat(np.arange(len(a_pt)), cnt)
                starts = np.repeat(np.cumsum(cnt) - cnt, cnt)
                bi = np.repeat(lo, cnt) + (np.arange(tot) - starts)
                pas.append(ia.poly_ids[a_pl[ai]])
                pbs.append(ib.poly_ids[b_pl_s[bi]])
        if pas:
            pa_a = np.concatenate(pas).astype(object)
            pb_a = np.concatenate(pbs).astype(object)
        else:
            pa_a = np.empty(0, object)
            pb_a = np.empty(0, object)
        tb = pa.table(
            {
                "poly_a": pa.array(pa_a, type=pa.string()),
                "poly_b": pa.array(pb_a, type=pa.string()),
            }
        )
        out = tb.group_by(["poly_a", "poly_b"]).aggregate([([], "count_all")])
        return out.rename_columns(["poly_a", "poly_b", "n_sub"])

    cells_ds = distinct(geo.select_columns(["cell_id"]), ["cell_id"])
    agg = bucketed_sum(
        cells_ds.map_batches(overlay, batch_format="pyarrow"),
        ["poly_a", "poly_b"],
        ["n_sub"],
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t.column("n_sub").to_numpy(zero_copy_only=False)
        return t.append_column(
            "frac_of_cell", pa.array(n / float(ss * ss))
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def poly_overlay_sql(
    root: str,
    kind_a: str = "reference",
    kind_b: str = "protected_area",
    level: int | None = None,
    ss: int = 4,
) -> str:
    """Oracle twin of :func:`poly_overlay` — the cell_coverage point
    grid + TWO even-odd containment chains joined on point identity
    (cell_id, lon, lat)."""
    from ..state import cells as cellmod

    lvl = cellmod.CELL_LEVEL if level is None else level
    nn = float(np.int64(1) << lvl)
    ix = cellmod.morton_decode_sql_expr("cell_id", lvl, "x")
    iy = cellmod.morton_decode_sql_expr("cell_id", lvl, "y")
    offs = ", ".join(f"({u})" for u in range(ss))

    def side(tag: str, kind: str) -> str:
        return f"""
            pk{tag} AS (
                SELECT poly_id, bbox, rings
                FROM read_parquet('{root}/polygons.parquet')
                WHERE kind = '{kind}'
            ),
            r{tag} AS (
                SELECT poly_id, unnest(rings) AS ring,
                       generate_subscripts(rings, 1) AS rid
                FROM pk{tag}
            ),
            v{tag} AS (
                SELECT poly_id, rid, generate_subscripts(ring, 1) AS i,
                       unnest(ring) AS p
                FROM r{tag}
            ),
            e{tag} AS (
                SELECT a.poly_id, a.p.x AS x1, a.p.y AS y1,
                       b.p.x AS x2, b.p.y AS y2
                FROM v{tag} a JOIN v{tag} b
                  ON a.poly_id = b.poly_id AND a.rid = b.rid AND b.i = a.i + 1
            ),
            cand{tag} AS (
                SELECT pts.cell_id, pts.lon, pts.lat, pk{tag}.poly_id
                FROM pts JOIN pk{tag}
                  ON pts.lon >= pk{tag}.bbox.minx AND pts.lon <= pk{tag}.bbox.maxx
                 AND pts.lat >= pk{tag}.bbox.miny AND pts.lat <= pk{tag}.bbox.maxy
            ),
            c{tag} AS (
                SELECT cand{tag}.cell_id, cand{tag}.lon, cand{tag}.lat,
                       cand{tag}.poly_id,
                       SUM(CASE WHEN (e{tag}.y1 <= cand{tag}.lat)
                                 <> (e{tag}.y2 <= cand{tag}.lat)
                                 AND cand{tag}.lon < e{tag}.x1
                                     + (cand{tag}.lat - e{tag}.y1)
                                     / (e{tag}.y2 - e{tag}.y1)
                                     * (e{tag}.x2 - e{tag}.x1)
                           THEN 1 ELSE 0 END) AS crossings
                FROM cand{tag} JOIN e{tag}
                  ON e{tag}.poly_id = cand{tag}.poly_id
                GROUP BY 1, 2, 3, 4
            ),
            in{tag} AS (
                SELECT cell_id, lon, lat, poly_id
                FROM c{tag} WHERE crossings % 2 = 1
            )"""

    return f"""
            dc AS (SELECT DISTINCT cell_id FROM cells),
            ixy AS (
                SELECT cell_id, {ix} AS ix, {iy} AS iy FROM dc
            ),
            offs_u(u) AS (VALUES {offs}),
            offs_v(v) AS (VALUES {offs}),
            pts AS (
                SELECT cell_id,
                       (CAST(ix AS DOUBLE) + (u + 0.5) / {ss}) / {nn!r}
                           * 360.0 - 180.0 AS lon,
                       (CAST(iy AS DOUBLE) + (v + 0.5) / {ss}) / {nn!r}
                           * 180.0 - 90.0 AS lat
                FROM ixy CROSS JOIN offs_u CROSS JOIN offs_v
            ),
            {side("a", kind_a)},
            {side("b", kind_b)}
            SELECT a.poly_id AS poly_a, b.poly_id AS poly_b,
                   CAST(COUNT(*) AS BIGINT) AS n_sub,
                   CAST(COUNT(*) AS DOUBLE) / {float(ss * ss)!r}
                       AS frac_of_cell
            FROM ina a JOIN inb b
              ON a.cell_id = b.cell_id AND a.lon = b.lon AND a.lat = b.lat
            GROUP BY a.poly_id, b.poly_id"""


def cell_coverage_sql(
    root: str, kind: str = "reference", level: int | None = None, ss: int = 4
) -> str:
    """Oracle twin of :func:`cell_coverage` — identical sub-point
    placement + the even-odd edge-crossing test over the polygon edge
    table (the pip_polygon oracle pattern), bbox-prefiltered."""
    from ..state import cells as cellmod

    lvl = cellmod.CELL_LEVEL if level is None else level
    nn = float(np.int64(1) << lvl)
    ix = cellmod.morton_decode_sql_expr("cell_id", lvl, "x")
    iy = cellmod.morton_decode_sql_expr("cell_id", lvl, "y")
    offs = ", ".join(f"({u})" for u in range(ss))
    return f"""
            dc AS (SELECT DISTINCT cell_id FROM cells),
            ixy AS (
                SELECT cell_id, {ix} AS ix, {iy} AS iy FROM dc
            ),
            offs_u(u) AS (VALUES {offs}),
            offs_v(v) AS (VALUES {offs}),
            pts AS (
                SELECT cell_id,
                       (CAST(ix AS DOUBLE) + (u + 0.5) / {ss}) / {nn!r}
                           * 360.0 - 180.0 AS lon,
                       (CAST(iy AS DOUBLE) + (v + 0.5) / {ss}) / {nn!r}
                           * 180.0 - 90.0 AS lat
                FROM ixy CROSS JOIN offs_u CROSS JOIN offs_v
            ),
            pk AS (
                SELECT poly_id, bbox, rings
                FROM read_parquet('{root}/polygons.parquet')
                WHERE kind = '{kind}'
            ),
            r AS (
                SELECT poly_id, unnest(rings) AS ring,
                       generate_subscripts(rings, 1) AS rid
                FROM pk
            ),
            v AS (
                SELECT poly_id, rid, generate_subscripts(ring, 1) AS i,
                       unnest(ring) AS p
                FROM r
            ),
            e AS (
                SELECT a.poly_id, a.p.x AS x1, a.p.y AS y1,
                       b.p.x AS x2, b.p.y AS y2
                FROM v a JOIN v b
                  ON a.poly_id = b.poly_id AND a.rid = b.rid AND b.i = a.i + 1
            ),
            cand AS (
                SELECT pts.cell_id, pts.lon, pts.lat, pk.poly_id
                FROM pts JOIN pk
                  ON pts.lon >= pk.bbox.minx AND pts.lon <= pk.bbox.maxx
                 AND pts.lat >= pk.bbox.miny AND pts.lat <= pk.bbox.maxy
            ),
            c AS (
                SELECT cand.cell_id, cand.lon, cand.lat, cand.poly_id,
                       SUM(CASE WHEN (e.y1 <= cand.lat) <> (e.y2 <= cand.lat)
                                 AND cand.lon < e.x1 + (cand.lat - e.y1)
                                     / (e.y2 - e.y1) * (e.x2 - e.x1)
                           THEN 1 ELSE 0 END) AS crossings
                FROM cand JOIN e ON e.poly_id = cand.poly_id
                GROUP BY 1, 2, 3, 4
            ),
            hits AS (
                SELECT cell_id, poly_id, CAST(COUNT(*) AS BIGINT) AS covered
                FROM c WHERE crossings % 2 = 1 GROUP BY 1, 2
            )
            SELECT cell_id, poly_id, covered,
                   CAST(covered AS DOUBLE) / {float(ss * ss)!r} AS frac
            FROM hits"""


def poly_majority(primitives, polygons_path: str, year: int = 2022):
    """Zonal MAJORITY per polygon — the categorical reduceRegions (most
    frequent assembled land-cover class among the tiles whose centers
    fall inside each reference polygon; ties to the smallest class), the
    reporting companion of the per-polygon mean (``q_poly_zonal``) every
    land-cover product ships per management unit.

    Composition, all existing machinery: assemble reduce → tile centers
    → broadcast-index PIP label attach (first polygon in poly_id order)
    → bucketed (poly, class) integer counts → pack-max winner
    (n·256 + (256−class): highest count, then lowest class) on the
    polygon-bounded count table.  share = ONE pinned votes/tiles
    division.

    Output: (poly_id:string, majority_class:int64, n_votes:int64,
    n_tiles:int64, share:f64), polygons sorted.
    """
    import pandas as pd

    import ray.data as rd

    from ..state import cells
    from ..state.cells import TILE_LEVEL
    from .assemblage import assemble_tile_labels
    from .zonal import bucketed_sum

    labels = (
        assemble_tile_labels(primitives)
        .filter(expr=f"year == {year}")
        .select_columns(["tile_id", "LANDCOVER"])
    )

    def add_center(t: pa.Table) -> pa.Table:
        tid = t.column("tile_id").to_numpy(zero_copy_only=False)
        lon, lat = cells.cell_center(tid, TILE_LEVEL)
        return pa.table(
            {
                "tile_id": t.column("tile_id"),
                "tile_class": pa.array(
                    t.column("LANDCOVER")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
            }
        )

    pts = labels.map_batches(add_center, batch_format="pyarrow")
    lab = pip_join(pts, polygons_path, kinds=["reference"], mode="label")

    def counts(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.not_equal(t.column("poly_id"), ""))
        g = (
            t.select(["poly_id", "tile_class"])
            .group_by(["poly_id", "tile_class"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["poly_id", "tile_class", "n"])

    cnt = bucketed_sum(
        lab.map_batches(counts, batch_format="pyarrow"),
        ["poly_id", "tile_class"],
        ["n"],
    ).to_pandas()  # ≤ |polygons|·|classes| rows — polygon-bounded
    empty = pa.table(
        {
            "poly_id": pa.array([], pa.string()),
            "majority_class": pa.array([], pa.int64()),
            "n_votes": pa.array([], pa.int64()),
            "n_tiles": pa.array([], pa.int64()),
            "share": pa.array([], pa.float64()),
        }
    )
    if len(cnt) == 0:
        return rd.from_arrow(empty)
    cnt["score"] = cnt["n"].to_numpy(np.int64) * np.int64(256) + (
        np.int64(256) - cnt["tile_class"].to_numpy(np.int64)
    )
    g = cnt.groupby("poly_id", as_index=False).agg(
        score=("score", "max"), n_tiles=("n", "sum")
    )
    g = g.sort_values("poly_id", kind="mergesort").reset_index(drop=True)
    score = g["score"].to_numpy(np.int64)
    votes = score // 256
    cls = np.int64(256) - (score % np.int64(256))
    n_tiles = g["n_tiles"].to_numpy(np.int64)
    share = votes.astype(np.float64) / n_tiles.astype(np.float64)
    return rd.from_arrow(
        pa.table(
            {
                "poly_id": pa.array(g["poly_id"].astype(str).tolist(), pa.string()),
                "majority_class": pa.array(cls, pa.int64()),
                "n_votes": pa.array(votes, pa.int64()),
                "n_tiles": pa.array(n_tiles, pa.int64()),
                "share": pa.array(share, pa.float64()),
            }
        )
    )


def edge_distance(geo, polygons_path: str, kinds: list[str] | None = None):
    """Distance-to-edge INSIDE protected areas — for every geo span whose
    point lies in a polygon (first match in poly_id order, the label
    rule), the exact planar distance to that polygon's boundary plus the
    snapped boundary point: the landscape-ecology "edge effect" depth
    measure and the map-matching snap primitive in one pass.

    Exact segment geometry, pinned: per candidate segment,
    t = ((px−x1)·dx + (py−y1)·dy)/len2 clamped to [0,1], q = (x1+t·dx,
    y1+t·dy), d² = (px−qx)² + (py−qy)²; the winner is the FIRST segment
    (ring order, then vertex order) attaining the minimal d² — the same
    (d², rid, i) order the oracle's row_number uses.  dist = √d² (IEEE
    sqrt, exact both sides).

    Scale shape: the polygon table is the bounded ancillary side — ring
    segments broadcast ONCE grouped by sorted poly_id; each batch
    expands (point × its-own-polygon's-segments) with ranges-from-counts
    index arithmetic and reduces with np.minimum.reduceat — no Python
    per point, no shuffle, work ∝ points·segments-per-polygon.

    Output: (doc_id:string, span_idx:int64, poly_id:string, d2:f64,
    dist:f64, snap_lon:f64, snap_lat:f64), one row per contained span.
    """
    idx = load_polygon_index(polygons_path, kinds)
    order = np.argsort(idx.poly_ids, kind="stable")
    sorted_ids = idx.poly_ids[order]
    xs1, ys1, xs2, ys2, seg_counts = [], [], [], [], []
    for pos in order:
        n_seg = 0
        for ring in idx.rings[int(pos)]:
            r = np.asarray(ring, np.float64).reshape(-1, 2)
            x1, y1 = r[:-1, 0], r[:-1, 1]
            x2, y2 = r[1:, 0], r[1:, 1]
            keep = ((x2 - x1) != 0.0) | ((y2 - y1) != 0.0)  # drop degenerate
            xs1.append(x1[keep]); ys1.append(y1[keep])
            xs2.append(x2[keep]); ys2.append(y2[keep])
            n_seg += int(keep.sum())
        seg_counts.append(n_seg)
    side = {
        "ids": sorted_ids,
        "x1": np.concatenate(xs1), "y1": np.concatenate(ys1),
        "x2": np.concatenate(xs2), "y2": np.concatenate(ys2),
        "offs": np.concatenate(([0], np.cumsum(seg_counts))).astype(np.int64),
    }
    side_ref = ray.put(side)
    labeled = pip_join(geo, polygons_path, kinds=kinds, mode="label")

    def snap(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.not_equal(t.column("poly_id"), ""))
        s = ray.get(side_ref)
        pid = np.asarray(t.column("poly_id").to_pylist(), dtype=object)
        px = t.column("lon").to_numpy(zero_copy_only=False)
        py = t.column("lat").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(s["ids"], pid)
        cnt = (s["offs"][pos + 1] - s["offs"][pos]).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(cnt)))[:-1]
        total = int(cnt.sum())
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "span_idx": pa.array([], pa.int64()),
                    "poly_id": pa.array([], pa.string()),
                    "d2": pa.array([], pa.float64()),
                    "dist": pa.array([], pa.float64()),
                    "snap_lon": pa.array([], pa.float64()),
                    "snap_lat": pa.array([], pa.float64()),
                }
            )
        pt_rep = np.repeat(np.arange(len(pid)), cnt)
        seg_i = (
            np.arange(total) - np.repeat(starts, cnt)
        ) + np.repeat(s["offs"][pos], cnt)
        x1, y1 = s["x1"][seg_i], s["y1"][seg_i]
        x2, y2 = s["x2"][seg_i], s["y2"][seg_i]
        dx, dy = x2 - x1, y2 - y1
        len2 = dx * dx + dy * dy
        ppx, ppy = px[pt_rep], py[pt_rep]
        tt = ((ppx - x1) * dx + (ppy - y1) * dy) / len2
        tc = np.minimum(np.maximum(tt, 0.0), 1.0)
        qx = x1 + tc * dx
        qy = y1 + tc * dy
        d2 = (ppx - qx) * (ppx - qx) + (ppy - qy) * (ppy - qy)
        dmin = np.minimum.reduceat(d2, starts)
        # first index attaining the min (segment order = ring, vertex asc)
        local = np.arange(total)
        hit = d2 == dmin[pt_rep]
        first = np.minimum.reduceat(np.where(hit, local, total), starts)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "span_idx": pa.array(
                    t.column("span_idx")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                ),
                "poly_id": t.column("poly_id"),
                "d2": pa.array(dmin, pa.float64()),
                "dist": pa.array(np.sqrt(dmin), pa.float64()),
                "snap_lon": pa.array(qx[first], pa.float64()),
                "snap_lat": pa.array(qy[first], pa.float64()),
            }
        )

    return labeled.map_batches(snap, batch_format="pyarrow")


def pip_density(geo, polygons_path: str):
    """Observation density per reference polygon — points per unit area
    (the monitoring-coverage report: which protected areas are under-
    observed): exact PIP containment-pair counts per polygon over the
    shoelace area, zero-count polygons included.

    density = n / (area_scaled / AREA_SCALE) — ONE pinned chain of the
    exact integer count and the value-checked scaled shoelace area.

    Output: (poly_id:string, n_obs:int64, area_scaled:int64,
    density:f64), polygons sorted.
    """
    import pyarrow.parquet as pq

    import ray.data as rd

    from ..stages.allocation import AREA_SCALE
    from .zonal import bucketed_sum

    inner = pip_join(geo, polygons_path, kinds=["reference"], mode="inner")

    def cpart(t: pa.Table) -> pa.Table:
        g = t.select(["poly_id"]).group_by(["poly_id"]).aggregate([([], "count_all")])
        return g.rename_columns(["poly_id", "n_obs"])

    counts = (
        bucketed_sum(
            inner.map_batches(cpart, batch_format="pyarrow"),
            ["poly_id"],
            ["n_obs"],
        )
        .to_pandas()
        .set_index("poly_id")["n_obs"]
    )
    polys = pq.read_table(polygons_path, columns=["poly_id", "kind", "rings"])
    polys = polys.filter(
        pa.compute.equal(polys.column("kind"), "reference")
    )
    pids = polys.column("poly_id").to_pylist()
    rings = polys.column("rings").to_pylist()
    area = np.empty(len(rings), np.int64)
    for i, poly in enumerate(rings):
        ring = np.array([[p["x"], p["y"]] for p in poly[0]])
        terms = ring[:-1, 0] * ring[1:, 1] - ring[1:, 0] * ring[:-1, 1]
        f = np.add.accumulate(terms)[-1] if terms.size else 0.0
        area[i] = np.int64(np.round((np.abs(f) * 0.5) * AREA_SCALE))
    order = np.argsort(np.asarray(pids, object), kind="mergesort")
    pids_s = [pids[i] for i in order]
    area_s = area[order]
    n_obs = np.array([int(counts.get(p, 0)) for p in pids_s], np.int64)
    dens = n_obs.astype(np.float64) / (area_s.astype(np.float64) / float(AREA_SCALE))
    return rd.from_arrow(
        pa.table(
            {
                "poly_id": pa.array(pids_s, pa.string()),
                "n_obs": pa.array(n_obs, pa.int64()),
                "area_scaled": pa.array(area_s, pa.int64()),
                "density": pa.array(dens, pa.float64()),
            }
        )
    )


def coverage_gaps(geo, polygons_path: str):
    """Monitoring blind spots per reference polygon — grid cells whose
    CENTER lies inside the polygon but which contain NO observations
    (the complement of :func:`pip_density`; the map a field-campaign
    planner actually wants): per polygon the in-cell count, observed
    count, gap count and pinned gap share.

    Scale shape: polygon bboxes enumerate their own CELL_LEVEL grid
    cells (polygon-bounded work, independent of corpus size); centers
    test against the exact ring index; occupancy probes the broadcast
    sorted occupied-cell array.

    Output: (poly_id:string, n_cells:int64, n_observed:int64,
    n_gaps:int64, gap_share:f64), polygons sorted.
    """
    import ray.data as rd

    from ..state import cells as C
    from ..state.geom import points_in_polygon
    from ..stages import zonal

    occ = (
        zonal.zonal_sums(geo, keys=("cell_id",), bands=())
        .select_columns(["cell_id"])
        .to_pandas()["cell_id"]
        .to_numpy(np.int64)
    )
    occ = np.sort(occ)
    idx = load_polygon_index(polygons_path, ["reference"])
    n_grid = np.int64(1) << C.CELL_LEVEL
    rows = []
    for pos in np.argsort(idx.poly_ids, kind="stable"):
        pid = idx.poly_ids[int(pos)]
        rings = idx.rings[int(pos)]
        ring0 = np.asarray(rings[0], np.float64).reshape(-1, 2)
        minx, miny = ring0.min(axis=0)
        maxx, maxy = ring0.max(axis=0)
        ix0 = C.grid_coords(np.array([minx]), np.array([miny]), C.CELL_LEVEL)
        ix1 = C.grid_coords(np.array([maxx]), np.array([maxy]), C.CELL_LEVEL)
        xs = np.arange(int(ix0[0][0]), int(ix1[0][0]) + 1, dtype=np.int64)
        ys = np.arange(int(ix0[1][0]), int(ix1[1][0]) + 1, dtype=np.int64)
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        gx, gy = gx.ravel(), gy.ravel()
        lon = (gx.astype(np.float64) + 0.5) / float(n_grid) * 360.0 - 180.0
        lat = (gy.astype(np.float64) + 0.5) / float(n_grid) * 180.0 - 90.0
        inside = points_in_polygon(lon, lat, rings)
        cid = np.asarray(C.morton(gx[inside], gy[inside]), np.int64)
        n_in = int(inside.sum())
        if n_in == 0:
            rows.append((str(pid), 0, 0, 0, 0.0))
            continue
        p = np.searchsorted(occ, cid)
        hit = (p < len(occ)) & (occ[np.minimum(p, len(occ) - 1)] == cid)
        n_obs = int(hit.sum())
        gaps = n_in - n_obs
        rows.append(
            (str(pid), n_in, n_obs, gaps, float(gaps) / float(n_in))
        )
    return rd.from_arrow(
        pa.table(
            {
                "poly_id": pa.array([r[0] for r in rows], pa.string()),
                "n_cells": pa.array([r[1] for r in rows], pa.int64()),
                "n_observed": pa.array([r[2] for r in rows], pa.int64()),
                "n_gaps": pa.array([r[3] for r in rows], pa.int64()),
                "gap_share": pa.array([r[4] for r in rows], pa.float64()),
            }
        )
    )
