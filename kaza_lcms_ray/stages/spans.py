"""Span parsing: documents → geo_obs (SURVEY.md M22).

The documents table is never rewritten — geo observations are emitted as a
*side* table keyed ``(doc_id, span_idx)``, so the per-row span-sequence
invariant (BASELINE.json input_hint; reference analog: properties carried
untouched through joins, src/utils/sampling.py:88-89) holds trivially: any
stage that needs the original row joins back on ``doc_id``.

Geo span text format: ``lon;lat;year;doy;b0,b1,b2,b3,b4,b5``.  Parsing is
pure Arrow compute (split_pattern + list_element + cast) — zero Python-per-row
work.  Band values additionally come out as ×100 scaled int64 (``c0..c5``):
grouped sums over these are exact integer arithmetic, which makes every
downstream mean/sum aggregate bit-stable under any combine order AND
bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..state.cells import CELL_LEVEL, TILE_LEVEL, encode

N_BANDS = 6
BAND_NAMES = ("blue", "green", "red", "nir", "swir1", "swir2")  # src/utils/s2process.py:131


def parse_geo_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, spans) batch → geo_obs rows for this batch's geo spans.

    Output schema: doc_id:string, span_idx:int32, lon:f64, lat:f64,
    year:int32, doy:int32, t:f64, b0..b5:f64, c0..c5:int64,
    cell_id:uint64, tile_id:uint64.
    """
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    # flatten list<struct> → per-span arrays + owning doc index
    list_arr = spans
    offsets = list_arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lengths = np.diff(offsets)
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
    span_idx = np.arange(offsets[-1] - offsets[0], dtype=np.int64) - np.repeat(
        offsets[:-1] - offsets[0], lengths
    )
    flat = list_arr.flatten()  # StructArray (may carry a slice offset)
    kind = flat.field("kind")
    is_geo = pc.equal(kind, "geo").to_numpy(zero_copy_only=False)
    gi = np.nonzero(is_geo)[0]
    texts = flat.field("text").take(pa.array(gi))

    parts = pc.split_pattern(texts, ";")
    lon = pc.list_element(parts, 0).cast(pa.float64())
    lat = pc.list_element(parts, 1).cast(pa.float64())
    year = pc.list_element(parts, 2).cast(pa.int32())
    doy = pc.list_element(parts, 3).cast(pa.int32())
    bands = pc.split_pattern(pc.list_element(parts, 4), ",")

    lon_np = lon.to_numpy(zero_copy_only=False)
    lat_np = lat.to_numpy(zero_copy_only=False)
    # fractional years since 1970 (reference: src/utils/harmonics.py:70-75)
    t = (
        year.cast(pa.float64()).to_numpy(zero_copy_only=False)
        - 1970.0
        + (doy.cast(pa.float64()).to_numpy(zero_copy_only=False) - 1.0) / 365.0
    )

    cols: dict[str, pa.Array] = {
        "doc_id": batch.column("doc_id").take(pa.array(doc_idx[gi])),
        "span_idx": pa.array(span_idx[gi].astype(np.int32)),
        "lon": lon,
        "lat": lat,
        "year": year,
        "doy": doy,
        "t": pa.array(t),
    }
    for b in range(N_BANDS):
        fb = pc.list_element(bands, b).cast(pa.float64())
        cols[f"b{b}"] = fb
        cols[f"c{b}"] = pc.round(pc.multiply(fb, 100.0)).cast(pa.int64())
    cols["cell_id"] = pa.array(encode(lon_np, lat_np, CELL_LEVEL))
    cols["tile_id"] = pa.array(encode(lon_np, lat_np, TILE_LEVEL))
    return pa.table(cols)


def geo_obs(documents, batch_size: int | None = None):
    """Dataset[documents] → Dataset[geo_obs] (stateless map_batches).

    Default batch_size=None (batch = block) so the parse fuses with the
    upstream read — an explicit batch_size breaks read→map fusion and ships
    every raw document block through the object store."""
    return documents.map_batches(
        parse_geo_batch, batch_format="pyarrow", batch_size=batch_size
    )


def text_obs_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, spans) batch → one row per TEXT span (doc_id, span_idx,
    text) — the corpus view the text/packing operators consume.  Same
    flatten as parse_geo_batch; the spans column itself is untouched."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lengths = np.diff(offsets)
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
    span_idx = np.arange(offsets[-1] - offsets[0], dtype=np.int64) - np.repeat(
        offsets[:-1] - offsets[0], lengths
    )
    flat = spans.flatten()
    is_text = pc.equal(flat.field("kind"), "text").to_numpy(zero_copy_only=False)
    ti = np.nonzero(is_text)[0]
    return pa.table(
        {
            "doc_id": batch.column("doc_id").take(pa.array(doc_idx[ti])),
            "span_idx": pa.array(span_idx[ti].astype(np.int32)),
            "text": flat.field("text").take(pa.array(ti)),
        }
    )


def text_obs(documents, batch_size: int | None = None):
    """Dataset[documents] → Dataset[text spans] (stateless map_batches)."""
    return documents.map_batches(
        text_obs_batch, batch_format="pyarrow", batch_size=batch_size
    )


def doc_profile_batch(batch: pa.Table) -> pa.Table:
    """Per-document span-kind profile: (doc_id, n_geo, n_text, n_media,
    text_chars).  The interleaved-payload inventory — entirely row-local
    (a document's spans live in its own row), so the whole profile is ONE
    stateless map pass: no shuffle, no join, at any scale."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    offs = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lengths = np.diff(offs)
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
    kinds = flat.field("kind").to_numpy(zero_copy_only=False)
    chars = pc.utf8_length(flat.field("text")).to_numpy(zero_copy_only=False)
    n = len(batch)
    out = {"doc_id": batch.column("doc_id")}
    for kind in ("geo", "text", "media"):
        cnt = np.zeros(n, dtype=np.int64)
        np.add.at(cnt, doc_idx, (kinds == kind).astype(np.int64))
        out[f"n_{kind}"] = pa.array(cnt)
    tc = np.zeros(n, dtype=np.int64)
    np.add.at(tc, doc_idx, np.where(kinds == "text", chars, 0))
    out["text_chars"] = pa.array(tc)
    return pa.table(out)


def doc_profiles(documents):
    return documents.map_batches(doc_profile_batch, batch_format="pyarrow")


def span_signature_batch(batch: pa.Table) -> pa.Table:
    """Per-doc fingerprint of the spans sequence (kind|text|media_ref|order).

    Used by span-sequence-equality tests: equal fingerprints before and after
    a stage ⇔ the spans column survived byte-identically in order.
    """
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    joined = pc.binary_join_element_wise(
        flat.field("kind"),
        flat.field("text"),
        flat.field("media_ref"),
        pc.cast(flat.field("offset"), pa.string()),
        "\x1f",
    )
    # flatten() rebases values for sliced arrays — rebase offsets to match
    # (same compensation parse_geo_batch applies)
    offs = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    per_doc = pa.ListArray.from_arrays(pa.array((offs - offs[0]).astype(np.int32)), joined)
    sig = pc.binary_join(per_doc, "\x1e")
    return pa.table({"doc_id": batch.column("doc_id"), "span_sig": sig})


def column_profile(ds, cols: list[str]):
    """Per-column data-quality profile: row / null / empty-string counts —
    the schema-health report a pipeline emits before trusting a new shard.
    Per-batch partial is ≤ |cols| rows whatever the block size; the
    bucketed combine sums exact integers.  Returns
    Dataset[column, n_rows, n_null, n_empty]."""
    import numpy as np
    import pyarrow.compute as pc

    from .zonal import bucketed_sum

    def partial(t: pa.Table) -> pa.Table:
        names, nr, nn, ne = [], [], [], []
        for c in cols:
            col = t.column(c)
            names.append(c)
            nr.append(len(t))
            nn.append(int(pc.sum(pc.cast(pc.is_null(col), pa.int64())).as_py() or 0))
            if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
                eq = pc.equal(col, "")
                ne.append(int(pc.sum(pc.cast(eq, pa.int64())).as_py() or 0))
            else:
                ne.append(0)
        return pa.table(
            {
                "column": pa.array(names, type=pa.string()),
                "n_rows": pa.array(np.asarray(nr, np.int64)),
                "n_null": pa.array(np.asarray(nn, np.int64)),
                "n_empty": pa.array(np.asarray(ne, np.int64)),
            }
        )

    return bucketed_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["column"],
        ["n_rows", "n_null", "n_empty"],
        recombine_batch_size=None,
    )


def column_profile_sql(table_sql: str, cols: list[str], str_cols: list[str]) -> str:
    """Oracle: one UNION ALL arm per column with the same counts."""
    arms = []
    for c in cols:
        empty = (
            f"SUM(CASE WHEN {c} = '' THEN 1 ELSE 0 END)" if c in str_cols else "0"
        )
        arms.append(
            f"""SELECT '{c}' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                   CAST({empty} AS BIGINT) AS n_empty
            FROM ({table_sql})"""
        )
    return " UNION ALL ".join(arms)


def doc_footprint(documents, batch_size: int | None = None):
    """Per-document spatial footprint: geo-span count + bounding envelope
    (min/max lon/lat) of each document's geo spans — the document-level
    spatial index entry (bbox pruning, dataset cataloging).

    Row-local: a document is ONE input row, so its whole footprint reduces
    inside the batch (Arrow hash aggregation) — zero shuffle; min/max
    involve no arithmetic, so the doubles are byte-exact vs SQL.  Docs
    without geo spans produce no row (same as the geo CTE's GROUP BY).
    """

    def fn(batch: pa.Table) -> pa.Table:
        g = (
            parse_geo_batch(batch)
            .select(["doc_id", "lon", "lat"])
            .group_by(["doc_id"])
            .aggregate(
                [
                    ([], "count_all"),
                    ("lon", "min"),
                    ("lon", "max"),
                    ("lat", "min"),
                    ("lat", "max"),
                ]
            )
        )
        return g.rename_columns(
            ["doc_id", "n_geo", "minx", "maxx", "miny", "maxy"]
        )

    return documents.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


TRAJ_SCALE_INT = 1 << 40  # step-length quantization (order-free int sums)


def doc_trajectory(documents, batch_size: int | None = None):
    """Per-document movement statistics over its geo spans IN SPAN ORDER:
    step count, total path length, and net first→last displacement — the
    trajectory summary a movement-analytics pipeline derives per entity
    (the document analog of per-animal GPS-track rollups over the KAZA
    collar data the reference's AOI serves).

    Exactness: each step length sqrt(Δlon²+Δlat²) is pure IEEE; steps
    quantize to floor(·2⁴⁰) int64 (the morans_i discipline) so the
    per-doc total is an ORDER-FREE integer sum; path_len is one pinned
    division; net_disp touches only the two endpoint rows.

    Scale shape: row-local — a document is ONE input row, so its whole
    trajectory folds inside the batch (boundary-masked vectorized diffs +
    np.add.reduceat over doc starts); zero shuffle, zero per-doc Python.
    Docs without geo spans produce no row (the geo CTE's GROUP BY rule).

    Output: (doc_id, n_geo:int64, path_q:int64, path_len:f64,
    net_disp:f64).
    """

    def fn(batch: pa.Table) -> pa.Table:
        g = parse_geo_batch(batch)
        n = g.num_rows
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "n_geo": pa.array([], pa.int64()),
                "path_q": pa.array([], pa.int64()),
                "path_len": pa.array([], pa.float64()),
                "net_disp": pa.array([], pa.float64()),
            }
        )
        if n == 0:
            return empty
        doc = g.column("doc_id")
        if isinstance(doc, pa.ChunkedArray):
            doc = doc.combine_chunks()
        lon = g.column("lon").to_numpy(zero_copy_only=False)
        lat = g.column("lat").to_numpy(zero_copy_only=False)
        if n > 1:
            same = pc.equal(doc.slice(1), doc.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        else:
            same = np.zeros(0, bool)
        dl = lon[1:] - lon[:-1]
        dt = lat[1:] - lat[:-1]
        sq = np.floor(np.sqrt(dl * dl + dt * dt) * float(TRAJ_SCALE_INT)).astype(
            np.int64
        )
        srow = np.zeros(n, np.int64)
        srow[1:] = np.where(same, sq, 0)
        starts = np.concatenate(
            [np.zeros(1, np.int64), np.nonzero(~same)[0].astype(np.int64) + 1]
        )
        path_q = np.add.reduceat(srow, starts)
        n_geo = np.diff(np.concatenate([starts, np.array([n], np.int64)]))
        ends = starts + n_geo - 1
        dlon = lon[ends] - lon[starts]
        dlat = lat[ends] - lat[starts]
        return pa.table(
            {
                "doc_id": doc.take(pa.array(starts)),
                "n_geo": pa.array(n_geo.astype(np.int64)),
                "path_q": pa.array(path_q),
                "path_len": pa.array(path_q / float(TRAJ_SCALE_INT)),
                "net_disp": pa.array(np.sqrt(dlon * dlon + dlat * dlat)),
            }
        )

    return documents.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def doc_trajectory_sql(geo_sql: str) -> str:
    """Oracle twin of :func:`doc_trajectory`: LAG window in span order,
    identical floor(·2⁴⁰) step quantization, endpoint rows via
    arg_min/arg_max on the unique span_idx (struct-tuple min/max measured
    17× slower for the same deterministic answer)."""
    s = TRAJ_SCALE_INT
    return f"""
        tj_in AS MATERIALIZED ({geo_sql}),
        tj AS (
            SELECT doc_id, span_idx, lon, lat,
                   lag(lon) OVER w AS plon, lag(lat) OVER w AS plat
            FROM tj_in
            WINDOW w AS (PARTITION BY doc_id ORDER BY span_idx)
        ),
        tj_a AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_geo,
                   CAST(COALESCE(SUM(CAST(floor(
                       sqrt((lon - plon) * (lon - plon)
                          + (lat - plat) * (lat - plat)) * {s}.0
                   ) AS BIGINT)), 0) AS BIGINT) AS path_q,
                   arg_min(lon, span_idx) AS lon0,
                   arg_min(lat, span_idx) AS lat0,
                   arg_max(lon, span_idx) AS lon1,
                   arg_max(lat, span_idx) AS lat1
            FROM tj GROUP BY doc_id
        )
        SELECT doc_id, n_geo, path_q, path_q / {float(s)!r} AS path_len,
               sqrt((lon1 - lon0) * (lon1 - lon0)
                  + (lat1 - lat0) * (lat1 - lat0)) AS net_disp
        FROM tj_a"""


SIMPLIFY_COORD_SCALE = 1_000_000  # lon/lat → int64 micro-degrees (floor)
SIMPLIFY_EPS_Q = 500_000.0  # Douglas-Peucker tolerance in micro-degrees (0.5°)


def simplify_paths(documents, eps_q: float = SIMPLIFY_EPS_Q, batch_size=None):
    """Douglas-Peucker simplification of each document's geo-span path —
    the vector generalization step a map/trajectory pipeline runs before
    rendering or coarse matching (reference analog: the geometry
    erode/simplify family, SURVEY §2 M20).

    Exactness contract: coordinates quantize to int64 micro-degrees
    (floor(·1e6), floor so no round-half ambiguity vs SQL); the farthest
    point of a segment is argmax |cross| (the chord is CONSTANT within a
    segment, so the perpendicular-distance argmax needs no division) in
    exact int64 (|cross| ≤ (3.6e8)² < 2⁶³), ties → lowest span index;
    the split test is the pinned IEEE expression
    ``double(|cross|max) > eps_q * sqrt(double(len2))`` — int→double
    casts, sqrt and the product are all correctly rounded, so DuckDB
    replays it bit-for-bit.  Degenerate chords (first == last point,
    len2 = 0) never split — a documented rule both sides share.

    Scale shape: row-local — a document is ONE input row, so the whole
    recursion folds inside the batch; the worklist is vectorized ACROSS
    all active segments of all docs (segmented reduceat argmax per
    round, rounds ≤ max path depth), zero shuffle, zero per-doc Python.

    Output: (doc_id, span_idx, x_q, y_q) — the kept vertices.
    """

    def fn(batch: pa.Table) -> pa.Table:
        g = parse_geo_batch(batch)
        n = g.num_rows
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "span_idx": pa.array([], pa.int64()),
                "x_q": pa.array([], pa.int64()),
                "y_q": pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        doc = g.column("doc_id")
        if isinstance(doc, pa.ChunkedArray):
            doc = doc.combine_chunks()
        lon = g.column("lon").to_numpy(zero_copy_only=False)
        lat = g.column("lat").to_numpy(zero_copy_only=False)
        x = np.floor(lon * float(SIMPLIFY_COORD_SCALE)).astype(np.int64)
        y = np.floor(lat * float(SIMPLIFY_COORD_SCALE)).astype(np.int64)
        if n > 1:
            same = pc.equal(doc.slice(1), doc.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        else:
            same = np.zeros(0, bool)
        starts = np.concatenate(
            [np.zeros(1, np.int64), np.nonzero(~same)[0].astype(np.int64) + 1]
        )
        counts = np.diff(np.concatenate([starts, np.array([n], np.int64)]))
        ends = starts + counts - 1
        kept = np.zeros(n, bool)
        kept[starts] = True
        kept[ends] = True
        seg_i, seg_j = starts, ends
        while True:
            live = seg_j > seg_i + 1
            seg_i, seg_j = seg_i[live], seg_j[live]
            if len(seg_i) == 0:
                break
            L = seg_j - seg_i - 1
            offsets = np.zeros(len(L), np.int64)
            np.cumsum(L[:-1], out=offsets[1:])
            T = int(L.sum())
            segid = np.repeat(np.arange(len(L), dtype=np.int64), L)
            p = seg_i[segid] + 1 + (np.arange(T, dtype=np.int64) - offsets[segid])
            dx = x[seg_j] - x[seg_i]
            dy = y[seg_j] - y[seg_i]
            cross = dx[segid] * (y[p] - y[seg_i][segid]) - dy[segid] * (
                x[p] - x[seg_i][segid]
            )
            acr = np.abs(cross)
            mx = np.maximum.reduceat(acr, offsets)
            cand = np.where(acr == mx[segid], p, np.int64(1) << 62)
            k = np.minimum.reduceat(cand, offsets)
            len2 = dx * dx + dy * dy
            split = mx.astype(np.float64) > eps_q * np.sqrt(
                len2.astype(np.float64)
            )
            kept[k[split]] = True
            seg_i = np.concatenate([seg_i[split], k[split]])
            seg_j = np.concatenate([k[split], seg_j[split]])
        idx = np.nonzero(kept)[0]
        return pa.table(
            {
                "doc_id": doc.take(pa.array(idx)),
                "span_idx": g.column("span_idx").take(pa.array(idx)).cast(
                    pa.int64()
                ),
                "x_q": pa.array(x[idx]),
                "y_q": pa.array(y[idx]),
            }
        )

    return documents.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def simplify_paths_sql(geo_sql: str, eps_q: float = SIMPLIFY_EPS_Q) -> str:
    """Oracle twin of :func:`simplify_paths`: the recursive-CTE DP — each
    segment LATERAL-joins its argmax-|cross| interior point (NOT EXISTS
    tie rule: max |cross|, then lowest idx) and splits under the identical
    pinned IEEE test.  Kept vertices = the union of every segment
    endpoint ever created."""
    s = SIMPLIFY_COORD_SCALE

    def cross(pt: str) -> str:
        return (
            f"abs((b.x-a.x)*({pt}.y-a.y) - (b.y-a.y)*({pt}.x-a.x))"
        )

    return f"""
        dp_pts AS (
            SELECT doc_id, span_idx AS idx,
                   CAST(floor(lon * {float(s)!r}) AS BIGINT) AS x,
                   CAST(floor(lat * {float(s)!r}) AS BIGINT) AS y
            FROM ({geo_sql})
        ),
        dp_seg AS (
            SELECT doc_id, MIN(idx) AS i, MAX(idx) AS j
            FROM dp_pts GROUP BY doc_id
            UNION ALL
            SELECT s.doc_id,
                   CASE WHEN h.half = 0 THEN s.i ELSE u.kk END AS i,
                   CASE WHEN h.half = 0 THEN u.kk ELSE s.j END AS j
            FROM dp_seg s
            JOIN LATERAL (
                SELECT k.idx AS kk
                FROM dp_pts k, dp_pts a, dp_pts b
                WHERE k.doc_id = s.doc_id AND a.doc_id = s.doc_id
                  AND b.doc_id = s.doc_id
                  AND a.idx = s.i AND b.idx = s.j
                  AND k.idx > s.i AND k.idx < s.j
                  AND NOT EXISTS (
                    SELECT 1 FROM dp_pts m
                    WHERE m.doc_id = s.doc_id
                      AND m.idx > s.i AND m.idx < s.j
                      AND ({cross("m")}, -m.idx) > ({cross("k")}, -k.idx)
                  )
                  AND CAST({cross("k")} AS DOUBLE)
                      > {eps_q!r} * sqrt(CAST(
                            (b.x-a.x)*(b.x-a.x) + (b.y-a.y)*(b.y-a.y)
                        AS DOUBLE))
            ) u ON TRUE
            CROSS JOIN (VALUES (0), (1)) h(half)
            WHERE s.j > s.i + 1
        ),
        dp_kept AS (
            -- explicit DISTINCT: DuckDB's UNION over a recursive CTE
            -- does not dedupe (observed 2026-08, duckdb 1.x)
            SELECT DISTINCT doc_id, idx FROM (
                SELECT doc_id, i AS idx FROM dp_seg
                UNION ALL
                SELECT doc_id, j AS idx FROM dp_seg
            )
        )
        SELECT p.doc_id, CAST(p.idx AS BIGINT) AS span_idx,
               p.x AS x_q, p.y AS y_q
        FROM dp_kept kp
        JOIN dp_pts p ON p.doc_id = kp.doc_id AND p.idx = kp.idx"""


def od_matrix(documents, batch_size: int | None = None):
    """Origin→destination flow matrix: each document contributes one flow
    from the CELL of its first geo span to the CELL of its last (in span
    order); flows aggregate to exact counts per (o_cell, d_cell) — the
    OD-matrix rollup movement pipelines build from entity tracks.

    Exactness: endpoints are integer cell ids picked by span order;
    counts are int64 — bit-stable under any partitioning.

    Scale shape: endpoint extraction is row-local (same boundary mask as
    :func:`doc_trajectory`); per-batch Arrow group counts shrink the
    exchange to one (o_cell, d_cell, n) row per pair per batch, combined
    by the bucketed integer sum.  Docs with one geo span count as a
    self-flow (o = d); docs with none produce no row.

    Output: (o_cell:int64, d_cell:int64, n_docs:int64).
    """
    from .zonal import bucketed_sum

    def fn(batch: pa.Table) -> pa.Table:
        g = parse_geo_batch(batch)
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "o_cell": pa.array([], pa.int64()),
                    "d_cell": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        doc = g.column("doc_id")
        if isinstance(doc, pa.ChunkedArray):
            doc = doc.combine_chunks()
        cell = g.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if n > 1:
            same = pc.equal(doc.slice(1), doc.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        else:
            same = np.zeros(0, bool)
        starts = np.concatenate(
            [np.zeros(1, np.int64), np.nonzero(~same)[0].astype(np.int64) + 1]
        )
        ends = np.concatenate([starts[1:] - 1, np.array([n - 1], np.int64)])
        t = pa.table(
            {
                "o_cell": pa.array(cell[starts]),
                "d_cell": pa.array(cell[ends]),
            }
        )
        grp = t.group_by(["o_cell", "d_cell"]).aggregate([([], "count_all")])
        return grp.rename_columns(["o_cell", "d_cell", "n_docs"])

    partial = documents.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
    return bucketed_sum(partial, ["o_cell", "d_cell"], ["n_docs"])


def od_matrix_sql(geo_sql: str) -> str:
    """Oracle twin of :func:`od_matrix`: arg_min/arg_max cell endpoints on
    the unique span_idx, grouped counts."""
    return f"""
        od_in AS MATERIALIZED ({geo_sql}),
        od_e AS (
            SELECT doc_id,
                   arg_min(cell_id, span_idx) AS o_cell,
                   arg_max(cell_id, span_idx) AS d_cell
            FROM od_in GROUP BY doc_id
        )
        SELECT o_cell, d_cell, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM od_e GROUP BY 1, 2"""


def cell_covisit(documents, batch_size: int | None = None):
    """Co-visitation (market-basket co-occurrence) edges: for every pair
    of DISTINCT cells visited by the same document, the number of
    documents visiting both — the item-item co-occurrence primitive
    recommendation / place-affinity pipelines build from entity tracks.

    Exactness: within-doc cells dedupe first (a doc revisiting a cell
    never double-counts a pair); pairs are (a < b) integer cell ids;
    counts are int64 — bit-stable under any partitioning.

    Scale shape: pair expansion is row-local with a BOUNDED fan-out
    (≤ k(k-1)/2 pairs for a k-cell doc, k ≤ spans-per-doc) via one
    segmented triangular numpy expansion across the whole batch — zero
    per-doc Python; per-batch Arrow group counts shrink the exchange to
    one (cell_a, cell_b, n) row per distinct pair per batch, combined by
    the bucketed integer sum.

    Output: (cell_a:int64, cell_b:int64, n_docs:int64).
    """
    from .zonal import bucketed_sum

    empty = pa.table(
        {
            "cell_a": pa.array([], pa.int64()),
            "cell_b": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
        }
    )

    def fn(batch: pa.Table) -> pa.Table:
        g = parse_geo_batch(batch)
        n = g.num_rows
        if n == 0:
            return empty
        doc = g.column("doc_id")
        if isinstance(doc, pa.ChunkedArray):
            doc = doc.combine_chunks()
        cell = g.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if n > 1:
            same = pc.equal(doc.slice(1), doc.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        else:
            same = np.zeros(0, bool)
        gnum = np.concatenate([[0], np.cumsum(~same)]).astype(np.int64)
        # within-doc distinct cells, sorted ascending per doc
        order = np.lexsort((cell, gnum))
        gs, cs = gnum[order], cell[order]
        first = np.ones(len(gs), bool)
        first[1:] = (gs[1:] != gs[:-1]) | (cs[1:] != cs[:-1])
        gs, cs = gs[first], cs[first]
        # segmented triangular pair expansion: element e (group-sorted)
        # pairs with the c_e elements after it in the same group
        m = len(gs)
        if m == 0:
            return empty
        # exclusive end of each row's group = (nearest last-position ≥ e)+1:
        # seed non-last rows with +inf, reverse MIN-accumulate
        last = np.ones(m, bool)
        last[:-1] = gs[1:] != gs[:-1]
        gend = np.full(m, np.iinfo(np.int64).max, np.int64)
        lp = np.nonzero(last)[0]
        gend[lp] = lp + 1
        np.minimum.accumulate(gend[::-1], out=gend[::-1])
        c_e = gend - np.arange(m) - 1
        P = int(c_e.sum())
        if P == 0:
            return empty
        a_idx = np.repeat(np.arange(m, dtype=np.int64), c_e)
        off = np.zeros(m, np.int64)
        np.cumsum(c_e[:-1], out=off[1:])
        t = np.arange(P, dtype=np.int64) - off[a_idx]
        b_idx = a_idx + 1 + t
        tb = pa.table({"cell_a": pa.array(cs[a_idx]), "cell_b": pa.array(cs[b_idx])})
        grp = tb.group_by(["cell_a", "cell_b"]).aggregate([([], "count_all")])
        return grp.rename_columns(["cell_a", "cell_b", "n_docs"])

    partial = documents.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
    return bucketed_sum(partial, ["cell_a", "cell_b"], ["n_docs"])


def cell_covisit_sql(cells_sql: str) -> str:
    """Oracle twin of :func:`cell_covisit`: distinct (doc, cell), ordered
    self-join, grouped counts."""
    return f"""
        cv_in AS MATERIALIZED ({cells_sql}),
        cv_d AS (SELECT DISTINCT doc_id, cell_id FROM cv_in),
        cv_p AS (
            SELECT a.cell_id AS cell_a, b.cell_id AS cell_b
            FROM cv_d a JOIN cv_d b
              ON a.doc_id = b.doc_id AND a.cell_id < b.cell_id
        )
        SELECT cell_a, cell_b, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM cv_p GROUP BY 1, 2"""


HAUSDORFF_OD_CAP = 30


def trajectory_hausdorff(documents, cap: int = HAUSDORFF_OD_CAP, batch_size=None):
    """Trajectory-similarity join: symmetric SQUARED Hausdorff distance
    between every pair of document paths sharing an (origin, destination)
    cell — the shape-similarity measure trajectory pipelines use for
    route clustering / anomalous-track detection.

    Blocking rule (deterministic, replayed in SQL): docs with ≥ 2 geo
    spans, grouped by (first-cell, last-cell); per group only the ``cap``
    lexicographically-lowest doc_ids pair (the LSH hot-bucket-cap
    discipline — bounds the quadratic blowup of a hot OD pair).

    Exactness: coords quantize to int64 micro-degrees (the simplify_paths
    rule); h² = max(max_a min_b d², max_b min_a d²) is pure integer
    arithmetic (squared distances ≤ 2.6e17, no sqrt anywhere).

    Scale shape: path packing is row-local (one skinny list-column row
    per doc — ≤ spans-per-doc coord pairs — is ALL that shuffles); the
    per-OD-group kernel is one (k, k, n, n) numpy broadcast, k ≤ cap.

    Output: (doc_a, doc_b, h2:int64), doc_a < doc_b.
    """
    import pandas as pd

    def pack(batch: pa.Table) -> pa.Table:
        g = parse_geo_batch(batch)
        n = g.num_rows
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "o_cell": pa.array([], pa.int64()),
                "d_cell": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "xs": pa.array([], pa.list_(pa.int64())),
                "ys": pa.array([], pa.list_(pa.int64())),
            }
        )
        if n == 0:
            return empty
        doc = g.column("doc_id")
        if isinstance(doc, pa.ChunkedArray):
            doc = doc.combine_chunks()
        lon = g.column("lon").to_numpy(zero_copy_only=False)
        lat = g.column("lat").to_numpy(zero_copy_only=False)
        x = np.floor(lon * float(SIMPLIFY_COORD_SCALE)).astype(np.int64)
        y = np.floor(lat * float(SIMPLIFY_COORD_SCALE)).astype(np.int64)
        cell = g.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        if n > 1:
            same = pc.equal(doc.slice(1), doc.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        else:
            same = np.zeros(0, bool)
        starts = np.concatenate(
            [np.zeros(1, np.int64), np.nonzero(~same)[0].astype(np.int64) + 1]
        )
        counts = np.diff(np.concatenate([starts, np.array([n], np.int64)]))
        ends = starts + counts - 1
        offs = np.concatenate([starts, np.array([n], np.int64)]).astype(np.int32)
        t = pa.table(
            {
                "doc_id": doc.take(pa.array(starts)),
                "o_cell": pa.array(cell[starts]),
                "d_cell": pa.array(cell[ends]),
                "n": pa.array(counts.astype(np.int64)),
                "xs": pa.ListArray.from_arrays(pa.array(offs), pa.array(x)),
                "ys": pa.ListArray.from_arrays(pa.array(offs), pa.array(y)),
            }
        )
        return t.filter(pc.greater_equal(t.column("n"), 2))

    packed = documents.map_batches(pack, batch_format="pyarrow", batch_size=batch_size)

    BIG = np.int64(1) << 62

    def per_od(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort").head(cap)
        k = len(df)
        if k < 2:
            # Arrow-typed empty (pandas str empties trip Ray's block-size
            # estimator: np.vectorize on size-0 input)
            return pa.table(
                {
                    "doc_a": pa.array([], pa.string()),
                    "doc_b": pa.array([], pa.string()),
                    "h2": pa.array([], pa.int64()),
                }
            )
        ns = df["n"].to_numpy(np.int64)
        mx = int(ns.max())
        X = np.zeros((k, mx), np.int64)
        Y = np.zeros((k, mx), np.int64)
        V = np.zeros((k, mx), bool)
        for i, (xs, ys, m) in enumerate(zip(df["xs"], df["ys"], ns)):
            X[i, :m] = np.asarray(xs, np.int64)
            Y[i, :m] = np.asarray(ys, np.int64)
            V[i, :m] = True
        dx = X[:, None, :, None] - X[None, :, None, :]
        dy = Y[:, None, :, None] - Y[None, :, None, :]
        D = dx * dx + dy * dy  # (k, k, n_a, n_b)
        D = np.where(V[None, :, None, :], D, BIG)  # invalid b-points
        m_ab = D.min(axis=3)  # (k, k, n_a): nearest b per a-point
        m_ab = np.where(V[:, None, :], m_ab, np.int64(-1))
        H = m_ab.max(axis=2)  # directed h²(a→b)
        H2 = np.maximum(H, H.T)
        ia, ib = np.triu_indices(k, 1)
        ids = df["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_a": pa.array(ids[ia], pa.string()),
                "doc_b": pa.array(ids[ib], pa.string()),
                "h2": pa.array(H2[ia, ib]),
            }
        )

    return packed.groupby(["o_cell", "d_cell"]).map_groups(
        per_od, batch_format="pandas"
    )


def trajectory_hausdorff_sql(cells_sql: str, cap: int = HAUSDORFF_OD_CAP) -> str:
    """Oracle twin of :func:`trajectory_hausdorff`: arg_min/arg_max OD
    cells, QUALIFY cap, ordered self-join, min-per-point → max-per-pair
    in both directions, GREATEST."""
    s = SIMPLIFY_COORD_SCALE
    return f"""
        hd_in AS MATERIALIZED ({cells_sql}),
        hd_pts AS (
            SELECT doc_id, span_idx,
                   CAST(floor(lon * {float(s)!r}) AS BIGINT) AS x,
                   CAST(floor(lat * {float(s)!r}) AS BIGINT) AS y,
                   cell_id
            FROM hd_in
        ),
        hd_doc AS (
            SELECT doc_id,
                   arg_min(cell_id, span_idx) AS o_cell,
                   arg_max(cell_id, span_idx) AS d_cell
            FROM hd_pts GROUP BY doc_id HAVING COUNT(*) >= 2
        ),
        hd_cap AS (
            SELECT doc_id, o_cell, d_cell FROM hd_doc
            QUALIFY row_number() OVER (
                PARTITION BY o_cell, d_cell ORDER BY doc_id
            ) <= {cap}
        ),
        hd_pair AS (
            SELECT a.doc_id AS da, b.doc_id AS db
            FROM hd_cap a JOIN hd_cap b
              ON a.o_cell = b.o_cell AND a.d_cell = b.d_cell
             AND a.doc_id < b.doc_id
        ),
        hd_ab AS (
            SELECT p.da, p.db, pa.span_idx AS si,
                   MIN((pa.x - pb.x) * (pa.x - pb.x)
                     + (pa.y - pb.y) * (pa.y - pb.y)) AS m
            FROM hd_pair p
            JOIN hd_pts pa ON pa.doc_id = p.da
            JOIN hd_pts pb ON pb.doc_id = p.db
            GROUP BY 1, 2, 3
        ),
        hd_ba AS (
            SELECT p.da, p.db, pb.span_idx AS si,
                   MIN((pa.x - pb.x) * (pa.x - pb.x)
                     + (pa.y - pb.y) * (pa.y - pb.y)) AS m
            FROM hd_pair p
            JOIN hd_pts pa ON pa.doc_id = p.da
            JOIN hd_pts pb ON pb.doc_id = p.db
            GROUP BY 1, 2, 3
        ),
        hd_1 AS (SELECT da, db, MAX(m) AS h FROM hd_ab GROUP BY 1, 2),
        hd_2 AS (SELECT da, db, MAX(m) AS h FROM hd_ba GROUP BY 1, 2)
        SELECT hd_1.da AS doc_a, hd_1.db AS doc_b,
               CAST(GREATEST(hd_1.h, hd_2.h) AS BIGINT) AS h2
        FROM hd_1 JOIN hd_2 ON hd_2.da = hd_1.da AND hd_2.db = hd_1.db"""


def media_geo_context(documents, batch_size: int | None = None):
    """Cross-modal in-document join: every MEDIA span annotated with the
    grid cell of its nearest GEO span in the SAME document (nearest by
    span-index distance, ties → the earlier geo span) — how an interleaved
    text+media corpus geolocates its imagery/audio for training-data
    curation (crop selection, dedup by location, per-region sampling).

    Exactness: winners are pure integer comparisons on span indexes;
    output cells are the int64 morton ids.  Media spans in documents with
    NO geo span report ctx_cell = ctx_span = −1.

    Scale shape: row-local — both sides of the join live in one document
    row, so the whole match is a stateless vectorized pass (per-batch
    searchsorted of media span indexes into each doc's geo indexes via
    flat offset arithmetic); zero shuffle at any corpus size.

    Output: (doc_id, span_idx:int64 [media], media_ref,
    ctx_span:int64, ctx_cell:int64).
    """

    def fn(batch: pa.Table) -> pa.Table:
        spans_col = batch.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        offsets = spans_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lengths = np.diff(offsets)
        doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
        span_idx = np.arange(
            offsets[-1] - offsets[0], dtype=np.int64
        ) - np.repeat(offsets[:-1] - offsets[0], lengths)
        flat = spans_col.flatten()
        kinds = flat.field("kind").to_numpy(zero_copy_only=False)
        is_media = kinds == "media"
        is_geo = kinds == "geo"
        mi = np.nonzero(is_media)[0]
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "span_idx": pa.array([], pa.int64()),
                "media_ref": pa.array([], pa.string()),
                "ctx_span": pa.array([], pa.int64()),
                "ctx_cell": pa.array([], pa.int64()),
            }
        )
        if not len(mi):
            return empty
        # geo cells for the batch's geo spans, in flat order
        g = parse_geo_batch(batch)
        g_cell = g.column("cell_id").to_numpy(zero_copy_only=False).astype(np.int64)
        gi = np.nonzero(is_geo)[0]
        # for each media span, nearest geo span OF THE SAME DOC by |Δidx|;
        # geo flat positions are sorted, so searchsorted + left/right probe
        pos = np.searchsorted(gi, mi)
        n_g = len(gi)
        left = np.clip(pos - 1, 0, max(n_g - 1, 0))
        right = np.clip(pos, 0, max(n_g - 1, 0))
        ctx_span = np.full(len(mi), -1, np.int64)
        ctx_cell = np.full(len(mi), -1, np.int64)
        if n_g:
            same_l = doc_idx[gi[left]] == doc_idx[mi]
            same_r = doc_idx[gi[right]] == doc_idx[mi]
            dl = np.where(same_l, np.abs(span_idx[mi] - span_idx[gi[left]]),
                          np.int64(1) << 62)
            dr = np.where(same_r, np.abs(span_idx[gi[right]] - span_idx[mi]),
                          np.int64(1) << 62)
            # ties → earlier geo span = LEFT (smaller span_idx)
            use_left = dl <= dr
            win = np.where(use_left, left, right)
            hit = np.where(use_left, same_l, same_r)
            ctx_span[hit] = span_idx[gi[win[hit]]]
            ctx_cell[hit] = g_cell[win[hit]]
        return pa.table(
            {
                "doc_id": batch.column("doc_id").take(pa.array(doc_idx[mi])),
                "span_idx": pa.array(span_idx[mi]),
                "media_ref": flat.field("media_ref").take(pa.array(mi)),
                "ctx_span": pa.array(ctx_span),
                "ctx_cell": pa.array(ctx_cell),
            }
        )

    return documents.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def media_geo_context_sql(media_sql: str, cells_sql: str) -> str:
    """Oracle twin of :func:`media_geo_context`: within-doc min_by over
    (|Δidx|, geo span_idx) — the identical nearest/tie rule."""
    return f"""
        mgc_m AS MATERIALIZED ({media_sql}),
        mgc_g AS MATERIALIZED ({cells_sql}),
        mgc_n AS (
            -- arg_min on the composite (|Δidx|, geo span_idx) integer key:
            -- span counts per doc are far below 2^20, so the packed key
            -- preserves the lexicographic tie rule exactly (struct-tuple
            -- min measured ~10× slower for the same answer)
            SELECT m.doc_id, m.span_idx, m.media_ref,
                   arg_min(g.span_idx,
                           abs(m.span_idx - g.span_idx) * 1048576
                           + g.span_idx) AS ctx_span,
                   arg_min(g.cell_id,
                           abs(m.span_idx - g.span_idx) * 1048576
                           + g.span_idx) AS ctx_cell
            FROM mgc_m m JOIN mgc_g g ON g.doc_id = m.doc_id
            GROUP BY m.doc_id, m.span_idx, m.media_ref
        )
        SELECT m.doc_id, CAST(m.span_idx AS BIGINT) AS span_idx, m.media_ref,
               CAST(COALESCE(n.ctx_span, -1) AS BIGINT) AS ctx_span,
               CAST(COALESCE(n.ctx_cell, -1) AS BIGINT) AS ctx_cell
        FROM mgc_m m LEFT JOIN mgc_n n
          ON n.doc_id = m.doc_id AND n.span_idx = m.span_idx"""


def turn_stats(documents, batch_size: int | None = None):
    """Movement-behavior rollup: per document, counts of LEFT / RIGHT /
    STRAIGHT turns along its geo-span path — turn direction is the SIGN
    of the integer cross product of consecutive step vectors (micro-degree
    quantized), so the statistic is pure integer arithmetic with no angle
    math anywhere.

    Scale shape: row-local (the doc_trajectory boundary-mask discipline):
    consecutive-step cross products are one vectorized pass with interior
    triples masked at doc boundaries; zero shuffle, zero per-doc Python.
    Docs with < 3 geo spans report zero turns (they have no interior
    vertex).

    Output: (doc_id, n_geo, n_left, n_right, n_straight) — int64.
    """

    def fn(batch: pa.Table) -> pa.Table:
        g = parse_geo_batch(batch)
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "n_geo": pa.array([], pa.int64()),
                    "n_left": pa.array([], pa.int64()),
                    "n_right": pa.array([], pa.int64()),
                    "n_straight": pa.array([], pa.int64()),
                }
            )
        doc = g.column("doc_id")
        if isinstance(doc, pa.ChunkedArray):
            doc = doc.combine_chunks()
        lon = g.column("lon").to_numpy(zero_copy_only=False)
        lat = g.column("lat").to_numpy(zero_copy_only=False)
        x = np.floor(lon * float(SIMPLIFY_COORD_SCALE)).astype(np.int64)
        y = np.floor(lat * float(SIMPLIFY_COORD_SCALE)).astype(np.int64)
        if n > 1:
            same = pc.equal(doc.slice(1), doc.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        else:
            same = np.zeros(0, bool)
        starts = np.concatenate(
            [np.zeros(1, np.int64), np.nonzero(~same)[0].astype(np.int64) + 1]
        )
        counts = np.diff(np.concatenate([starts, np.array([n], np.int64)]))
        # interior vertex i (has i-1 and i+1 in the SAME doc): cross of
        # steps (i-1→i) and (i→i+1)
        interior = np.zeros(n, bool)
        if n > 2:
            interior[1:-1] = same[:-1] & same[1:]
        cr = np.zeros(n, np.int64)
        if n > 2:
            ax = x[1:-1] - x[:-2]
            ay = y[1:-1] - y[:-2]
            bx = x[2:] - x[1:-1]
            by = y[2:] - y[1:-1]
            cr[1:-1] = ax * by - ay * bx
        left = ((cr > 0) & interior).astype(np.int64)
        right = ((cr < 0) & interior).astype(np.int64)
        straight = ((cr == 0) & interior).astype(np.int64)
        nl = np.add.reduceat(left, starts)
        nr = np.add.reduceat(right, starts)
        ns = np.add.reduceat(straight, starts)
        return pa.table(
            {
                "doc_id": doc.take(pa.array(starts)),
                "n_geo": pa.array(counts.astype(np.int64)),
                "n_left": pa.array(nl),
                "n_right": pa.array(nr),
                "n_straight": pa.array(ns),
            }
        )

    return documents.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def turn_stats_sql(geo_sql: str) -> str:
    """Oracle twin of :func:`turn_stats`: LAG/LEAD coordinate windows in
    span order, the identical integer cross-product sign rule."""
    s = SIMPLIFY_COORD_SCALE
    return f"""
        tn_p AS (
            SELECT doc_id, span_idx,
                   CAST(floor(lon * {float(s)!r}) AS BIGINT) AS x,
                   CAST(floor(lat * {float(s)!r}) AS BIGINT) AS y
            FROM ({geo_sql})
        ),
        tn_w AS (
            SELECT doc_id,
                   lag(x) OVER w AS px, lag(y) OVER w AS py,
                   x, y,
                   lead(x) OVER w AS nx, lead(y) OVER w AS ny
            FROM tn_p
            WINDOW w AS (PARTITION BY doc_id ORDER BY span_idx)
        ),
        tn_c AS (
            SELECT doc_id,
                   CASE WHEN px IS NULL OR nx IS NULL THEN NULL
                        ELSE (x - px) * (ny - y) - (y - py) * (nx - x)
                   END AS cr
            FROM tn_w
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_geo,
               CAST(COALESCE(SUM(CASE WHEN cr > 0 THEN 1 END), 0) AS BIGINT)
                   AS n_left,
               CAST(COALESCE(SUM(CASE WHEN cr < 0 THEN 1 END), 0) AS BIGINT)
                   AS n_right,
               CAST(COALESCE(SUM(CASE WHEN cr = 0 THEN 1 END), 0) AS BIGINT)
                   AS n_straight
        FROM tn_c GROUP BY doc_id"""


QUARANTINE_MOD = 13  # every fnv1a(doc_id) % 13 == 0 doc gets corrupted
GEO_SPAN_RE = (
    r"^-?[0-9][0-9.]*;-?[0-9][0-9.]*;[0-9]+;[0-9]+;"
    r"-?[0-9][0-9.]*(,-?[0-9][0-9.]*){5}$"
)


def geo_texts_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, spans) batch → one row per GEO span (doc_id, span_idx,
    text) — the RAW pre-parse view quarantine validation runs on."""
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lengths = np.diff(offsets)
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
    span_idx = np.arange(offsets[-1] - offsets[0], dtype=np.int64) - np.repeat(
        offsets[:-1] - offsets[0], lengths
    )
    flat = spans.flatten()
    is_geo = pc.equal(flat.field("kind"), "geo").to_numpy(zero_copy_only=False)
    gi = np.nonzero(is_geo)[0]
    return pa.table(
        {
            "doc_id": batch.column("doc_id").take(pa.array(doc_idx[gi])),
            "span_idx": pa.array(span_idx[gi].astype(np.int64)),
            "text": flat.field("text").take(pa.array(gi)),
        }
    )


def parse_quarantine(documents, batch_size: int | None = None):
    """Poison-pill tolerance report: validate every geo span against the
    format grammar BEFORE parsing, quarantine non-conforming spans, and
    selectively parse only the valid ones — the bad-record discipline a
    100 TB ingest needs (one malformed row must never kill a task).

    The gate corpus is all well-formed, so the query DERIVES a corrupted
    variant deterministically on BOTH sides (the _dup_docs discipline):
    every doc with fnv1a(doc_id) % 13 == 0 has its geo spans' ';'
    separators replaced — unparseable by construction.

    Validation is one anchored RE2 match (:data:`GEO_SPAN_RE`) — the same
    regex engine family as the DuckDB oracle's regexp_full_match; parsing
    of the surviving rows extracts the year field, and sum_year proves the
    selective parse really ran (not just the counting).

    Output: (status ∈ {ok, quarantined}, n_spans, n_docs, sum_year).
    """
    from ..state.hashing import fnv1a_arr
    from .zonal import bucketed_sum

    def fn(batch: pa.Table) -> pa.Table:
        g = geo_texts_batch(batch)
        if g.num_rows == 0:
            return pa.table(
                {
                    "status": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.string()),
                    "n_spans": pa.array([], pa.int64()),
                    "sum_year": pa.array([], pa.int64()),
                }
            )
        text = g.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        h = fnv1a_arr(g.column("doc_id"))
        bad_doc = (h % np.uint64(QUARANTINE_MOD)) == 0
        corrupted = pc.replace_substring(text, ";", "~")
        text = pc.if_else(pa.array(bad_doc), corrupted, text)
        ok = pc.match_substring_regex(text, GEO_SPAN_RE).to_numpy(
            zero_copy_only=False
        )
        # selective parse: year extracted ONLY from validated spans
        year = np.zeros(len(ok), np.int64)
        oki = np.nonzero(ok)[0]
        if len(oki):
            parts = pc.split_pattern(text.take(pa.array(oki)), ";")
            year[oki] = (
                pc.list_element(parts, 2)
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False)
            )
        status = pa.array(np.where(ok, "ok", "quarantined"))
        t = pa.table(
            {
                "status": status,
                "doc_id": g.column("doc_id"),
                "one": pa.array(np.ones(len(ok), np.int64)),
                "year": pa.array(year),
            }
        )
        agg = t.group_by(["status", "doc_id"]).aggregate(
            [("one", "sum"), ("year", "sum")]
        )
        return agg.rename_columns(["status", "doc_id", "n_spans", "sum_year"])

    per_doc = bucketed_sum(
        documents.map_batches(fn, batch_format="pyarrow", batch_size=batch_size),
        ["status", "doc_id"],
        ["n_spans", "sum_year"],
    )

    def final(t: pa.Table) -> pa.Table:
        g = t.group_by(["status"]).aggregate(
            [("n_spans", "sum"), ([], "count_all"), ("sum_year", "sum")]
        )
        return g.rename_columns(["status", "n_spans", "n_docs", "sum_year"])

    return bucketed_sum(
        per_doc.map_batches(final, batch_format="pyarrow"),
        ["status"],
        ["n_spans", "n_docs", "sum_year"],
    )


def parse_quarantine_sql(raw_geo_sql: str) -> str:
    """Oracle twin of :func:`parse_quarantine` over a subquery exposing the
    RAW (doc_id, text) geo-span rows: identical fnv1a corruption rule,
    regexp_full_match against the same grammar, selective year parse."""
    from ..state import sqlhash as SH

    h = SH.fnv1a_chars("doc_id")
    # GEO_SPAN_RE is anchored for Arrow's substring matcher; full_match
    # needs the unanchored body
    body = GEO_SPAN_RE[1:-1]
    return f"""
        qr_in AS MATERIALIZED ({raw_geo_sql}),
        qr_c AS (
            SELECT doc_id,
                   CASE WHEN ({h}) % {QUARANTINE_MOD} = 0
                        THEN replace(text, ';', '~') ELSE text END AS text
            FROM qr_in
        ),
        qr_v AS (
            SELECT doc_id,
                   CASE WHEN regexp_full_match(text, '{body}')
                        THEN 'ok' ELSE 'quarantined' END AS status,
                   CASE WHEN regexp_full_match(text, '{body}')
                        THEN CAST(string_split(text, ';')[3] AS BIGINT)
                        ELSE 0 END AS year
            FROM qr_c
        )
        SELECT status, CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(SUM(year) AS BIGINT) AS sum_year
        FROM qr_v GROUP BY status"""


PATH_DENSITY_SAMPLES = 8  # power of two: midpoints (2s+1)/16 are exact doubles


def path_density(documents, samples: int = PATH_DENSITY_SAMPLES, batch_size=None):
    """Trajectory rasterization — the LINE-density raster: every
    consecutive geo-span pair in a document's span-ordered path is sampled
    at the midpoints of ``samples`` uniform subdivisions, each sample is
    assigned its grid cell, and the per-cell totals (sample count + how
    many distinct documents cross the cell) form the corridor/utilization
    map — the vector→raster companion of :func:`od_matrix` (which keeps
    only endpoints).  Reference analog: painting vector features onto the
    pixel grid (`src/utils/s2process.py:172` paint; our M21).

    Exactness: with ``samples`` a power of two the parameters
    t = (2s+1)/(2·samples) are exact binary doubles, the interpolation
    ``lon0 + (lon1−lon0)·t`` is two IEEE ops mirrored verbatim in SQL, and
    the cell id reuses the pinned ``grid_coords``/``morton`` arithmetic.
    Counts are exact integers.

    Scale shape: row-local explode — a document is ONE input row, so its
    segments and their samples never leave the batch; n_docs is exact from
    per-batch distinct (cell, doc) pairs because a doc contributes from
    exactly one batch; only skinny (cell, n, n_docs) partials enter the
    ONE bucketed combine.  Fan-out is segments×samples ≈ 8× the geo rows —
    bounded, and the in-batch group collapses it before the shuffle.

    Output: (cell_id:int64, n_samples:int64, n_docs:int64).
    """
    from ..state.cells import CELL_LEVEL, encode
    from .zonal import bucketed_sum

    two_s = 2.0 * float(samples)
    t_par = (2.0 * np.arange(samples, dtype=np.float64) + 1.0) / two_s

    def fn(batch: pa.Table) -> pa.Table:
        g = parse_geo_batch(batch)  # doc-contiguous, span-ordered
        n = g.num_rows
        empty = pa.table(
            {
                "cell_id": pa.array([], pa.int64()),
                "n_samples": pa.array([], pa.int64()),
                "n_docs": pa.array([], pa.int64()),
            }
        )
        if n < 2:
            return empty
        doc = g.column("doc_id")
        if isinstance(doc, pa.ChunkedArray):
            doc = doc.combine_chunks()
        lon = g.column("lon").to_numpy(zero_copy_only=False)
        lat = g.column("lat").to_numpy(zero_copy_only=False)
        same = pc.equal(doc.slice(1), doc.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
        seg = np.nonzero(same)[0]  # segment i: rows (seg, seg+1)
        if len(seg) == 0:
            return empty
        lon0, lat0 = lon[seg], lat[seg]
        dlon, dlat = lon[seg + 1] - lon0, lat[seg + 1] - lat0
        plon = (lon0[:, None] + dlon[:, None] * t_par[None, :]).ravel()
        plat = (lat0[:, None] + dlat[:, None] * t_par[None, :]).ravel()
        cell = encode(plon, plat, CELL_LEVEL).astype(np.int64)
        # doc ordinal per sample: doc runs are contiguous, so the doc of
        # segment i is the run id at row i
        run_id = np.cumsum(np.concatenate(([0], (~same).astype(np.int64))))
        doc_ord = np.repeat(run_id[seg], samples)
        cells_u, n_samp = np.unique(cell, return_counts=True)
        pair = cell * np.int64(n) + doc_ord  # cell < 2^24, doc_ord < n
        pairs_u = np.unique(pair)
        pc_cell, n_doc = np.unique(pairs_u // np.int64(n), return_counts=True)
        assert np.array_equal(cells_u, pc_cell)
        return pa.table(
            {
                "cell_id": pa.array(cells_u),
                "n_samples": pa.array(n_samp.astype(np.int64)),
                "n_docs": pa.array(n_doc.astype(np.int64)),
            }
        )

    partial = documents.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
    return bucketed_sum(partial, ["cell_id"], ["n_samples", "n_docs"])


def path_density_sql(geo_sql: str, samples: int = PATH_DENSITY_SAMPLES) -> str:
    """Oracle twin of :func:`path_density`: LEAD window in span order,
    identical midpoint parameters and two-op IEEE interpolation, the same
    pinned grid/morton cell arithmetic, COUNT + COUNT(DISTINCT doc_id)."""
    from ..state.cells import CELL_LEVEL, grid_coord_sql_expr, morton_sql_expr

    two_s = float(2 * samples)
    ix = grid_coord_sql_expr("plon", 180.0, 360.0, CELL_LEVEL)
    iy = grid_coord_sql_expr("plat", 90.0, 180.0, CELL_LEVEL)
    return f"""
        pd_in AS MATERIALIZED ({geo_sql}),
        pd_seg AS (
            SELECT doc_id, lon, lat,
                   lead(lon) OVER w AS nlon, lead(lat) OVER w AS nlat
            FROM pd_in
            WINDOW w AS (PARTITION BY doc_id ORDER BY span_idx)
        ),
        pd_pts AS (
            SELECT g.doc_id,
                   g.lon + (g.nlon - g.lon)
                       * ((2 * s.s + 1) / {two_s!r}) AS plon,
                   g.lat + (g.nlat - g.lat)
                       * ((2 * s.s + 1) / {two_s!r}) AS plat
            FROM pd_seg g
            CROSS JOIN (SELECT unnest(generate_series(0, {samples - 1}))
                        AS s) s
            WHERE g.nlon IS NOT NULL
        ),
        pd_cells AS (
            SELECT doc_id, {morton_sql_expr(ix, iy, CELL_LEVEL)} AS cell_id
            FROM pd_pts
        )
        SELECT cell_id,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM pd_cells GROUP BY cell_id"""


def stay_points(documents, eps: float = 2.0, min_pts: int = 2, batch_size: int | None = None):
    """Stay-point (dwell) detection over each document's ordered geo
    trajectory — the classic trajectory-mining primitive (Li et al.'s
    greedy anchor rule, count-based): scanning spans in order, the
    anchor is the first point of the current dwell; a point within
    ``eps`` (planar degrees) of the anchor extends the dwell, otherwise
    it becomes the new anchor; maximal runs of ≥ ``min_pts`` points are
    reported.

    Exactness: the d² ≤ eps² test uses the identical double expression
    on both sides; all output values are exact copies (anchor lon/lat,
    span indexes) or integer counts.  Scale shape: row-local like
    :func:`doc_trajectory` (a document is ONE input row) — the greedy
    recurrence is evaluated in LOCKSTEP across the whole batch, one
    vectorized pass per span position (≤ max-spans-per-doc iterations,
    not per-point Python); runs collapse with ranges-from-counts
    arithmetic.  Zero shuffle.

    Output: (doc_id:string, anchor_span:int64, n_pts:int64,
    start_span:int64, end_span:int64, lon:f64, lat:f64).
    """
    eps2 = eps * eps

    def fn(batch: pa.Table) -> pa.Table:
        g = parse_geo_batch(batch)
        n = g.num_rows
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.string()),
                "anchor_span": pa.array([], pa.int64()),
                "n_pts": pa.array([], pa.int64()),
                "start_span": pa.array([], pa.int64()),
                "end_span": pa.array([], pa.int64()),
                "lon": pa.array([], pa.float64()),
                "lat": pa.array([], pa.float64()),
            }
        )
        if n == 0:
            return empty
        doc = g.column("doc_id")
        if isinstance(doc, pa.ChunkedArray):
            doc = doc.combine_chunks()
        lon = g.column("lon").to_numpy(zero_copy_only=False)
        lat = g.column("lat").to_numpy(zero_copy_only=False)
        sidx = g.column("span_idx").to_numpy(zero_copy_only=False).astype(np.int64)
        if n > 1:
            same = pc.equal(doc.slice(1), doc.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
        else:
            same = np.zeros(0, bool)
        starts = np.concatenate(
            [np.zeros(1, np.int64), np.nonzero(~same)[0].astype(np.int64) + 1]
        )
        lens = np.diff(np.concatenate([starts, np.array([n], np.int64)]))
        loc = np.arange(n, dtype=np.int64) - np.repeat(starts, lens)
        anchors = np.arange(n, dtype=np.int64)  # loc-0 rows anchor themselves
        # lockstep greedy recurrence: span position k across every doc
        for k in range(1, int(lens.max())):
            at = np.nonzero(loc == k)[0]
            if at.shape[0] == 0:
                break
            a = anchors[at - 1]
            dx = lon[at] - lon[a]
            dy = lat[at] - lat[a]
            within = (dx * dx + dy * dy) <= eps2
            anchors[at] = np.where(within, a, at)
        # maximal anchor runs (anchors only move forward, so equal-anchor
        # rows are contiguous)
        brk = np.concatenate(
            ([True], anchors[1:] != anchors[:-1])
        )
        rs = np.nonzero(brk)[0].astype(np.int64)
        rlen = np.diff(np.concatenate([rs, np.array([n], np.int64)]))
        keep = rlen >= min_pts
        rs, rlen = rs[keep], rlen[keep]
        a = anchors[rs]
        return pa.table(
            {
                "doc_id": doc.take(pa.array(rs)),
                "anchor_span": pa.array(sidx[a], pa.int64()),
                "n_pts": pa.array(rlen, pa.int64()),
                "start_span": pa.array(sidx[rs], pa.int64()),
                "end_span": pa.array(sidx[rs + rlen - 1], pa.int64()),
                "lon": pa.array(lon[a], pa.float64()),
                "lat": pa.array(lat[a], pa.float64()),
            }
        )

    return documents.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def stay_points_sql(geo_sql: str, eps: float = 2.0, min_pts: int = 2) -> str:
    """Oracle twin of :func:`stay_points`: a recursive CTE advances the
    identical greedy anchor recurrence one span position per level, then
    (doc, anchor) groups with the HAVING count rule.  Caller must open
    with ``WITH RECURSIVE``."""
    eps2 = eps * eps
    d2 = (
        "(s.lon - t.a_lon) * (s.lon - t.a_lon)"
        " + (s.lat - t.a_lat) * (s.lat - t.a_lat)"
    )
    return f"""
        sp_pts AS (
            SELECT doc_id, span_idx, lon, lat,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY span_idx
                   ) AS j
            FROM ({geo_sql})
        ),
        sp_st AS (
            SELECT doc_id, j, span_idx, lon, lat,
                   j AS aj, span_idx AS a_span, lon AS a_lon, lat AS a_lat
            FROM sp_pts WHERE j = 1
            UNION ALL
            SELECT s.doc_id, s.j, s.span_idx, s.lon, s.lat,
                   CASE WHEN {d2} <= {eps2!r} THEN t.aj ELSE s.j END,
                   CASE WHEN {d2} <= {eps2!r} THEN t.a_span
                        ELSE s.span_idx END,
                   CASE WHEN {d2} <= {eps2!r} THEN t.a_lon ELSE s.lon END,
                   CASE WHEN {d2} <= {eps2!r} THEN t.a_lat ELSE s.lat END
            FROM sp_st t JOIN sp_pts s
              ON s.doc_id = t.doc_id AND s.j = t.j + 1
        )
        SELECT doc_id, any_value(a_span) AS anchor_span,
               CAST(COUNT(*) AS BIGINT) AS n_pts,
               CAST(MIN(span_idx) AS BIGINT) AS start_span,
               CAST(MAX(span_idx) AS BIGINT) AS end_span,
               any_value(a_lon) AS lon, any_value(a_lat) AS lat
        FROM sp_st
        GROUP BY doc_id, aj
        HAVING COUNT(*) >= {min_pts}"""
