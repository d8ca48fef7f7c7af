"""Span parser vs DuckDB oracle + span-sequence invariant."""

import duckdb
import numpy as np
import pyarrow.parquet as pq

from kaza_lcms_ray.stages import spans


def _duck_geo(doc_glob: str):
    con = duckdb.connect()
    return con.sql(
        f"""
        SELECT doc_id, ord - 1 AS span_idx,
               CAST(parts[1] AS DOUBLE) AS lon,
               CAST(parts[2] AS DOUBLE) AS lat,
               CAST(parts[3] AS INT) AS "year",
               CAST(parts[4] AS INT) AS doy,
               CAST(b[1] AS DOUBLE) AS b0, CAST(b[4] AS DOUBLE) AS b3,
               CAST(round(CAST(b[4] AS DOUBLE) * 100, 0) AS BIGINT) AS c3
        FROM (
            SELECT doc_id, unnest(spans) AS span,
                   generate_subscripts(spans, 1) AS ord
            FROM read_parquet('{doc_glob}')
        ), LATERAL (SELECT string_split(span.text, ';') AS parts),
           LATERAL (SELECT string_split(parts[5], ',') AS b)
        WHERE span.kind = 'geo'
        ORDER BY doc_id, span_idx
        """
    ).df()


def test_parse_matches_duckdb(synth_small):
    tbl = pq.read_table(f"{synth_small}/documents/part-00000.parquet")
    ours = spans.parse_geo_batch(tbl).to_pandas().sort_values(["doc_id", "span_idx"]).reset_index(drop=True)
    oracle = _duck_geo(f"{synth_small}/documents/part-*.parquet")
    assert len(ours) == len(oracle) > 0
    assert (ours["doc_id"].to_numpy() == oracle["doc_id"].to_numpy()).all()
    for col in ("lon", "lat", "b0", "b3"):
        assert (ours[col].to_numpy() == oracle[col].to_numpy()).all(), col
    assert (ours["year"].to_numpy() == oracle["year"].to_numpy()).all()
    assert (ours["doy"].to_numpy() == oracle["doy"].to_numpy()).all()
    assert (ours["c3"].to_numpy() == oracle["c3"].to_numpy()).all()


def test_geo_obs_dataset(synth_small, ray_session):
    import ray.data as rd

    docs = rd.read_parquet(f"{synth_small}/documents")
    geo = spans.geo_obs(docs)
    n_rows = geo.count()
    oracle = _duck_geo(f"{synth_small}/documents/part-*.parquet")
    assert n_rows == len(oracle)


def test_span_sequence_invariant(synth_small, ray_session):
    """geo_obs is a side table: the documents dataset itself is untouched.
    Verify the spans fingerprint of every doc is identical before/after
    running the parse stage over the same dataset."""
    import ray.data as rd

    docs = rd.read_parquet(f"{synth_small}/documents")
    before = (
        docs.map_batches(spans.span_signature_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    _ = spans.geo_obs(docs).count()  # run the stage
    after = (
        docs.map_batches(spans.span_signature_batch, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (before["span_sig"].to_numpy() == after["span_sig"].to_numpy()).all()
    assert len(before) == 10_000


def test_offsets_monotone(synth_small):
    tbl = pq.read_table(f"{synth_small}/documents/part-00000.parquet")
    for row in tbl.slice(0, 50).to_pylist():
        offs = [s["offset"] for s in row["spans"]]
        assert offs[0] == 0
        assert all(b > a for a, b in zip(offs, offs[1:])) or len(offs) == 1


def test_span_sequence_invariant_through_document_filter(synth_small, ray_session):
    """A document-level semi-join keeps surviving rows' spans sequences
    byte-identical to the input (the north-rule per-row invariant,
    observed through a real filtering stage)."""
    import ray.data as rd

    from kaza_lcms_ray.pipelines import flagship

    survivors = flagship.filter_documents_in_aoi(synth_small)
    after = (
        survivors.map_batches(spans.span_signature_batch, batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")["span_sig"]
    )
    docs = rd.read_parquet(f"{synth_small}/documents")
    before = (
        docs.map_batches(spans.span_signature_batch, batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")["span_sig"]
    )
    assert 0 < len(after) < len(before)  # the filter actually filters
    joined = before.loc[after.index]
    assert (joined.to_numpy() == after.to_numpy()).all()


def test_column_profile_counts(ray_session):
    """Null and empty-string counts per column, exact under resharding."""
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages.spans import column_profile

    ds = rd.from_arrow(
        pa.table(
            {
                "a": [1, None, 3, 4],
                "b": ["", "x", None, ""],
            }
        )
    )
    for d in (ds, ds.repartition(3)):
        out = column_profile(d, ["a", "b"]).to_pandas().sort_values("column")
        assert out["n_rows"].tolist() == [4, 4]
        assert out["n_null"].tolist() == [1, 1]
        assert out["n_empty"].tolist() == [0, 2]


def test_doc_trajectory_bruteforce(synth_small, ray_session):
    """Per-doc path/net stats match a per-row Python replay of the same
    span-ordered fold (quantized steps, endpoint displacement), and are
    invariant to repartitioning (docs are row-local)."""
    import math

    import ray.data as rd

    docs = rd.read_parquet(f"{synth_small}/documents")
    out = (
        spans.doc_trajectory(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    out2 = (
        spans.doc_trajectory(docs.repartition(5))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.equals(out2)
    geo = spans.geo_obs(docs).to_pandas()
    S = float(spans.TRAJ_SCALE_INT)
    sample = out.sample(40, random_state=3)
    for _, r in sample.iterrows():
        g = geo[geo["doc_id"] == r["doc_id"]].sort_values("span_idx")
        assert r["n_geo"] == len(g)
        pq_sum = 0
        xs, ys = g["lon"].to_numpy(), g["lat"].to_numpy()
        for i in range(1, len(g)):
            d = math.sqrt(
                (xs[i] - xs[i - 1]) ** 2 + (ys[i] - ys[i - 1]) ** 2
            )
            pq_sum += int(math.floor(d * S))
        assert r["path_q"] == pq_sum
        assert r["path_len"] == pq_sum / S
        want_net = math.sqrt((xs[-1] - xs[0]) ** 2 + (ys[-1] - ys[0]) ** 2)
        assert r["net_disp"] == want_net


def test_od_matrix_bruteforce(synth_small, ray_session):
    """Flows match a pandas endpoint replay; counts sum to the number of
    docs with geo spans; partition-invariant."""
    import ray.data as rd

    docs = rd.read_parquet(f"{synth_small}/documents")
    out = (
        spans.od_matrix(docs)
        .to_pandas()
        .sort_values(["o_cell", "d_cell"])
        .reset_index(drop=True)
    )
    out2 = (
        spans.od_matrix(docs.repartition(5))
        .to_pandas()
        .sort_values(["o_cell", "d_cell"])
        .reset_index(drop=True)
    )
    assert out.equals(out2)
    geo = spans.geo_obs(docs).to_pandas().sort_values(["doc_id", "span_idx"])
    ends = geo.groupby("doc_id").agg(
        o_cell=("cell_id", "first"), d_cell=("cell_id", "last")
    )
    want = (
        ends.groupby(["o_cell", "d_cell"])
        .size()
        .reset_index(name="n_docs")
        .astype({"o_cell": "int64", "d_cell": "int64", "n_docs": "int64"})
        .sort_values(["o_cell", "d_cell"])
        .reset_index(drop=True)
    )
    assert out["n_docs"].sum() == geo["doc_id"].nunique()
    assert out.equals(want)


def test_media_geo_context_bruteforce(synth_small, ray_session):
    """Nearest-geo assignment matches a per-doc Python replay, ties go to
    the earlier geo span, and geo-less docs get -1 sentinels."""
    import ray.data as rd

    docs = rd.read_parquet(f"{synth_small}/documents")
    out = spans.media_geo_context(docs).to_pandas()
    assert len(out) > 0
    geo = spans.geo_obs(docs).to_pandas()
    gmap = {}
    for d, grp in geo.groupby("doc_id"):
        gmap[d] = list(zip(grp["span_idx"].tolist(), grp["cell_id"].tolist()))
    miss = out[out["ctx_span"] == -1]
    assert (miss["ctx_cell"] == -1).all()
    for _, r in out.sample(60, random_state=11).iterrows():
        g = gmap.get(r["doc_id"], [])
        if not g:
            assert r["ctx_span"] == -1 and r["ctx_cell"] == -1
            continue
        best = min(g, key=lambda sc: (abs(r["span_idx"] - sc[0]), sc[0]))
        assert (r["ctx_span"], r["ctx_cell"]) == best, r["doc_id"]


def test_simplify_paths_recursive_dp(synth_small, ray_session):
    """Vectorized worklist DP equals a per-doc recursive Python replay of
    the same pinned rule, and is repartition-invariant (row-local)."""
    import ray.data as rd

    docs = rd.read_parquet(f"{synth_small}/documents")
    out = (
        spans.simplify_paths(docs)
        .to_pandas()
        .sort_values(["doc_id", "span_idx"])
        .reset_index(drop=True)
    )
    out2 = (
        spans.simplify_paths(docs.repartition(5))
        .to_pandas()
        .sort_values(["doc_id", "span_idx"])
        .reset_index(drop=True)
    )
    assert out.equals(out2)

    geo = spans.geo_obs(docs).to_pandas()
    S = float(spans.SIMPLIFY_COORD_SCALE)
    eps = spans.SIMPLIFY_EPS_Q

    def dp(xs, ys):
        kept = {0, len(xs) - 1}

        def rec(i, j):
            if j <= i + 1:
                return
            dx, dy = xs[j] - xs[i], ys[j] - ys[i]
            best, bk = -1, -1
            for k in range(i + 1, j):
                c = abs(dx * (ys[k] - ys[i]) - dy * (xs[k] - xs[i]))
                if c > best:
                    best, bk = c, k
            if float(best) > eps * np.sqrt(float(dx * dx + dy * dy)):
                kept.add(bk)
                rec(i, bk)
                rec(bk, j)

        rec(0, len(xs) - 1)
        return kept

    dropped_somewhere = False
    for doc_id, g in list(geo.groupby("doc_id"))[:60]:
        g = g.sort_values("span_idx")
        xs = np.floor(g["lon"].to_numpy() * S).astype(np.int64)
        ys = np.floor(g["lat"].to_numpy() * S).astype(np.int64)
        kept = dp(list(map(int, xs)), list(map(int, ys)))
        want = sorted(g["span_idx"].to_numpy()[sorted(kept)])
        got = sorted(
            out[out["doc_id"] == doc_id]["span_idx"].tolist()
        )
        assert got == [int(w) for w in want], doc_id
        if len(kept) < len(g):
            dropped_somewhere = True
    assert dropped_somewhere  # the tolerance actually removes vertices


def test_cell_covisit_pairs_bruteforce(synth_small, ray_session):
    """Pair expansion equals an itertools brute force over per-doc distinct
    cells; within-doc revisits never double-count; repartition-invariant."""
    from itertools import combinations

    import ray.data as rd

    docs = rd.read_parquet(f"{synth_small}/documents")
    out = (
        spans.cell_covisit(docs)
        .to_pandas()
        .sort_values(["cell_a", "cell_b"])
        .reset_index(drop=True)
    )
    out2 = (
        spans.cell_covisit(docs.repartition(5))
        .to_pandas()
        .sort_values(["cell_a", "cell_b"])
        .reset_index(drop=True)
    )
    assert out.equals(out2)
    geo = spans.geo_obs(docs).to_pandas()
    want = {}
    for _, g in geo.groupby("doc_id"):
        for a, b in combinations(sorted(set(g["cell_id"].astype(int))), 2):
            want[(a, b)] = want.get((a, b), 0) + 1
    got = {
        (int(r.cell_a), int(r.cell_b)): int(r.n_docs)
        for r in out.itertuples()
    }
    assert got == want
    assert len(want) > 0


def test_trajectory_hausdorff_hand_case(ray_session):
    """Hand-built documents with shared OD endpoints: h2 equals the
    brute-force max-min of squared micro-degree distances; single-span and
    lone-OD docs produce no pairs."""
    import pyarrow as pa
    import ray.data as rd

    def doc(doc_id, pts):
        spans_ = [
            {
                "kind": "geo",
                "text": f"{lon};{lat};2022;100;0.1,0.1,0.1,0.1,0.1,0.1",
                "media_ref": "",
                "offset": i,
            }
            for i, (lon, lat) in enumerate(pts)
        ]
        return {"doc_id": doc_id, "spans": spans_}

    # A, B, C share first/last points (same OD cells); middles differ
    rows = [
        doc("a", [(10.0, 20.0), (10.2, 20.3), (10.5, 20.5)]),
        doc("b", [(10.0, 20.0), (10.3, 20.1), (10.5, 20.5)]),
        doc("c", [(10.0, 20.0), (10.5, 20.5)]),
        doc("lone", [(50.0, -20.0), (51.0, -21.0)]),  # unpaired OD
        doc("single", [(10.0, 20.0)]),  # n < 2: excluded
    ]
    tbl = pa.Table.from_pylist(rows)
    out = (
        spans.trajectory_hausdorff(rd.from_arrow(tbl).repartition(2))
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    S = float(spans.SIMPLIFY_COORD_SCALE)
    paths = {}
    for r in rows[:3]:
        pts = [
            tuple(map(float, s["text"].split(";")[:2])) for s in r["spans"]
        ]
        xs = np.floor(np.array([p[0] for p in pts]) * S).astype(np.int64)
        ys = np.floor(np.array([p[1] for p in pts]) * S).astype(np.int64)
        paths[r["doc_id"]] = (xs, ys)
    want = {}
    for a, b in [("a", "b"), ("a", "c"), ("b", "c")]:
        xa, ya = paths[a]
        xb, yb = paths[b]
        D = (xa[:, None] - xb[None, :]) ** 2 + (ya[:, None] - yb[None, :]) ** 2
        want[(a, b)] = int(max(D.min(axis=1).max(), D.min(axis=0).max()))
    got = {(r.doc_a, r.doc_b): int(r.h2) for r in out.itertuples()}
    assert got == want
    # symmetry sanity: h2(a,b) bounded below by each directed distance
    assert all(v >= 0 for v in got.values())


def test_turn_stats_hand_case(ray_session):
    """Left/right/straight classification matches hand cross-product signs;
    docs with < 3 geo spans report zero turns; repartition-invariant."""
    import pyarrow as pa
    import ray.data as rd

    def doc(doc_id, pts):
        return {
            "doc_id": doc_id,
            "spans": [
                {
                    "kind": "geo",
                    "text": f"{lon};{lat};2022;100;0.1,0.1,0.1,0.1,0.1,0.1",
                    "media_ref": "",
                    "offset": i,
                }
                for i, (lon, lat) in enumerate(pts)
            ],
        }

    rows = [
        # right turn at (1,1): step (1,1) then (1,-1) -> cross = -2 < 0
        doc("r", [(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)]),
        # left turn: mirror
        doc("l", [(0.0, 0.0), (1.0, -1.0), (2.0, 0.0)]),
        # straight: collinear
        doc("s", [(0.0, 0.0), (1.0, 0.0), (2.0, 0.0)]),
        # two spans: no interior vertex
        doc("short", [(0.0, 0.0), (1.0, 1.0)]),
    ]
    tbl = pa.Table.from_pylist(rows)
    out = (
        spans.turn_stats(rd.from_arrow(tbl).repartition(2))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc["r"].tolist() == [3, 0, 1, 0]  # n_geo, left, right, straight
    assert out.loc["l"].tolist() == [3, 1, 0, 0]
    assert out.loc["s"].tolist() == [3, 0, 0, 1]
    assert out.loc["short"].tolist() == [2, 0, 0, 0]


def test_parse_quarantine_isolates_bad_spans(ray_session):
    """Malformed spans quarantine, valid ones still parse (sum_year), and
    the per-doc corruption rule is deterministic."""
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.state.hashing import fnv1a_arr

    def doc(doc_id, texts):
        return {
            "doc_id": doc_id,
            "spans": [
                {"kind": "geo", "text": t, "media_ref": "", "offset": i}
                for i, t in enumerate(texts)
            ],
        }

    good = "10.5;20.25;2022;100;0.1,0.2,0.3,0.4,0.5,0.6"
    # find ids on both sides of the corruption rule
    ids = [f"doc{i}" for i in range(40)]
    h = fnv1a_arr(ids) % np.uint64(spans.QUARANTINE_MOD)
    corrupted_ids = [i for i, v in zip(ids, h) if v == 0]
    clean_ids = [i for i, v in zip(ids, h) if v != 0]
    assert corrupted_ids and clean_ids
    rows = [doc(d, [good, good]) for d in clean_ids[:3]]
    rows += [doc(corrupted_ids[0], [good, good])]
    # a genuinely malformed span in a CLEAN doc also quarantines
    rows += [doc(clean_ids[3], [good, "not;a;geo;span"])]
    out = (
        spans.parse_quarantine(rd.from_arrow(pa.Table.from_pylist(rows)))
        .to_pandas()
        .set_index("status")
    )
    # ok spans: 3 clean docs x2 + 1 from the half-bad doc = 7
    assert out.loc["ok", "n_spans"] == 7
    assert out.loc["ok", "n_docs"] == 4
    assert out.loc["ok", "sum_year"] == 7 * 2022
    # quarantined: corrupted doc's 2 + the malformed one
    assert out.loc["quarantined", "n_spans"] == 3
    assert out.loc["quarantined", "n_docs"] == 2
    assert out.loc["quarantined", "sum_year"] == 0


def test_path_density_hand_case(ray_session):
    """A two-point horizontal path sampled at 8 midpoints: every sample
    lands between the endpoints, totals are exact, and a one-point doc
    contributes nothing."""
    import pyarrow as pa
    import ray.data as rd

    from kaza_lcms_ray.stages import spans as sp
    from kaza_lcms_ray.state.cells import CELL_LEVEL, encode

    def mk_doc(doc_id, pts):
        return {
            "doc_id": doc_id,
            "spans": [
                {
                    "kind": "geo",
                    "text": f"{lon:.6f};{lat:.6f};2022;100;"
                    + ",".join(["0.1000"] * 6),
                    "media_ref": "",
                    "offset": i,
                }
                for i, (lon, lat) in enumerate(pts)
            ],
        }

    # cell width at level 12 = 360/4096 ≈ 0.0879° — pick a segment spanning
    # exactly a few cells on one row of the grid
    docs = rd.from_items(
        [
            mk_doc("a", [(10.0, 5.0), (10.2, 5.0)]),
            mk_doc("b", [(50.0, -20.0)]),  # single point: no segment
        ]
    )
    got = sp.path_density(docs).to_pandas().set_index("cell_id")
    assert got["n_samples"].sum() == 8  # one segment × 8 samples
    assert (got["n_docs"] == 1).all()
    # expected cells from the same midpoint arithmetic
    t = (2.0 * np.arange(8) + 1.0) / 16.0
    lons = 10.0 + (10.2 - 10.0) * t
    lats = np.full(8, 5.0)
    exp = np.unique(encode(lons, lats, CELL_LEVEL).astype(np.int64))
    assert sorted(got.index.tolist()) == sorted(exp.tolist())


def test_stay_points_hand_trajectory(ray_session):
    """One doc whose geo spans step 0.5, 0.5, 5.0, 0.1 apart with
    eps=2: anchor run [p0, p1, p2] (both within 2 of p0), then p3 far ->
    new anchor, p4 close -> run [p3, p4]."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from kaza_lcms_ray.stages import spans

    pts = [(0.0, 0.0), (0.5, 0.0), (1.0, 0.0), (6.0, 0.0), (6.1, 0.0)]
    span_texts = [
        f"{lon};{lat};2022;{100 + i};1,1,1,1,1,1" for i, (lon, lat) in enumerate(pts)
    ]
    doc = pd.DataFrame(
        {
            "doc_id": ["d1"],
            "spans": [
                [{"kind": "geo", "text": t} for t in span_texts]
            ],
        }
    )
    out = spans.stay_points(
        rd.from_pandas(doc), eps=2.0, min_pts=2
    ).to_pandas()
    assert len(out) == 2
    r0, r1 = out.iloc[0], out.iloc[1]
    assert (r0["anchor_span"], r0["n_pts"], r0["start_span"], r0["end_span"]) == (
        0, 3, 0, 2,
    )
    assert (r0["lon"], r0["lat"]) == (0.0, 0.0)
    assert (r1["anchor_span"], r1["n_pts"]) == (3, 2)
    assert r1["lon"] == 6.0
