"""Exact edit-distance (Levenshtein) string self-join via segment blocking.

The entity-resolution "fuzzy join" a catalog / curation pipeline needs:
all DISTINCT value pairs of a column within edit distance ``max_dist``,
computed exactly but WITHOUT the brute-force n² cross join.

Public-algorithm basis — the PassJoin pigeonhole segment filter (Li,
Deng, Wang, Feng, "Pass-Join: A Partition-based Method for Similarity
Joins", PVLDB 2011): if ed(s, t) ≤ K and the shorter string s is split
into K+1 contiguous segments, then t contains at least one of the
segments as an EXACT substring, at a position that differs from the
segment's position in s by at most K.  So candidate generation is
complete when every string (a) indexes its own K+1 segments and (b)
probes every substring that could equal a segment of a string whose
length is within K below its own.  An exact banded-DP verification then
removes the false positives — the output equals brute force.

Reference analog: the withinDistance spatial self-join
(/root/reference/src/utils/sampling.py:12-28) — the same
block-then-verify shape with a string-segment index replacing the
spatial cell grid.

Scale shape: the corpus reduces to DISTINCT names first (skinny
two-phase); each distinct name emits ≤ (K+1) index rows and
≤ (K+1)²·(2K+1) probe rows (45 for K=2) keyed by a 64-bit segment
hash; the only shuffle is one int64-bucket exchange of those skinny
(key, name) rows (the minhash-LSH bucket pattern, hot buckets capped
with logged truncation); verification is vectorized banded DP over the
candidate pairs.  Distances are BYTE-level (ASCII-equal to DuckDB's
character-level ``levenshtein``; documented limitation for non-ASCII).

Strings shorter than K+1 cannot be segment-blocked (an empty segment
matches everywhere) — they pair through one bounded "short block":
index side = len ≤ K, probe side = len ≤ 2K (no pair with a longer
string can be within distance K).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_B = np.uint64(0x100000001B3)  # rolling-hash base (FNV prime)


def _byte_views(col: pa.Array):
    """(flat uint8 data, starts, lens) for a string array — zero-copy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.large_binary())
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + n + 1
    ]
    data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    return data, offs[:-1], np.diff(offs)


def _prefix_hashes(col: pa.Array):
    """Per-row polynomial prefix hashes PH (n, maxlen+1) and a power table,
    so any substring hash is PH[r, p+l] − PH[r, p]·B^l (uint64 wraparound).
    One vectorized pass per byte position (names are short)."""
    data, starts, lens = _byte_views(col)
    n = lens.shape[0]
    maxlen = int(lens.max()) if n else 0
    ph = np.zeros((n, maxlen + 1), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            live = lens > j
            ph[:, j + 1] = ph[:, j] * _B
            ph[live, j + 1] += data[starts[live] + j].astype(np.uint64)
        powt = np.ones(maxlen + 1, dtype=np.uint64)
        for j in range(1, maxlen + 1):
            powt[j] = powt[j - 1] * _B
    return ph, powt, lens


def _seg_bounds(i: int, L: np.ndarray, m: int):
    """Start/length of segment ``i`` when a length-``L`` string is split
    into ``m`` contiguous parts (first parts floor-sized, last ceil)."""
    q, rem = L // m, L % m
    thresh = m - rem  # segments with index >= thresh get the extra byte
    start = i * q + np.maximum(0, i - thresh)
    seg_len = q + (i >= thresh).astype(L.dtype)
    return start, seg_len


def _substr_hash(ph, powt, rows, pos, seg_len):
    with np.errstate(over="ignore"):
        return ph[rows, pos + seg_len] - ph[rows, pos] * powt[seg_len]


def _emit_batch(t: pa.Table, col: str, k: int) -> pa.Table:
    """Index + probe emissions for one batch of distinct names."""
    from ..state.hashing import hash_key

    names = t.column(col)
    if isinstance(names, pa.ChunkedArray):
        names = names.combine_chunks()
    ph, powt, lens = _prefix_hashes(names)
    n = lens.shape[0]
    rows_all = np.arange(n)
    m = k + 1
    keys, ridx, sides = [], [], []

    def push(key, rows, side):
        keys.append(key)
        ridx.append(rows)
        sides.append(np.full(rows.shape[0], side, np.int8))

    # ---- segment-blocked strings (len >= k+1) ----
    for i in range(m):
        # index side: my own segments
        ok = lens >= m
        rows = rows_all[ok]
        L = lens[ok]
        p, sl = _seg_bounds(i, L, m)
        h = _substr_hash(ph, powt, rows, p, sl)
        push(hash_key(np.uint64(i), L.astype(np.uint64), h), rows, 0)
        # probe side: substrings that could be segment i of a string of
        # length L = my_len - dl, at positions shifted by at most k
        for dl in range(k + 1):
            Lt = lens - dl
            ok = Lt >= m
            rows0 = rows_all[ok]
            Lt0 = Lt[ok]
            p0, sl0 = _seg_bounds(i, Lt0, m)
            for shift in range(-k, k + 1):
                pos = p0 + shift
                valid = (pos >= 0) & (pos + sl0 <= lens[ok])
                rows_v = rows0[valid]
                if rows_v.shape[0] == 0:
                    continue
                h = _substr_hash(ph, powt, rows_v, pos[valid], sl0[valid])
                push(
                    hash_key(np.uint64(i), Lt0[valid].astype(np.uint64), h),
                    rows_v,
                    1,
                )

    # ---- short block: len <= k indexes, len <= 2k probes ----
    short_key = np.uint64(0x5348_4F52_5421)  # constant tag; one bounded block
    rows = rows_all[(lens >= 1) & (lens <= k)]
    if rows.shape[0]:
        push(np.full(rows.shape[0], short_key, np.uint64), rows, 0)
    rows = rows_all[(lens >= 1) & (lens <= 2 * k)]
    if rows.shape[0]:
        push(np.full(rows.shape[0], short_key, np.uint64), rows, 1)

    key_arr = np.concatenate(keys) if keys else np.empty(0, np.uint64)
    row_arr = np.concatenate(ridx) if ridx else np.empty(0, np.int64)
    side_arr = np.concatenate(sides) if sides else np.empty(0, np.int8)
    return pa.table(
        {
            "seg_key": pa.array(key_arr.astype(np.int64)),
            "name": names.take(pa.array(row_arr, pa.int64())),
            "side": pa.array(side_arr),
        }
    )


def _pad_bytes(col: pa.Array):
    """(n, maxlen) uint8 matrix + lens (zero-padded) for vectorized DP."""
    data, starts, lens = _byte_views(col)
    n = lens.shape[0]
    maxlen = int(lens.max()) if n else 0
    out = np.zeros((n, maxlen), dtype=np.uint8)
    for j in range(maxlen):
        live = lens > j
        out[live, j] = data[starts[live] + j]
    return out, lens


def banded_levenshtein(a_col: pa.Array, b_col: pa.Array, k: int) -> np.ndarray:
    """Exact byte-level Levenshtein distances, banded at ``k`` (values
    > k come back as k+1).  Vectorized across pairs: the DP runs over the
    2k+1 diagonal band, one numpy step per (row, offset)."""
    if isinstance(a_col, pa.ChunkedArray):
        a_col = a_col.combine_chunks()
    if isinstance(b_col, pa.ChunkedArray):
        b_col = b_col.combine_chunks()
    A, la = _pad_bytes(a_col)
    Bm, lb = _pad_bytes(b_col)
    n = la.shape[0]
    inf = np.int32(k + 1)
    res = np.full(n, inf, np.int32)
    if n == 0:
        return res
    # |len difference| > k can never verify
    diff_ok = np.abs(la - lb) <= k
    # i = 0 row: D[0][j] = j
    width = 2 * k + 1
    cur = np.full((n, width), inf, np.int32)
    for d in range(0, k + 1):
        cur[:, k + d] = np.where(d <= lb, d, inf)
    done0 = (la == 0) & diff_ok
    res[done0] = np.where(lb[done0] <= k, lb[done0], inf)
    max_i = int(la.max()) if n else 0
    for i in range(1, max_i + 1):
        active = (la >= i) & diff_ok
        if not active.any():
            break
        prev = cur
        cur = np.full((n, width), inf, np.int32)
        ai = A[:, i - 1].astype(np.int16)  # byte of a at row i (1-based)
        for d in range(-k, k + 1):
            j = i + d
            col_ok = active & (j >= 0) & (j <= lb)
            if not col_ok.any():
                continue
            best = np.full(n, inf, np.int32)
            if j == 0:
                best[col_ok] = i  # all deletions
            else:
                # deletion: prev row, same j -> prev offset d+1
                if d + 1 <= k:
                    best = np.minimum(best, prev[:, k + d + 1] + 1)
                # substitution/match: prev row, j-1 -> prev offset d
                bj = np.zeros(n, np.int16)
                jj = j - 1
                in_b = jj < Bm.shape[1]
                if in_b:
                    bj = Bm[:, jj].astype(np.int16)
                cost = (ai != bj).astype(np.int32)
                best = np.minimum(best, prev[:, k + d] + cost)
                # insertion: same row, j-1 -> cur offset d-1
                if d - 1 >= -k:
                    best = np.minimum(best, cur[:, k + d - 1] + 1)
            cur[:, k + d] = np.where(col_ok, np.minimum(best, inf), inf)
        fin = active & (la == i)
        if fin.any():
            dd = lb[fin] - i
            res[fin] = cur[fin, k + dd]
    return np.minimum(res, inf)


def fuzzy_name_pairs(ds, col: str, max_dist: int = 2, max_bucket: int = 4096):
    """All DISTINCT-value pairs of ``col`` within byte-level edit distance
    ``max_dist`` (1 ≤ dist ≤ max_dist, name_a < name_b) — exact, via
    segment blocking + banded-DP verify (module docstring).

    ``max_bucket`` caps degenerate hot segment buckets with a logged
    truncation (the LSH hot-bucket convention — dedup.minhash_candidate_pairs).

    Output: (name_a:string, name_b:string, dist:int64).
    """
    from ..runtime import cluster_cpus
    from ..state.hashing import hash_key
    from .joins import distinct

    k = int(max_dist)
    names = distinct(
        ds.select_columns([col]).map_batches(
            lambda t: t.filter(pc.is_valid(t.column(col))),
            batch_format="pyarrow",
        ),
        [col],
    )

    emitted = names.map_batches(
        lambda t: _emit_batch(t, col, k), batch_format="pyarrow"
    )

    nb = max(8, cluster_cpus() * 2)

    def add_bucket(t: pa.Table) -> pa.Table:
        key = t.column("seg_key").to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (hash_key(key) % np.uint64(nb)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": g["name"].iloc[:0], "b": g["name"].iloc[:0]})
        colliding = g[g.duplicated("seg_key", keep=False)]
        if colliding.empty:
            return empty
        frames = []
        for _, grp in colliding.groupby("seg_key", sort=False):
            idx = grp.loc[grp["side"] == 0, "name"].unique()
            prb = grp.loc[grp["side"] == 1, "name"].unique()
            if idx.shape[0] == 0 or prb.shape[0] == 0:
                continue
            if idx.shape[0] > max_bucket or prb.shape[0] > max_bucket:
                import logging

                logging.getLogger(__name__).warning(
                    "fuzzy segment bucket has %d x %d members; capped to %d",
                    idx.shape[0], prb.shape[0], max_bucket,
                )
                idx = np.sort(idx)[:max_bucket]
                prb = np.sort(prb)[:max_bucket]
            aa = np.repeat(idx, prb.shape[0])
            bb = np.tile(prb, idx.shape[0])
            keep = aa != bb
            aa, bb = aa[keep], bb[keep]
            lo = np.minimum(aa, bb)
            hi = np.maximum(aa, bb)
            frames.append(pd.DataFrame({"a": lo, "b": hi}))
        frames = [f for f in frames if len(f)]
        return pd.concat(frames, ignore_index=True) if frames else empty

    from .dedup import exact_pairs_distinct

    cand = (
        emitted.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_bucket, batch_format="pandas")
        .select_columns(["a", "b"])
    )
    cand = exact_pairs_distinct(cand)

    def verify(t: pa.Table) -> pa.Table:
        d = banded_levenshtein(t.column("a"), t.column("b"), k)
        keep = (d >= 1) & (d <= k)
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                "name_a": t.column("a"),
                "name_b": t.column("b"),
                "dist": pa.array(d[keep].astype(np.int64)),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow")


def fuzzy_name_pairs_sql(table_sql: str, col: str, max_dist: int = 2) -> str:
    """Oracle twin of :func:`fuzzy_name_pairs` — brute-force
    ``levenshtein`` over the distinct names (character-level == the
    engine's byte-level rule on ASCII corpora)."""
    return f"""
        WITH names AS (
            SELECT DISTINCT {col} AS name FROM ({table_sql})
            WHERE {col} IS NOT NULL
        )
        SELECT a.name AS name_a, b.name AS name_b,
               CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        FROM names a
        JOIN names b ON a.name < b.name
        WHERE levenshtein(a.name, b.name) BETWEEN 1 AND {max_dist}"""
