"""Per-group aggregate convex hull — the "envelope geometry" reduce.

Reference analog: the AOI/footprint geometry work (bounds/buffer at
/root/reference/src/00sample_pts.py:185, src/01composite_s2.py:98)
generalized to a data-derived hull per class.

Vertex rule, chosen to be identical in the engine and the SQL oracle:
a point ``a`` is a hull vertex iff some directed pair (a, b) of distinct
class points has EVERY other class point STRICTLY to its left
(cross(b−a, c−a) > 0); a two-point group makes both points vertices and
a one-point group emits nothing (no pairs — the rule, not an accident).
All cross products are the same double expression on both sides, so the
decisions are bit-identical even for near-collinear triples.

Scale shape (the part_skyline pattern): a per-batch Akl–Toussaint
prefilter (public heuristic: points strictly inside the polygon of the
8 directional extremes are certainly interior — safe discard,
vectorized) cuts each block to its locally-extreme points; the exact
pair rule then runs once per class on the small survivor set inside a
``groupby(class).map_groups``.  Survivors provably include every point
on the class hull boundary, and every SQL witness that invalidates a
non-edge survives the prefilter (a hull vertex lies strictly right of
any chord), so the finalize decisions equal brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _akl_toussaint_keep(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Mask of points NOT strictly inside the 8-extreme octagon."""
    n = x.shape[0]
    if n <= 8:
        return np.ones(n, bool)
    idxs = sorted(
        {
            int(np.argmax(v))
            for v in (x, -x, y, -y, x + y, x - y, -x + y, -x - y)
        }
    )
    ex, ey = x[idxs], y[idxs]
    # dedupe exact duplicates; need >=3 distinct corners for an interior
    pts = np.unique(np.stack([ex, ey], axis=1), axis=0)
    if pts.shape[0] < 3:
        return np.ones(n, bool)
    ex, ey = pts[:, 0], pts[:, 1]
    cx, cy = ex.mean(), ey.mean()
    order = np.argsort(np.arctan2(ey - cy, ex - cx))
    ex, ey = ex[order], ey[order]
    inside = np.ones(n, bool)
    m = ex.shape[0]
    for i in range(m):
        j = (i + 1) % m
        cr = (ex[j] - ex[i]) * (y - ey[i]) - (ey[j] - ey[i]) * (x - ex[i])
        inside &= cr > 0.0
    return ~inside


def _exact_vertices(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean vertex mask under the pair rule (mirrors the oracle SQL).
    Requires points already deduplicated (index identity == coordinate
    identity, matching the SQL <> tests on DISTINCT rows)."""
    m = x.shape[0]
    if m < 2:
        return np.zeros(m, bool)
    eye = np.eye(m, dtype=bool)
    out = np.zeros(m, bool)
    # i-chunked to bound the cross tensor at chunk*m^2 doubles (a hull-heavy
    # group, e.g. points on a circle, can defeat the octagon prefilter)
    chunk = max(1, 8_000_000 // max(m * m, 1))
    for s in range(0, m, chunk):
        e = min(m, s + chunk)
        dx = x[None, :] - x[s:e, None]  # dx[i, j] = x_j - x_i
        dy = y[None, :] - y[s:e, None]
        # cross[i, j, k] = (x_j - x_i)(y_k - y_i) - (y_j - y_i)(x_k - x_i)
        cr = dx[:, :, None] * dy[:, None, :] - dy[:, :, None] * dx[:, None, :]
        cr = np.where(eye[s:e, None, :] | eye[None, :, :], np.inf, cr)
        valid = cr.min(axis=2) > 0.0  # all-masked (m==2) -> inf > 0 -> valid
        valid &= ~eye[s:e]  # j != i
        out[s:e] = valid.any(axis=1)
    return out


def class_convex_hull(plots, class_col: str = "LANDCOVER", x_col: str = "lon", y_col: str = "lat"):
    """Per-class convex-hull vertex set over a point table.

    Output: (class_col, x_col, y_col) — one row per hull vertex.
    """

    def prefilter(t: pa.Table) -> pa.Table:
        tb = (
            t.select([class_col, x_col, y_col])
            .group_by([class_col, x_col, y_col])
            .aggregate([])
        )
        cls = tb.column(class_col).to_numpy(zero_copy_only=False)
        x = tb.column(x_col).to_numpy(zero_copy_only=False)
        y = tb.column(y_col).to_numpy(zero_copy_only=False)
        keep = np.zeros(len(tb), bool)
        for c in np.unique(cls):
            sel = cls == c
            keep[sel] = _akl_toussaint_keep(x[sel], y[sel])
        return tb.filter(pa.array(keep))

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([x_col, y_col])
        x = g[x_col].to_numpy(np.float64)
        y = g[y_col].to_numpy(np.float64)
        v = _exact_vertices(x, y)
        return g.loc[v, [class_col, x_col, y_col]]

    return (
        plots.map_batches(prefilter, batch_format="pyarrow")
        .groupby(class_col)
        .map_groups(finalize, batch_format="pandas")
    )


def class_convex_hull_sql(
    points_sql: str, class_col: str = "LANDCOVER", x_col: str = "lon", y_col: str = "lat"
) -> str:
    """Oracle twin of :func:`class_convex_hull` — the identical strict
    one-side pair rule, brute force over all class points."""
    return f"""
        WITH hp AS (
            SELECT DISTINCT {class_col}, {x_col}, {y_col} FROM ({points_sql})
        ),
        hedges AS (
            SELECT a.{class_col},
                   a.{x_col} AS ax, a.{y_col} AS ay,
                   MIN(CASE WHEN c.{x_col} IS NULL THEN 1.0
                            ELSE (b.{x_col} - a.{x_col}) * (c.{y_col} - a.{y_col})
                               - (b.{y_col} - a.{y_col}) * (c.{x_col} - a.{x_col})
                       END) AS mn
            FROM hp a
            JOIN hp b ON b.{class_col} = a.{class_col}
               AND (b.{x_col} <> a.{x_col} OR b.{y_col} <> a.{y_col})
            LEFT JOIN hp c ON c.{class_col} = a.{class_col}
               AND (c.{x_col} <> a.{x_col} OR c.{y_col} <> a.{y_col})
               AND (c.{x_col} <> b.{x_col} OR c.{y_col} <> b.{y_col})
            GROUP BY 1, 2, 3, b.{x_col}, b.{y_col}
        )
        SELECT DISTINCT {class_col}, ax AS {x_col}, ay AS {y_col}
        FROM hedges WHERE mn > 0"""
