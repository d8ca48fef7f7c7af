"""Planar geometry kernel: bboxes, vectorized point-in-polygon, STR-packed
R-tree.

The engine analog of the reference's server-side ``paint`` /
``filterBounds`` spatial predicates (src/utils/s2process.py:172,18) — here a
real vectorized ray-casting test over Arrow-native coordinate arrays, with an
STR-packed R-tree bbox prefilter (SURVEY.md T3/J3).

Polygon representation (matches FIXTURES.md `polygons`):
  rings: list of rings, each an (n, 2) float64 array [[x, y], ...], closed
  (first vertex == last vertex), outer ring first.  Interior rings flip
  containment (even-odd rule).

Edge semantics: the crossing test uses the half-open rule
``(y1 <= py) != (y2 <= py)`` with a strict ``px < x_at(py)`` comparison, so a
point exactly on a horizontal edge or vertex gets a deterministic answer and
shared borders between adjacent polygons assign the point to exactly one side.
"""

from __future__ import annotations

import numpy as np


def ring_bbox(ring: np.ndarray) -> tuple[float, float, float, float]:
    return (
        float(ring[:, 0].min()),
        float(ring[:, 1].min()),
        float(ring[:, 0].max()),
        float(ring[:, 1].max()),
    )


def polygon_bbox(rings: list[np.ndarray]) -> tuple[float, float, float, float]:
    return ring_bbox(rings[0])  # outer ring bounds the polygon


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd crossing test of many points vs one ring.

    O(E) numpy passes over the point arrays (E = ring edges, typically ≤ 13),
    no Python per-point loop.
    """
    inside = np.zeros(px.shape[0], dtype=bool)
    x1 = ring[:-1, 0]
    y1 = ring[:-1, 1]
    x2 = ring[1:, 0]
    y2 = ring[1:, 1]
    for i in range(x1.shape[0]):
        a, b = y1[i], y2[i]
        crosses = (a <= py) != (b <= py)
        if not crosses.any():
            continue
        # x coordinate where the edge crosses the horizontal line at py
        t = (py[crosses] - a) / (b - a)
        xint = x1[i] + t * (x2[i] - x1[i])
        upd = np.zeros_like(inside)
        upd[crosses] = px[crosses] < xint
        inside ^= upd
    return inside


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]
) -> np.ndarray:
    """Even-odd containment over all rings (holes flip membership)."""
    inside = np.zeros(px.shape[0], dtype=bool)
    for ring in rings:
        inside ^= points_in_ring(px, py, ring)
    return inside


class STRtree:
    """Sort-Tile-Recursive packed R-tree over rectangles.

    Built once (driver or actor ``__init__``), queried per batch.  Pure numpy;
    the query returns candidate rectangle indices whose bbox contains each
    point — the exact PIP test runs only on those candidates.
    """

    def __init__(self, boxes: np.ndarray, leaf_size: int = 8):
        """boxes: (n, 4) float64 [minx, miny, maxx, maxy]."""
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        n = boxes.shape[0]
        self.boxes = boxes
        # STR packing: sort by center-x into vertical slices, then by center-y
        cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
        cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
        n_leaves = max(1, -(-n // leaf_size))
        n_slices = max(1, int(np.ceil(np.sqrt(n_leaves))))
        per_slice = -(-n // n_slices)
        order_x = np.argsort(cx, kind="stable")
        leaves: list[np.ndarray] = []
        for s in range(0, n, per_slice):
            sl = order_x[s : s + per_slice]
            sl = sl[np.argsort(cy[sl], kind="stable")]
            for t in range(0, sl.shape[0], leaf_size):
                leaves.append(sl[t : t + leaf_size])
        self.leaf_items = leaves
        self.leaf_boxes = np.empty((len(leaves), 4), dtype=np.float64)
        for i, items in enumerate(leaves):
            b = boxes[items]
            self.leaf_boxes[i] = [
                b[:, 0].min(),
                b[:, 1].min(),
                b[:, 2].max(),
                b[:, 3].max(),
            ]

    def query_points(
        self, px: np.ndarray, py: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Return (point_idx, box_idx) pairs where the point is inside the
        box (half-closed: minx <= x <= maxx — exact test follows)."""
        pts_out: list[np.ndarray] = []
        box_out: list[np.ndarray] = []
        for li, items in enumerate(self.leaf_items):
            lb = self.leaf_boxes[li]
            in_leaf = (
                (px >= lb[0]) & (px <= lb[2]) & (py >= lb[1]) & (py <= lb[3])
            )
            if not in_leaf.any():
                continue
            idx = np.nonzero(in_leaf)[0]
            sx, sy = px[idx], py[idx]
            for bi in items:
                b = self.boxes[bi]
                m = (sx >= b[0]) & (sx <= b[2]) & (sy >= b[1]) & (sy <= b[3])
                if m.any():
                    hit = idx[m]
                    pts_out.append(hit)
                    box_out.append(np.full(hit.shape[0], bi, dtype=np.int64))
        if not pts_out:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(pts_out), np.concatenate(box_out)


class PolygonIndex:
    """STRtree + ring arrays for a polygon table; the state object held by
    the PIP actor pool (SURVEY.md T3)."""

    def __init__(
        self,
        poly_ids: np.ndarray,
        kinds: np.ndarray,
        landcover: np.ndarray,
        rings_per_poly: list[list[np.ndarray]],
    ):
        self.poly_ids = np.asarray(poly_ids)
        self.kinds = np.asarray(kinds)
        self.landcover = np.asarray(landcover, dtype=np.int32)
        self.rings = rings_per_poly
        boxes = np.array(
            [polygon_bbox(r) for r in rings_per_poly], dtype=np.float64
        ).reshape(-1, 4)
        self.tree = STRtree(boxes)

    def join_points(
        self, px: np.ndarray, py: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """All (point_idx, poly_idx) containment pairs (inner spatial join).

        Output pairs are sorted by (point_idx, poly_id) so downstream row
        emission is deterministic under any candidate visit order.
        """
        cand_pt, cand_poly = self.tree.query_points(px, py)
        if cand_pt.shape[0] == 0:
            return cand_pt, cand_poly
        keep = np.zeros(cand_pt.shape[0], dtype=bool)
        # group candidates by polygon: one vectorized ring test per polygon
        order = np.argsort(cand_poly, kind="stable")
        cand_pt, cand_poly = cand_pt[order], cand_poly[order]
        bounds = np.nonzero(np.diff(cand_poly))[0] + 1
        for seg in np.split(np.arange(cand_pt.shape[0]), bounds):
            if seg.shape[0] == 0:
                continue
            pi = int(cand_poly[seg[0]])
            keep[seg] = points_in_polygon(px[cand_pt[seg]], py[cand_pt[seg]], self.rings[pi])
        pt, pl = cand_pt[keep], cand_poly[keep]
        o = np.lexsort((self.poly_ids[pl], pt))
        return pt[o], pl[o]

    @classmethod
    def from_arrow(cls, table) -> "PolygonIndex":
        """Build from an Arrow table with FIXTURES.md `polygons` schema."""
        rings_col = table.column("rings").to_pylist()
        rings_per_poly = [
            [
                np.asarray([[v["x"], v["y"]] for v in ring], dtype=np.float64)
                for ring in poly
            ]
            for poly in rings_col
        ]
        return cls(
            np.asarray(table.column("poly_id").to_pylist()),
            np.asarray(table.column("kind").to_pylist()),
            table.column("LANDCOVER").to_numpy(zero_copy_only=False),
            rings_per_poly,
        )


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (positive for CCW rings)."""
    x, y = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    return float(0.5 * np.sum(x * y2 - x2 * y))


def erode_ring(ring: np.ndarray, dist: float) -> np.ndarray | None:
    """Inward offset of a closed ring by ``dist`` (miter join) — the
    erodeGeometry / buffer(-d) analog (src/misc/sentinel1.py:149-153,
    'clips edges').

    Each vertex moves along the bisector of its adjacent inward edge
    normals by dist / cos(θ/2) so every EDGE ends up exactly ``dist``
    inside its original line.  Exact for convex rings; for concave rings it
    is the miter approximation (no self-intersection repair).  Returns None
    when the ring collapses (erosion distance ≥ inradius).
    """
    ccw = ring_area(ring) > 0
    pts = ring[:-1]  # drop closing vertex
    nxt = np.roll(pts, -1, axis=0)
    edge = nxt - pts
    ln = np.sqrt((edge**2).sum(axis=1))
    if (ln == 0).any():
        pts = pts[ln > 0]
        if pts.shape[0] < 3:
            return None
        nxt = np.roll(pts, -1, axis=0)
        edge = nxt - pts
        ln = np.sqrt((edge**2).sum(axis=1))
    # inward normal: left of the edge for CCW rings, right for CW
    sign = 1.0 if ccw else -1.0
    nx = sign * -edge[:, 1] / ln
    ny = sign * edge[:, 0] / ln
    n_prev_x, n_prev_y = np.roll(nx, 1), np.roll(ny, 1)
    mx, my = nx + n_prev_x, ny + n_prev_y
    m2 = mx * mx + my * my
    m2 = np.where(m2 < 1e-12, 1e-12, m2)
    out = pts + dist * 2.0 * np.stack([mx, my], axis=1) / m2[:, None]
    closed = np.concatenate([out, out[:1]], axis=0)
    # collapse detection: past the inradius the offset REVERSES edges (the
    # reflected ring can keep its orientation, so signed area alone lies)
    edge_new = np.roll(out, -1, axis=0) - out
    if ((edge_new * edge).sum(axis=1) <= 0).any():
        return None
    if abs(ring_area(closed)) >= abs(ring_area(ring)):
        return None
    return closed


def erode_polygon(rings: list[np.ndarray], dist: float) -> list[np.ndarray] | None:
    """Erode the outer ring inward (holes are left untouched — eroding a
    polygon only shrinks its exterior).  None if the polygon vanishes."""
    outer = erode_ring(rings[0], dist)
    if outer is None:
        return None
    return [outer] + list(rings[1:])
