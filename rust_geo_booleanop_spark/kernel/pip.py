"""Point-in-(multi)polygon predicate.

Even-odd ray casting with an explicit on-boundary test (points on a ring
edge count as inside — consistent with inclusive range predicates, which
keeps rectangle-zone joins oracle-checkable in plain SQL). Holes flip
parity like any ring (GeoJSON ring 0 = exterior, rest holes).

Not part of the reference kernel (it has no PIP operator) — this is an
engine addition for point-in-polygon / zonal joins.
"""

from __future__ import annotations

from .predicates import signed_area


def point_on_segment(px, py, x1, y1, x2, y2) -> bool:
    if not (min(x1, x2) <= px <= max(x1, x2) and min(y1, y2) <= py <= max(y1, y2)):
        return False
    return signed_area(x1, y1, x2, y2, px, py) == 0.0


def point_in_ring(px: float, py: float, ring) -> int:
    """2 = on boundary, 1 = strictly inside (odd crossings), 0 = outside."""
    inside = False
    n = len(ring)
    for i in range(n - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        if point_on_segment(px, py, x1, y1, x2, y2):
            return 2
        if (y1 > py) != (y2 > py):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xint:
                inside = not inside
    return 1 if inside else 0


def point_in_polygon(px: float, py: float, polygon) -> bool:
    parity = 0
    for ring in polygon:
        r = point_in_ring(px, py, ring)
        if r == 2:
            return True  # on any ring boundary counts as inside
        parity ^= r
    return parity == 1


def point_in_multipolygon(px: float, py: float, mp) -> bool:
    return any(point_in_polygon(px, py, poly) for poly in mp)


# ---------------------------------------------------------------------------
# Vectorized batch form (the Spark hot path)
# ---------------------------------------------------------------------------
#
# Same semantics as the scalar functions above, computed for a whole NumPy
# batch of points at once: per (point, edge) pair the crossing test is plain
# float arithmetic in the identical operation order, and the on-boundary
# test reproduces signed_area's Shewchuk float filter — pairs where the
# filter is inconclusive (cancellation near zero) fall back to the scalar
# exact-rational predicate, so batch results are bit-identical to looping
# `point_in_multipolygon` over the batch.

import numpy as np

from .predicates import _CCW_ERRBOUND

# point×edge pairs evaluated per chunk (bounds temp-array memory)
_PIP_CHUNK_PAIRS = 1 << 20


class MultiPolygonEdges:
    """Precomputed edge arrays of one multipolygon for batch PIP."""

    __slots__ = ("x1", "y1", "x2", "y2", "bxmin", "bxmax", "bymin", "bymax", "poly_slices")

    def __init__(self, mp):
        x1s, y1s, x2s, y2s = [], [], [], []
        poly_slices = []
        start = 0
        for poly in mp:
            for ring in poly:
                if len(ring) < 2:
                    continue
                arr = np.asarray(ring, dtype=np.float64)
                x1s.append(arr[:-1, 0])
                y1s.append(arr[:-1, 1])
                x2s.append(arr[1:, 0])
                y2s.append(arr[1:, 1])
            n_edges = sum(len(a) for a in x1s) - start
            poly_slices.append((start, start + n_edges))
            start += n_edges
        if x1s:
            self.x1 = np.concatenate(x1s)
            self.y1 = np.concatenate(y1s)
            self.x2 = np.concatenate(x2s)
            self.y2 = np.concatenate(y2s)
        else:
            self.x1 = self.y1 = self.x2 = self.y2 = np.empty(0, dtype=np.float64)
        self.bxmin = np.minimum(self.x1, self.x2)
        self.bxmax = np.maximum(self.x1, self.x2)
        self.bymin = np.minimum(self.y1, self.y2)
        self.bymax = np.maximum(self.y1, self.y2)
        self.poly_slices = poly_slices


def _batch_chunk(px, py, e: MultiPolygonEdges):
    """(boundary_any, inside_any) bool arrays for one chunk of points."""
    pxc = px[:, None]
    pyc = py[:, None]
    x1, y1, x2, y2 = e.x1, e.y1, e.x2, e.y2

    # --- on-boundary test (point_on_segment semantics) ---
    in_bbox = (
        (e.bxmin <= pxc) & (pxc <= e.bxmax) & (e.bymin <= pyc) & (pyc <= e.bymax)
    )
    # signed_area(x1, y1, x2, y2, px, py): p0=(x1,y1) p1=(x2,y2) p2=(px,py)
    detleft = (x1 - pxc) * (y2 - pyc)
    detright = (y1 - pyc) * (x2 - pxc)
    det = detleft - detright
    same_sign = ((detleft > 0.0) & (detright > 0.0)) | (
        (detleft < 0.0) & (detright < 0.0)
    )
    # filter-conclusive zero: opposite/zero signs and float det exactly 0
    zero = ~same_sign & (det == 0.0)
    # inconclusive: same-sign products with |det| under the error bound —
    # resolve those (rare) pairs with the exact scalar predicate
    detsum = np.abs(detleft + detright)
    inconclusive = in_bbox & same_sign & (np.abs(det) < _CCW_ERRBOUND * detsum)
    if inconclusive.any():
        for pi, ei in np.argwhere(inconclusive):
            zero[pi, ei] = (
                signed_area(x1[ei], y1[ei], x2[ei], y2[ei], px[pi], py[pi]) == 0.0
            )
    boundary = (in_bbox & zero).any(axis=1)

    # --- ray crossings (identical FP expression order as point_in_ring) ---
    straddles = (y1 > pyc) != (y2 > pyc)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (pyc - y1) * (x2 - x1) / (y2 - y1)
    crossings = straddles & (pxc < xint)

    inside_any = np.zeros(len(px), dtype=bool)
    for s, t in e.poly_slices:
        if t > s:
            # XOR of per-ring parities == parity of the polygon's total count
            inside_any |= (crossings[:, s:t].sum(axis=1) & 1).astype(bool)
    return boundary, inside_any


def points_in_multipolygon_batch(px, py, mp=None, edges: MultiPolygonEdges | None = None):
    """Vectorized `point_in_multipolygon` over NumPy arrays px, py.

    Pass a parsed multipolygon `mp`, or a precomputed `edges` to amortize
    edge-array construction over many batches (the Spark geom cache).
    """
    if edges is None:
        edges = MultiPolygonEdges(mp)
    px = np.ascontiguousarray(px, dtype=np.float64)
    py = np.ascontiguousarray(py, dtype=np.float64)
    n = len(px)
    n_edges = len(edges.x1)
    if n == 0 or n_edges == 0:
        return np.zeros(n, dtype=bool)
    out = np.empty(n, dtype=bool)
    step = max(1, _PIP_CHUNK_PAIRS // n_edges)
    for i in range(0, n, step):
        b, ins = _batch_chunk(px[i : i + step], py[i : i + step], edges)
        out[i : i + step] = b | ins
    return out
