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
