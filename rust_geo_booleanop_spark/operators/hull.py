"""Convex hull over GeoJSON MultiPolygon columns (Andrew monotone chain).

The footprint/coverage step of tiling analytics: a geometry's convex hull
bounds its tile cover and gives the cheap "could these ever interact"
test that precedes exact kernel work. `convex_hull_geometries` runs
Andrew's monotone chain per geometry inside a mapInPandas stage.

Semantics (the g18 oracle fixture pins them; the generator recomputes
with an INDEPENDENT gift-wrapping / Jarvis-march implementation in
scripts/gen_geo_oracle_fixtures.py::_jarvis_hull — same cross-product
expression term for term, completely different control flow):

- input points are ALL ring vertices of the MultiPolygon, exactly
  deduplicated as (x, y) float pairs (GeoJSON ring closure contributes
  no extra point);
- the hull keeps STRICT corners only — collinear boundary points are
  dropped (monotone chain pops on cross <= 0; Jarvis picks the farthest
  among collinear candidates). The corpus's collinear triples are
  axis-aligned small doubles, so both engines' cross products are
  exactly 0.0 — no sign-of-epsilon divergence;
- the cross product is ``(ax-ox)*(by-oy) - (ay-oy)*(bx-ox)`` — the
  SINGLE expression both implementations share, term for term;
- output ring is counter-clockwise, starts at the lexicographically
  smallest point (x, then y), and is closed (first vertex repeated at
  the end), serialized with the kernel's byte-parity compact serializer
  so an md5 over it is engine-independent;
- fewer than 3 distinct points is degenerate: the "ring" is the sorted
  points plus closure (never produced by the corpus; pinned by a unit
  test so the twin can't silently diverge).

100 TB shape: a pure map stage over the geometry column — no shuffle,
Arrow-batched, output strictly smaller than input. Reference analogue:
none (tiling-engine requirement, like g14/g17).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

HULL_SCHEMA = (
    "case_id long, role string, n_points int, n_hull_vertices int, "
    "hull_json string"
)


def _cross(ox, oy, ax, ay, bx, by):
    """Signed area of (o->a, o->b) — the shared g18 cross expression."""
    return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)


def monotone_chain(points):
    """Andrew's monotone chain over deduped, lexicographically sorted
    (x, y) tuples. Returns the OPEN counter-clockwise hull starting at
    the smallest point; strict corners only (cross <= 0 pops)."""
    pts = sorted(set(points))
    if len(pts) < 3:
        return pts
    lower = []
    for p in pts:
        while len(lower) >= 2 and _cross(
            lower[-2][0], lower[-2][1], lower[-1][0], lower[-1][1], p[0], p[1]
        ) <= 0.0:
            lower.pop()
        lower.append(p)
    upper = []
    for p in reversed(pts):
        while len(upper) >= 2 and _cross(
            upper[-2][0], upper[-2][1], upper[-1][0], upper[-1][1], p[0], p[1]
        ) <= 0.0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def multipolygon_hull(coords):
    """MultiPolygon coordinates -> (n_distinct_points, closed hull ring
    as [[x, y], ...])."""
    points = {
        (float(p[0]), float(p[1]))
        for poly in coords
        for ring in poly
        for p in ring
    }
    hull = monotone_chain(points)
    closed = [[x, y] for x, y in hull]
    if closed:
        closed.append(list(closed[0]))
    return len(points), closed


def convex_hull_geometries(
    geoms: DataFrame, geom_col: str = "geom_json"
) -> DataFrame:
    """(case_id, role, geom_json) -> per-geometry convex hull stats + the
    hull serialized as a single-polygon MultiPolygon with the kernel's
    byte-parity compact serializer."""
    from rust_geo_booleanop_spark.kernel.geojson import (
        parse_multipolygon,
        serialize_multipolygon,
    )

    cols = ["case_id", "role", geom_col]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                k: []
                for k in (
                    "case_id",
                    "role",
                    "n_points",
                    "n_hull_vertices",
                    "hull_json",
                )
            }
            for case_id, role, gj in zip(
                pdf["case_id"], pdf["role"], pdf[geom_col]
            ):
                n_points, ring = multipolygon_hull(parse_multipolygon(gj))
                out["case_id"].append(int(case_id))
                out["role"].append(role)
                out["n_points"].append(n_points)
                out["n_hull_vertices"].append(max(len(ring) - 1, 0))
                out["hull_json"].append(
                    serialize_multipolygon([[ring]] if ring else [])
                )
            yield pd.DataFrame(out)

    return geoms.select(*cols).mapInPandas(batches, schema=HULL_SCHEMA)
