"""Pure-JVM geometry measures over GeoJSON MultiPolygon columns.

`geometry_measures` computes per-geometry summary statistics — polygon /
ring / vertex counts, signed shoelace area, and the bounding box —
entirely with built-in higher-order functions inside whole-stage codegen:
`from_json` parses the nested coordinate arrays, nested `aggregate` folds
compute the counts and the area, `flatten` + `array_min/max` the bbox.
No Python stage anywhere (reference analogue: the per-polygon bbox/ring
walks inside `lib/src/boolean/fill_queue.rs`; here it is a declarative
Spark expression instead of an imperative pass).

Determinism contract (the g16 oracle depends on it):

- the shoelace fold is a LEFT fold with zero 0.0 at every level
  (edge terms within a ring, rings within a polygon, polygons within the
  geometry), each edge term computed as ``x_i*y_{i+1} - x_{i+1}*y_i`` —
  `measures_python` below replicates the exact same FP operation order,
  so JVM and CPython produce bit-identical doubles;
- bbox mins/maxes are order-independent; ``+ 0.0`` canonicalizes a
  potential ``-0.0`` so both engines agree on the zero sign;
- `from_json` (Jackson) and `json.loads` (CPython strtod) are both
  correctly-rounded double parsers, so the parsed coordinates match.

At 100 TB scale this is a pure map stage: no shuffle, no UDF, prunes to
the single geometry column.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GeoJSON MultiPolygon: polygons -> rings -> points -> [x, y]
MULTIPOLYGON_SCHEMA = (
    "struct<type:string,coordinates:array<array<array<array<double>>>>>"
)

MEASURE_COLUMNS = (
    "n_polys",
    "n_rings",
    "n_vertices",
    "area",
    "xmin",
    "ymin",
    "xmax",
    "ymax",
)


def _ring_shoelace(ring):
    """Left-fold sum of x_i*y_{i+1} - x_{i+1}*y_i over a closed ring.

    The slice length is clamped at 0 so a degenerate EMPTY ring folds to
    0.0 (matching `measures_python`'s zero-iteration loop) instead of
    crashing slice() with a negative length."""
    edges = F.transform(
        F.slice(ring, 1, F.greatest(F.size(ring) - 1, F.lit(0))),
        # slice index i is 0-based; original-ring successor is 1-based i+2
        lambda p, i: p.getItem(0) * F.element_at(ring, i + F.lit(2)).getItem(1)
        - F.element_at(ring, i + F.lit(2)).getItem(0) * p.getItem(1),
    )
    return F.aggregate(edges, F.lit(0.0), lambda acc, x: acc + x)


def geometry_measures(geoms: DataFrame, geom_col: str = "geom_json") -> DataFrame:
    """Append n_polys/n_rings/n_vertices/area/bbox columns (all JVM-side).

    `area` is the SIGNED shoelace sum over all rings. NB: this equals the
    enclosed region area only when holes are wound opposite to exteriors —
    the kernel does NOT guarantee that (reference connect_edges.rs:288:
    contours "may mix clockwise and counter-clockwise winding rules", and
    input hole rings can pass through verbatim). For the true region area
    use `region_area_column` / `region_area_python`, which subtract holes
    STRUCTURALLY (ring index > 0 within a polygon) instead of by sign.
    """
    c = F.from_json(F.col(geom_col), MULTIPOLYGON_SCHEMA)["coordinates"]
    n_polys = F.size(c)
    n_rings = F.aggregate(c, F.lit(0), lambda acc, poly: acc + F.size(poly))
    n_vertices = F.aggregate(
        c,
        F.lit(0),
        lambda acc, poly: acc
        + F.aggregate(poly, F.lit(0), lambda a, ring: a + F.size(ring)),
    )
    area2 = F.aggregate(
        c,
        F.lit(0.0),
        lambda acc, poly: acc
        + F.aggregate(poly, F.lit(0.0), lambda a, ring: a + _ring_shoelace(ring)),
    )
    pts = F.flatten(F.flatten(c))
    xs = F.transform(pts, lambda p: p.getItem(0))
    ys = F.transform(pts, lambda p: p.getItem(1))
    return geoms.select(
        *geoms.columns,
        n_polys.alias("n_polys"),
        n_rings.alias("n_rings"),
        n_vertices.alias("n_vertices"),
        (area2 * F.lit(0.5)).alias("area"),
        (F.array_min(xs) + F.lit(0.0)).alias("xmin"),
        (F.array_min(ys) + F.lit(0.0)).alias("ymin"),
        (F.array_max(xs) + F.lit(0.0)).alias("xmax"),
        (F.array_max(ys) + F.lit(0.0)).alias("ymax"),
    )


def region_area_column(geom_col: str):
    """True enclosed region area as a pure-JVM column expression.

    Per polygon: |shoelace(exterior)| minus |shoelace(hole_i)| subtracted
    SEQUENTIALLY (left fold seeded with the exterior term), polygons
    left-folded from 0.0, one final *0.5 — `region_area_python` mirrors
    this exact FP operation order. Holes are identified structurally
    (ring index > 0), never by winding, because the kernel's output
    contract guarantees [exterior, holes...] nesting but NOT hole
    orientation (reference connect_edges.rs:288). Exact for kernel
    outputs and for any multipolygon whose polygons do not overlap each
    other; self-overlapping raw inputs count overlap with multiplicity
    (kernel-normalize first — e.g. intersect with the own bbox square —
    to get even-odd semantics, as tiling.tile_area_weights does).
    """
    c = F.from_json(F.col(geom_col), MULTIPOLYGON_SCHEMA)["coordinates"]
    area2 = F.aggregate(
        c,
        F.lit(0.0),
        lambda acc, poly: acc
        + F.when(
            F.size(poly) > 0,
            F.aggregate(
                F.slice(poly, 2, F.greatest(F.size(poly) - 1, F.lit(0))),
                F.abs(_ring_shoelace(F.element_at(poly, 1))),
                lambda a, ring: a - F.abs(_ring_shoelace(ring)),
            ),
        ).otherwise(F.lit(0.0)),
    )
    return area2 * F.lit(0.5)


def region_area_python(geom_json: str) -> float:
    """CPython twin of `region_area_column` with IDENTICAL FP operation
    order (per-ring left-fold shoelace, abs, sequential hole
    subtraction, polygon left fold, single *0.5). Used by the g19/g20
    fixture generators; must be edited in lockstep with the Spark
    expression above. Safe on empty multipolygons (0.0)."""
    coords = json.loads(geom_json)["coordinates"]
    area2 = 0.0
    for poly in coords:
        if not poly:
            area2 = area2 + 0.0
            continue
        poly_acc = None
        for ring in poly:
            ring_acc = 0.0
            for i in range(len(ring) - 1):
                ring_acc = ring_acc + (
                    ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
                )
            if poly_acc is None:
                poly_acc = abs(ring_acc)
            else:
                poly_acc = poly_acc - abs(ring_acc)
        area2 = area2 + poly_acc
    return area2 * 0.5


def iou_per_case(results: DataFrame) -> DataFrame:
    """Intersection-over-union per case from boolean-op result rows
    (the output of apply_boolean_ops / boolean_pipeline run with ops
    containing 'intersection' and 'union'): the standard overlap metric
    of geospatial ML evaluation, computed end-to-end inside the engine —
    kernel geometry (bit-exact, fixture-pinned) + the JVM region-area
    fold (structural hole subtraction; `region_area_python` is its
    pinned CPython twin) + ONE double division. The signed fold would
    mis-measure here: kernel outputs can carry holes wound the same way
    as their exterior (reference connect_edges.rs:288), so holes must be
    subtracted by ring position, not by sign.

    Output: (case_id, area_intersection, area_union, iou) for cases
    where BOTH ops returned status ok; iou = area_i / area_u, 0.0 when
    the union is empty. One hash-agg pivot on case_id — no self-join,
    no Python past the kernel stage.
    """
    m = results.filter(F.col("status") == "ok").select(
        "case_id",
        "op",
        region_area_column("result_json").alias("area"),
    )
    agg = m.groupBy("case_id").agg(
        F.max(F.when(F.col("op") == "intersection", F.col("area"))).alias(
            "area_intersection"
        ),
        F.max(F.when(F.col("op") == "union", F.col("area"))).alias(
            "area_union"
        ),
    )
    return (
        agg.filter(
            F.col("area_intersection").isNotNull()
            & F.col("area_union").isNotNull()
        )
        .withColumn(
            "iou",
            F.when(
                F.col("area_union") != 0.0,
                F.col("area_intersection") / F.col("area_union"),
            ).otherwise(F.lit(0.0)),
        )
    )


def measures_python(geom_json: str):
    """CPython twin of `geometry_measures` with IDENTICAL FP operation
    order (left folds, zero 0.0, same edge-term expression). Used by the
    g16 fixture generator (scripts/gen_geo_oracle_fixtures.py) and the
    bit-identity tests; must be edited in lockstep with the Spark
    expressions above."""
    coords = json.loads(geom_json)["coordinates"]
    n_polys = len(coords)
    n_rings = 0
    n_vertices = 0
    area2 = 0.0
    xs: list[float] = []
    ys: list[float] = []
    for poly in coords:
        n_rings += len(poly)
        poly_acc = 0.0
        for ring in poly:
            n_vertices += len(ring)
            ring_acc = 0.0
            for i in range(len(ring) - 1):
                ring_acc = ring_acc + (
                    ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
                )
            poly_acc = poly_acc + ring_acc
            for p in ring:
                xs.append(p[0])
                ys.append(p[1])
        area2 = area2 + poly_acc
    return {
        "n_polys": n_polys,
        "n_rings": n_rings,
        "n_vertices": n_vertices,
        "area": area2 * 0.5,
        "xmin": min(xs) + 0.0,
        "ymin": min(ys) + 0.0,
        "xmax": max(xs) + 0.0,
        "ymax": max(ys) + 0.0,
    }


def area_python(geom_json: str) -> float:
    """CPython twin of geometry_measures' `area` column ONLY, with the
    identical left-fold FP operation order — but safe on EMPTY
    multipolygons (measures_python's bbox min/max raises there, the JVM
    path yields NULL bboxes and area 0.0). Used by the g19 IoU fixture
    generator, where empty intersections are legitimate."""
    coords = json.loads(geom_json)["coordinates"]
    area2 = 0.0
    for poly in coords:
        poly_acc = 0.0
        for ring in poly:
            ring_acc = 0.0
            for i in range(len(ring) - 1):
                ring_acc = ring_acc + (
                    ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1]
                )
            poly_acc = poly_acc + ring_acc
        area2 = area2 + poly_acc
    return area2 * 0.5
