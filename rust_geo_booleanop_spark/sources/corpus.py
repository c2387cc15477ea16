"""Deterministic synthetic geometry corpus.

Seeded generator shapes in the spirit of the reference's benchmark data
generators (/root/reference/tests/src/data_generators.rs:34-141 — rect
grids, nested rings, seeded random triangles), re-expressed independently.
Used to synthesize the Common-Crawl-style `documents` table: every page
embeds one (Multi)Polygon; consecutive doc ids form subject/clipping pairs.

Everything is a pure function of the case index — no RNG state shared
across rows, so any executor can rebuild any row (deterministic lineage).
"""

from __future__ import annotations

import math
import random
from functools import lru_cache

# Local frame: all template shapes live in [0, 256)^2.
FRAME = 256.0
# Replica translation pitch; replicas never overlap spatially.
PITCH = 512.0
# Distinct case templates (subject, clipping) before replication.
CORPUS_SIZE = 64
# Every HEAVY_EVERY-th case uses the heavy template (skew realism).
HEAVY_EVERY = 61


def _rect(x0, y0, w, h):
    return [[(x0, y0), (x0 + w, y0), (x0 + w, y0 + h), (x0, y0 + h), (x0, y0)]]


def _rect_with_hole(x0, y0, w, h, margin):
    outer = _rect(x0, y0, w, h)[0]
    hx0, hy0 = x0 + margin, y0 + margin
    hx1, hy1 = x0 + w - margin, y0 + h - margin
    hole = [(hx0, hy0), (hx0, hy1), (hx1, hy1), (hx1, hy0), (hx0, hy0)]
    return [outer, hole]


def _grid(nx, ny, size, gap, ox=0.0, oy=0.0):
    polys = []
    for i in range(nx):
        for j in range(ny):
            x0 = ox + i * (size + gap)
            y0 = oy + j * (size + gap)
            polys.append(_rect(x0, y0, size, size))
    return polys


def _ring(cx, cy, r, n_points):
    pts = []
    for k in range(n_points):
        a = 2.0 * math.pi * k / n_points
        pts.append((cx + r * math.cos(a), cy + r * math.sin(a)))
    pts.append(pts[0])
    return pts


def _nested_rings(cx, cy, n, r0, dr, n_points):
    """n annuli: each polygon is an outer ring with an inner hole."""
    polys = []
    for k in range(n):
        outer_r = r0 + 2 * k * dr
        inner_r = outer_r - dr * 0.6
        polys.append([_ring(cx, cy, outer_r, n_points), _ring(cx, cy, inner_r, n_points)])
    return polys


def _random_triangles(n, seed, span=FRAME, size=24.0):
    rng = random.Random(seed)
    polys = []
    for _ in range(n):
        cx = rng.uniform(size, span - size)
        cy = rng.uniform(size, span - size)
        pts = []
        for _ in range(3):
            pts.append((cx + rng.uniform(-size, size), cy + rng.uniform(-size, size)))
        pts.append(pts[0])
        polys.append([pts])
    return polys


def _l_shape(x0, y0, s):
    return [
        [
            (x0, y0),
            (x0 + s, y0),
            (x0 + s, y0 + s / 2),
            (x0 + s / 2, y0 + s / 2),
            (x0 + s / 2, y0 + s),
            (x0, y0 + s),
            (x0, y0),
        ]
    ]


@lru_cache(maxsize=None)
def case_template(template_idx: int):
    """(subject, clipping) multipolygons for a template index (mod CORPUS_SIZE)."""
    t = template_idx % CORPUS_SIZE
    kind = t % 8
    v = 1.0 + (t // 8)  # small per-template variation factor

    if kind == 0:  # two overlapping rectangles
        return ([_rect(32.0, 32.0, 96.0 + v, 96.0)], [_rect(96.0, 96.0, 96.0, 96.0 - v)])
    if kind == 1:  # holed rectangle vs rectangle crossing the hole
        return (
            [_rect_with_hole(32.0, 32.0, 160.0, 160.0, 32.0 + v)],
            [_rect(16.0, 96.0, 224.0, 32.0 + v)],
        )
    if kind == 2:  # small rect grid vs offset grid
        return (
            _grid(4, 4, 24.0, 16.0, 16.0, 16.0),
            _grid(4, 4, 24.0, 16.0, 16.0 + 12.0 + v, 16.0 + 12.0),
        )
    if kind == 3:  # nested annuli vs rect band
        return (
            _nested_rings(128.0, 128.0, 3, 24.0 + v, 12.0, 24),
            [_rect(16.0, 112.0, 224.0, 32.0)],
        )
    if kind == 4:  # seeded random triangles vs triangles
        return (_random_triangles(6, 1000 + t), _random_triangles(6, 2000 + t))
    if kind == 5:  # touching boxes (degenerate shared edge)
        return ([_rect(32.0, 32.0, 64.0, 64.0)], [_rect(96.0, 32.0, 64.0 + v, 64.0)])
    if kind == 6:  # multipolygon of squares vs horizontal band
        return (
            _grid(3, 1, 48.0, 24.0, 16.0, 104.0),
            [_rect(0.0, 120.0, 240.0, 24.0 + v)],
        )
    # kind == 7: L-shapes overlapping
    return ([_l_shape(32.0, 32.0, 128.0)], [_l_shape(96.0 - v, 96.0, 128.0)])


@lru_cache(maxsize=1)
def heavy_template():
    """A deliberately expensive case: 12x12 grid xor-style overlap."""
    return (
        _grid(12, 12, 12.0, 6.0, 8.0, 8.0),
        _grid(12, 12, 12.0, 6.0, 17.0, 17.0),
    )


def _translate(mp, dx, dy):
    if dx == 0.0 and dy == 0.0:
        return mp
    return [[[(x + dx, y + dy) for (x, y) in ring] for ring in poly] for poly in mp]


def case_offset(case_idx: int):
    """Every case gets its own spatial slot on a PITCH grid, so geometries
    of different cases never overlap — candidate spatial joins then pair
    exactly the intended subject/clipping per case."""
    return (PITCH * (case_idx % 4096), PITCH * (case_idx // 4096))


def case_geometry(case_idx: int):
    """(subject, clipping) for a global case index, translated to its slot."""
    if case_idx % HEAVY_EVERY == 0 and case_idx > 0:
        subject, clipping = heavy_template()
    else:
        subject, clipping = case_template(case_idx % CORPUS_SIZE)
    dx, dy = case_offset(case_idx)
    return _translate(subject, dx, dy), _translate(clipping, dx, dy)
