"""Robust geometric predicates and FP-faithful segment intersection.

Semantics reproduced from the reference kernel (NOT a code port):
- orientation sign: /root/reference/lib/src/boolean/signed_area.rs:13-19
  (adaptive-precision orient2d; only the *sign* is consumed by callers)
- segment intersection: /root/reference/lib/src/boolean/segment_intersection.rs:67-154
  (parametric cross/dot form with the intersection point clamped into the
  segments' shared bounding box for numerical stability)

All arithmetic is IEEE-754 double; Python floats are doubles, so keeping the
same operation order reproduces results bit-for-bit.
"""

from __future__ import annotations

from fractions import Fraction

# Shewchuk's static filter constant for orient2d: 3 + 16 * eps, eps = 2^-53.
_CCW_ERRBOUND = (3.0 + 16.0 * 2.0**-53) * 2.0**-53


def signed_area(p0x: float, p0y: float, p1x: float, p1y: float, p2x: float, p2y: float) -> float:
    """Orientation of the triangle (p0, p1, p2).

    Positive if counter-clockwise, negative if clockwise, 0.0 if collinear.
    Fast float filter with an exact rational fallback; the returned magnitude
    is only meaningful when the filter is conclusive (callers use the sign).
    """
    detleft = (p0x - p2x) * (p1y - p2y)
    detright = (p0y - p2y) * (p1x - p2x)
    det = detleft - detright

    if detleft > 0.0:
        if detright <= 0.0:
            return det
        detsum = detleft + detright
    elif detleft < 0.0:
        if detright >= 0.0:
            return det
        detsum = -detleft - detright
    else:
        return det

    errbound = _CCW_ERRBOUND * detsum
    if det >= errbound or -det >= errbound:
        return det

    # Exact fallback: floats are exactly representable as rationals.
    exact = (Fraction(p0x) - Fraction(p2x)) * (Fraction(p1y) - Fraction(p2y)) - (
        Fraction(p0y) - Fraction(p2y)
    ) * (Fraction(p1x) - Fraction(p2x))
    if exact > 0:
        return 1.0
    if exact < 0:
        return -1.0
    return 0.0


# Segment-intersection result kinds
NO_INTERSECTION = 0
POINT_INTERSECTION = 1
OVERLAP_INTERSECTION = 2


def segment_intersection(
    a1x: float, a1y: float, a2x: float, a2y: float, b1x: float, b1y: float, b2x: float, b2y: float
):
    """Intersect segments (a1,a2) and (b1,b2).

    Returns (kind, p, q):
      kind == NO_INTERSECTION      -> (0, None, None)
      kind == POINT_INTERSECTION   -> (1, (x, y), None)
      kind == OVERLAP_INTERSECTION -> (2, (x1, y1), (x2, y2))

    Matches the reference FP behavior operation-for-operation, including the
    clamp of results into the segments' shared bbox
    (segment_intersection.rs:44-84) and the exact ==0/==1 parameter checks.
    """
    # Shared bounding box of the two segments; disjoint boxes -> no intersection.
    a_min_x, a_max_x = (a1x, a2x) if a1x < a2x else (a2x, a1x)
    a_min_y, a_max_y = (a1y, a2y) if a1y < a2y else (a2y, a1y)
    b_min_x, b_max_x = (b1x, b2x) if b1x < b2x else (b2x, b1x)
    b_min_y, b_max_y = (b1y, b2y) if b1y < b2y else (b2y, b1y)
    lo_x = a_min_x if a_min_x > b_min_x else b_min_x
    lo_y = a_min_y if a_min_y > b_min_y else b_min_y
    hi_x = a_max_x if a_max_x < b_max_x else b_max_x
    hi_y = a_max_y if a_max_y < b_max_y else b_max_y
    if not (lo_x <= hi_x and lo_y <= hi_y):
        return NO_INTERSECTION, None, None

    def clamp(x: float, y: float):
        if x < lo_x:
            x = lo_x
        elif x > hi_x:
            x = hi_x
        if y < lo_y:
            y = lo_y
        elif y > hi_y:
            y = hi_y
        return (x, y)

    vax = a2x - a1x
    vay = a2y - a1y
    vbx = b2x - b1x
    vby = b2y - b1y
    ex = b1x - a1x
    ey = b1y - a1y

    kross = vax * vby - vay * vbx
    sqr_kross = kross * kross
    sqr_len_a = vax * vax + vay * vay

    if sqr_kross > 0.0:
        s = (ex * vby - ey * vbx) / kross
        if s < 0.0 or s > 1.0:
            return NO_INTERSECTION, None, None
        t = (ex * vay - ey * vax) / kross
        if t < 0.0 or t > 1.0:
            return NO_INTERSECTION, None, None
        if s == 0.0 or s == 1.0:
            return POINT_INTERSECTION, clamp(a1x + s * vax, a1y + s * vay), None
        if t == 0.0 or t == 1.0:
            return POINT_INTERSECTION, clamp(b1x + t * vbx, b1y + t * vby), None
        return POINT_INTERSECTION, clamp(a1x + s * vax, a1y + s * vay), None

    kross = ex * vay - ey * vax
    sqr_kross = kross * kross
    if sqr_kross > 0.0:
        return NO_INTERSECTION, None, None

    # Zero-length segment a: the reference's 0/0 arithmetic produces NaN,
    # every subsequent comparison is false, and it returns None — mirror
    # that outcome instead of raising ZeroDivisionError.
    if sqr_len_a == 0.0:
        return NO_INTERSECTION, None, None

    # Collinear: project b's endpoints onto a's parameter space.
    sa = (vax * ex + vay * ey) / sqr_len_a
    sb = sa + (vax * vbx + vay * vby) / sqr_len_a
    smin = sa if sa < sb else sb
    smax = sa if sa > sb else sb

    if smin <= 1.0 and smax >= 0.0:
        if smin == 1.0:
            return POINT_INTERSECTION, clamp(a1x + smin * vax, a1y + smin * vay), None
        if smax == 0.0:
            return POINT_INTERSECTION, clamp(a1x + smax * vax, a1y + smax * vay), None
        lo_s = smin if smin > 0.0 else 0.0
        hi_s = smax if smax < 1.0 else 1.0
        return (
            OVERLAP_INTERSECTION,
            clamp(a1x + lo_s * vax, a1y + lo_s * vay),
            clamp(a1x + hi_s * vax, a1y + hi_s * vay),
        )

    return NO_INTERSECTION, None, None
