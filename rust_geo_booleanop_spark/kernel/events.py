"""Sweep events and their orderings.

Semantics reproduced from the reference (NOT a code port):
- event record + queue ordering: /root/reference/lib/src/boolean/sweep_event.rs:25-255
  (the reference inverts Ord because Rust's BinaryHeap is a max-heap; here we
  keep the natural ascending processing order for Python's min-heap `heapq`)
- sweep-line status ordering: /root/reference/lib/src/boolean/compare_segments.rs:10-108

Events form an object graph linked via `other` (the paired endpoint of the
same segment); algorithm state is mutated in place during the sweep exactly
where the reference mutates.
"""

from __future__ import annotations

from .predicates import (
    POINT_INTERSECTION,
    OVERLAP_INTERSECTION,
    segment_intersection,
    signed_area,
)

# Edge types (sweep_event.rs:10-16)
NORMAL = 0
NON_CONTRIBUTING = 1
SAME_TRANSITION = 2
DIFFERENT_TRANSITION = 3

# Result transitions (sweep_event.rs:18-23)
TRANS_NONE = 0
TRANS_IN_OUT = 1
TRANS_OUT_IN = 2


class Event:
    __slots__ = (
        "x",
        "y",
        "left",
        "other",
        "is_subject",
        "is_exterior_ring",
        "contour_id",
        "prev_in_result",
        "edge_type",
        "in_out",
        "other_in_out",
        "result_transition",
        "other_pos",
        "output_contour_id",
    )

    def __init__(self, contour_id, x, y, left, other, is_subject, is_exterior_ring):
        self.contour_id = contour_id
        self.x = x
        self.y = y
        self.left = left
        self.other = other
        self.is_subject = is_subject
        self.is_exterior_ring = is_exterior_ring
        self.prev_in_result = None
        self.edge_type = NORMAL
        self.in_out = False
        self.other_in_out = False
        self.result_transition = TRANS_NONE
        self.other_pos = 0
        self.output_contour_id = -1

    # ---- geometric helpers (sweep_event.rs:163-184) ----

    def is_below(self, px: float, py: float) -> bool:
        other = self.other
        if other is None:
            return False
        if self.left:
            return signed_area(self.x, self.y, other.x, other.y, px, py) > 0.0
        return signed_area(other.x, other.y, self.x, self.y, px, py) > 0.0

    def is_above(self, px: float, py: float) -> bool:
        return not self.is_below(px, py)

    def is_vertical(self) -> bool:
        other = self.other
        return other is not None and self.x == other.x

    @property
    def in_result(self) -> bool:
        return self.result_transition != TRANS_NONE

    # Min-heap ordering: `a < b` means "a is processed before b". Expressed
    # as the negated reverse comparison so that tie pairs (same point, flags
    # and orientation class) report False in both directions, like the
    # reference comparator does for its max-heap.
    #
    # Hand-inlined `not event_is_before(b, self)` (the hottest call in the
    # sweep). The orientation branch folds `b.is_below(...)` into the one
    # signed_area already computed: swapping the first two arguments of
    # orient2d exactly negates it (the float products are identical and the
    # final subtraction flips; the exact fallback negates too), so
    # is_below == (sa > 0) for a left event and (sa < 0) for a right one.
    def __lt__(self, b: "Event") -> bool:
        sx = self.x
        bx = b.x
        if sx != bx:
            return sx < bx
        sy = self.y
        by = b.y
        if sy != by:
            return sy < by
        if self.left != b.left:
            return b.left
        so = self.other
        bo = b.other
        if so is not None and bo is not None:
            sa = signed_area(bx, by, bo.x, bo.y, so.x, so.y)
            if sa != 0.0:
                # not b.is_below(self.other): b left -> not(sa>0) -> sa<0
                return sa < 0.0 if b.left else sa > 0.0
        return self.is_subject and not b.is_subject

    def __repr__(self):  # debugging aid only
        return (
            f"Event(({self.x}, {self.y}), {'L' if self.left else 'R'}, "
            f"{'subj' if self.is_subject else 'clip'})"
        )


def event_is_before(a: Event, b: Event) -> bool:
    """Natural event-queue order (ascending sweep order).

    Equivalent (de-inverted) to the reference's Ord impl at
    sweep_event.rs:220-255: x asc, y asc, right endpoints before left,
    bottom segment first (orientation), clipping/subject tiebreak.
    """
    ax = a.x
    bx = b.x
    if ax != bx:
        return ax < bx
    ay = a.y
    by = b.y
    if ay != by:
        return ay < by
    if a.left != b.left:
        return not a.left  # right endpoint events first
    ao = a.other
    bo = b.other
    if ao is not None and bo is not None:
        sa = signed_area(ax, ay, ao.x, ao.y, bo.x, bo.y)
        if sa != 0.0:
            # a.is_below(b.other) folded into the same orientation value
            # (orient2d is exactly antisymmetric in its first two args)
            return sa > 0.0 if a.left else sa < 0.0
    return not ((not a.is_subject) and b.is_subject)


def compare_segments(se1: Event, se2: Event) -> int:
    """Sweep-line status order, bottom (-1) to top (+1) at the current x.

    Semantics of compare_segments.rs:10-108: temporal normalization, the
    non-collinear orientation cascade, the crossing-verification via a real
    intersection computation, and the collinear tiebreaks. Equality (0) only
    for the identical event object.
    """
    if se1 is se2:
        return 0

    # Normalize to (older, newer) in queue order; invert result if swapped.
    if event_is_before(se1, se2):
        se_old, se_new, flip = se1, se2, 1
    else:
        se_old, se_new, flip = se2, se1, -1

    o_old = se_old.other
    o_new = se_new.other
    if o_old is None or o_new is None:
        # reference release fallback for an unset paired endpoint
        # (compare_segments.rs:104-107 `less_if(true)`): order arbitrarily
        # instead of crashing — unreachable from boolean_op, which always
        # links events before insertion
        return -flip

    ox = se_old.x
    oy = se_old.y
    nx = se_new.x
    ny = se_new.y
    sa_l = signed_area(ox, oy, o_old.x, o_old.y, nx, ny)
    sa_r = signed_area(ox, oy, o_old.x, o_old.y, o_new.x, o_new.y)
    if sa_l != 0.0 or sa_r != 0.0:
        # Not collinear.
        if ox == nx and oy == ny:
            # Identical left endpoints: order by the right endpoint.
            # se_old.is_below(o_new) is exactly sa_r > 0 (se_old is left).
            return -flip if sa_r > 0.0 else flip
        if ox == nx:
            # Same x, different y: order by y.
            return -flip if oy < ny else flip
        if (sa_l > 0.0) == (sa_r > 0.0):
            # Both of the newer segment's endpoints on one side.
            return -flip if sa_l > 0.0 else flip
        if sa_l == 0.0:
            # Newer left endpoint exactly on the older segment: use right.
            return -flip if sa_r > 0.0 else flip
        # Orientations say the segments cross; verify with a true
        # intersection that differs from the newer left endpoint.
        kind, p, _q = segment_intersection(
            se_old.x, se_old.y, o_old.x, o_old.y, se_new.x, se_new.y, o_new.x, o_new.y
        )
        if kind == POINT_INTERSECTION:
            if p[0] == se_new.x and p[1] == se_new.y:
                return -flip if sa_r > 0.0 else flip
            return -flip if sa_l > 0.0 else flip
        if kind != OVERLAP_INTERSECTION:
            return -flip if sa_l > 0.0 else flip
        # Overlap: fall through to the collinear logic.

    # Collinear segments.
    if se_old.is_subject == se_new.is_subject:
        if se_old.x == se_new.x and se_old.y == se_new.y:
            return -flip if se_old.contour_id < se_new.contour_id else flip
        return -flip  # purely temporal: older is below
    return -flip if se_old.is_subject else flip
