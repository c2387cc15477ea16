"""Kernel unit tests, modeled on the reference's in-module test strategy
(SURVEY.md §5: sweep_event.rs, fill_queue.rs, signed_area.rs,
segment_intersection.rs, divide_segment.rs tests)."""

import math

from rust_geo_booleanop_spark.kernel.predicates import (
    NO_INTERSECTION,
    OVERLAP_INTERSECTION,
    POINT_INTERSECTION,
    segment_intersection,
    signed_area,
)
from rust_geo_booleanop_spark.kernel.events import Event, event_is_before, compare_segments
from rust_geo_booleanop_spark.kernel.booleanop import boolean_op, divide_segment


def sa(p0, p1, p2):
    return signed_area(p0[0], p0[1], p1[0], p1[1], p2[0], p2[1])


class TestSignedArea:
    def test_analytical(self):
        # signed_area.rs:27-34
        assert sa((0, 0), (0, 1), (1, 1)) == -1.0
        assert sa((0, 1), (0, 0), (1, 0)) == 1.0
        assert sa((0, 0), (1, 1), (2, 2)) == 0.0
        assert sa((-1, 0), (2, 3), (0, 1)) == 0.0
        assert sa((2, 3), (-1, 0), (0, 1)) == 0.0

    def test_sign_agrees_with_exact_rational(self):
        # near-collinear triples (ULP perturbations) must get the exact sign
        from fractions import Fraction

        cases = []
        for bx in (0.1, 0.3, 12.0, 1e-9, 1e9):
            for k in (-2, -1, 0, 1, 2):
                py = 2 * bx
                for _ in range(abs(k)):
                    py = math.nextafter(py, math.inf if k > 0 else -math.inf)
                cases.append(((0.0, 0.0), (bx, bx), (2 * bx, py)))
        for p0, p1, p2 in cases:
            got = sa(p0, p1, p2)
            exact = (Fraction(p0[0]) - Fraction(p2[0])) * (
                Fraction(p1[1]) - Fraction(p2[1])
            ) - (Fraction(p0[1]) - Fraction(p2[1])) * (Fraction(p1[0]) - Fraction(p2[0]))
            want = 0 if exact == 0 else (1 if exact > 0 else -1)
            got_sign = 0 if got == 0.0 else (1 if got > 0.0 else -1)
            assert got_sign == want, (p0, p1, p2)


def ev(x, y, left=False, is_subject=False, contour_id=0):
    return Event(contour_id, float(x), float(y), left, None, is_subject, True)


def pair(x, y, ox, oy, is_subject=True, contour_id=0):
    """Left/right event pair; asserts the left-right invariant."""
    r = ev(ox, oy, False, is_subject, contour_id)
    l = ev(x, y, True, is_subject, contour_id)
    l.other = r
    r.other = l
    assert event_is_before(l, r)
    return l, r


class TestEventQueueOrder:
    # fill_queue.rs:126-172
    def test_least_by_x(self):
        assert event_is_before(ev(0, 0), ev(0.5, 0.5))

    def test_least_by_y(self):
        assert event_is_before(ev(0, 0), ev(0, 0.5))

    def test_right_before_left(self):
        right = ev(0, 0, left=False)
        left = ev(0, 0, left=True)
        assert event_is_before(right, left)
        assert not event_is_before(left, right)

    def test_shared_edge_not_collinear(self):
        e1 = ev(0, 0, True)
        e1.other = ev(1, 1)
        e2 = ev(0, 0, True)
        e2.other = ev(2, 3)
        # lower segment first
        assert event_is_before(e1, e2)

    def test_collinear_subject_first(self):
        e1 = ev(0, 0, True, is_subject=True)
        e1.other = ev(1, 1, is_subject=True)
        e2 = ev(0, 0, True, is_subject=False)
        e2.other = ev(2, 2, is_subject=False)
        assert event_is_before(e1, e2)

    def test_star_pattern(self):
        # sweep_event.rs:368-412: at one vertex, R events in clockwise order
        # come before L events in counter-clockwise order.
        z = 0.0
        a = [
            pair(0.0, -1.0, z, z)[1],  # vertical first
            pair(-2.0, -6.0, z, z)[1],
            pair(-1.0, -2.0, z, z)[1],
            pair(-1.0, -1.0, z, z)[1],
            pair(-2.0, -1.0, z, z)[1],
            pair(-2.0, 1.0, z, z)[1],
            pair(-1.0, 1.0, z, z)[1],
            pair(-1.0, 2.0, z, z)[1],
            pair(-2.0, 6.0, z, z)[1],
        ]
        b = [
            pair(z, z, 2.0, -6.0)[0],
            pair(z, z, 1.0, -2.0)[0],
            pair(z, z, 1.0, -1.0)[0],
            pair(z, z, 2.0, -1.0)[0],
            pair(z, z, 2.0, 1.0)[0],
            pair(z, z, 1.0, 1.0)[0],
            pair(z, z, 1.0, 2.0)[0],
            pair(z, z, 2.0, 6.0)[0],
            pair(z, z, 0.0, 1.0)[0],  # vertical last
        ]
        order = a + b
        for i in range(len(order) - 1):
            for j in range(i + 1, len(order)):
                assert event_is_before(order[i], order[j]), (i, j)


class TestSegmentIntersection:
    # segment_intersection.rs test themes
    def test_proper_crossing(self):
        kind, p, _ = segment_intersection(0, 0, 2, 2, 0, 2, 2, 0)
        assert kind == POINT_INTERSECTION and p == (1.0, 1.0)

    def test_no_intersection(self):
        kind, _, _ = segment_intersection(0, 0, 1, 1, 2, 2, 3, 3.5)
        assert kind == NO_INTERSECTION

    def test_endpoint_touch(self):
        kind, p, _ = segment_intersection(0, 0, 1, 1, 1, 1, 2, 0)
        assert kind == POINT_INTERSECTION and p == (1.0, 1.0)

    def test_collinear_overlap(self):
        kind, p, q = segment_intersection(0, 0, 4, 0, 1, 0, 6, 0)
        assert kind == OVERLAP_INTERSECTION
        assert p == (1.0, 0.0) and q == (4.0, 0.0)

    def test_collinear_disjoint(self):
        kind, _, _ = segment_intersection(0, 0, 1, 0, 2, 0, 3, 0)
        assert kind == NO_INTERSECTION

    def test_collinear_point_touch(self):
        kind, p, _ = segment_intersection(0, 0, 1, 0, 1, 0, 2, 0)
        assert kind == POINT_INTERSECTION and p == (1.0, 0.0)


class TestDivideSegment:
    def test_divide_mid(self):
        # divide_segment.rs:90-138 theme: splitting at an interior point
        l, r = pair(0.0, 0.0, 10.0, 10.0)
        queue = []
        divide_segment(l, 5.0, 5.0, queue)
        assert l.other is not r
        assert l.other.x == 5.0 and l.other.y == 5.0
        assert r.other.x == 5.0 and r.other.y == 5.0
        assert len(queue) == 2

    def test_ulp_nudge_on_vertical_first_subsegment(self):
        l, r = pair(0.0, 0.0, 1.0, -10.0)
        queue = []
        # split point directly below the left endpoint -> +x ULP nudge
        divide_segment(l, 0.0, -5.0, queue)
        assert l.other.x == math.nextafter(0.0, math.inf)


class TestCompareSegments:
    def test_identity_equal(self):
        l, _ = pair(0.0, 0.0, 1.0, 1.0)
        assert compare_segments(l, l) == 0

    def test_not_collinear_shared_left(self):
        # compare_segments.rs:118-137 theme
        l1, _ = pair(0.0, 0.0, 1.0, 1.0)
        l2, _ = pair(0.0, 0.0, 2.0, 3.0)
        assert compare_segments(l1, l2) == -1
        assert compare_segments(l2, l1) == 1

    def test_collinear_different_polygons_subject_below(self):
        l1, _ = pair(0.0, 0.0, 1.0, 1.0, is_subject=True)
        l2, _ = pair(0.5, 0.5, 3.0, 3.0, is_subject=False)
        assert compare_segments(l1, l2) == -1


class TestBooleanOpBasics:
    def test_square_intersection(self):
        a = [[[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]]]
        b = [[[(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)]]]
        assert boolean_op(a, b, "intersection") == [
            [[(1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0)]]
        ]

    def test_disjoint_short_circuit(self):
        a = [[[(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]]]
        b = [[[(5.0, 5.0), (6.0, 5.0), (6.0, 6.0), (5.0, 6.0), (5.0, 5.0)]]]
        assert boolean_op(a, b, "intersection") == []
        assert boolean_op(a, b, "diff") == a
        assert boolean_op(a, b, "union") == a + b
        assert boolean_op(a, b, "xor") == a + b

    def test_diff_ba_equals_swapped_diff(self):
        a = [[[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]]]
        b = [[[(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)]]]
        assert boolean_op(a, b, "diff_ba") == boolean_op(b, a, "diff")


class TestSweepLineBisect:
    def test_wide_status_bisect_matches_linear_scan(self):
        """Above _BISECT_MIN the status lookup switches to the comparator
        bisect; results must equal the plain linear-scan implementation on
        a wide-status input (staggered sliver stack, status width ~1400)."""
        from rust_geo_booleanop_spark.kernel.sweepline import SweepLine

        n = 700
        a = []
        for i in range(n):
            xr = 60.0 + (i * 7919 % 997) / 30.0
            y = float(3 * i)
            a.append([[(0.0, y), (xr, y), (xr, y + 1.0), (0.0, y + 1.0), (0.0, y)]])
        b = [[[(-1.0, -1.0), (101.0, -1.0), (101.0, 3 * n + 1.0),
               (-1.0, 3 * n + 1.0), (-1.0, -1.0)]]]

        got = boolean_op(a, b, "intersection")

        def linear_index_of(self, event):
            for i, e in enumerate(self._items):
                if e is event:
                    return i
            return -1

        orig = SweepLine.index_of
        SweepLine.index_of = linear_index_of
        try:
            want = boolean_op(a, b, "intersection")
        finally:
            SweepLine.index_of = orig
        assert got == want
        assert len(got) == n


class TestF32Surface:
    """f32-width mode (reference Float-trait parity: helper.rs:8-10)."""

    def test_f32_results_are_f32_representable_and_close_to_f64(self):
        import glob

        import numpy as np

        from rust_geo_booleanop_spark.kernel import boolean_op_f32, load_fixture

        paths = sorted(
            glob.glob("/root/reference/tests/fixtures/generic_test_cases/*.geojson")
        )[:8]
        checked = 0
        for path in paths:
            subject, clipping, expected = load_fixture(path)
            for op, exp, _swap in expected:
                got = boolean_op_f32(subject, clipping, op)
                # every output coordinate is exactly binary32
                for poly in got:
                    for ring in poly:
                        for x, y in ring:
                            assert float(np.float32(x)) == x
                            assert float(np.float32(y)) == y
                # same structure as the f64 expectation, coordinates within
                # f32 rounding of it (fixtures are far from degeneracy)
                assert len(got) == len(exp)
                for gp, wp in zip(got, exp):
                    assert len(gp) == len(wp)
                    for gr, wr in zip(gp, wp):
                        assert len(gr) == len(wr)
                        for (gx, gy), (wx, wy) in zip(gr, wr):
                            scale = max(abs(wx), abs(wy), 1.0)
                            assert abs(gx - wx) <= 1e-6 * scale
                            assert abs(gy - wy) <= 1e-6 * scale
                checked += 1
        assert checked >= 8

    def test_quantize_idempotent(self):
        from rust_geo_booleanop_spark.kernel import quantize_multipolygon_f32

        mp = [[[(0.1, 0.2), (1.0000000001, 2.0), (0.1, 0.2)]]]
        q1 = quantize_multipolygon_f32(mp)
        assert quantize_multipolygon_f32(q1) == q1
        assert q1[0][0][0] != (0.1, 0.2)  # 0.1 is not f32-representable


class TestReferenceApiParity:
    def test_named_ops_equal_boolean_op(self):
        """union/intersection/difference/xor wrappers (BooleanOp trait
        surface, mod.rs:33-85) delegate to the same kernel."""
        from rust_geo_booleanop_spark.kernel import (
            difference,
            intersection,
            union,
            xor,
        )

        a = [[[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]]]
        b = [[[(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)]]]
        assert intersection(a, b) == boolean_op(a, b, "intersection")
        assert union(a, b) == boolean_op(a, b, "union")
        assert difference(a, b) == boolean_op(a, b, "diff")
        assert xor(a, b) == boolean_op(a, b, "xor")
        assert len(union(a, b)) == 1 and len(xor(a, b)) == 2
