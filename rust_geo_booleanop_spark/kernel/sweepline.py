"""Ordered sweep-line status structure.

The reference uses a splay tree with a closure comparator
(/root/reference/lib/src/splay/, used at subdivide_segments.rs:23).
The splay tree's self-adjustment is a performance detail, not semantics:
what the algorithm needs is an ordered set with insert / remove / prev /
next under the `compare_segments` comparator, where equality holds only
for the identical object.

We use a plain Python list kept in comparator order: binary-search
insertion, identity-based membership/removal, index-based neighbors.
Once inserted, an event's relative position is stable, like a tree node
that doesn't rebalance.

Honest caveat on mid-sweep comparator mutability: divide_segment can
repoint a STORED event's `other`, leaving the list locally unsorted, so
a subsequent insert's bisect placement is comparator-path-dependent.
The reference has the same hazard class — its splay-tree search also
consults mutated keys along a structure-dependent path — so "match the
reference" is defined by the 45-fixture suite (exact, both operand
orders), which both implementations satisfy, not by equivalence on
arbitrary adversarial inputs.
"""

from __future__ import annotations

from .events import Event, compare_segments


class SweepLine:
    __slots__ = ("_items",)

    def __init__(self):
        self._items = []

    def insert(self, event: Event) -> int:
        items = self._items
        lo, hi = 0, len(items)
        while lo < hi:
            mid = (lo + hi) // 2
            if compare_segments(event, items[mid]) < 0:
                hi = mid
            else:
                lo = mid + 1
        items.insert(lo, event)
        return lo

    # Below this status width a plain C-level identity scan beats the
    # comparator bisect: one compare_segments probe (~30x an identity
    # check) only amortizes once log2(n) probes replace ~n/2 checks.
    _BISECT_MIN = 512

    def index_of(self, event: Event) -> int:
        """Index of `event` by IDENTITY (or -1).

        Narrow status (the common case — grids, coastlines, clipped
        tiles): linear identity scan, no comparator calls.

        Wide status (continent-scale inputs with thousands of segments
        crossing one sweep position): binary search with the same
        comparator that placed the event. While the list order is
        consistent with `compare_segments` for `event`, every converging
        search path must probe the event's own slot (the identity check
        fires before the comparator), so the bisect finds it in O(log n).
        The comparator can be INVALIDATED mid-sweep (divide_segment
        repoints a stored event's `other`, see module docstring); then the
        bisect may converge without an identity hit — fall back to the
        linear scan. Either path returns the event's unique positional
        index, so semantics are exactly those of a full scan.
        """
        items = self._items
        if len(items) >= self._BISECT_MIN:
            lo, hi = 0, len(items)
            while lo < hi:
                mid = (lo + hi) // 2
                e = items[mid]
                if e is event:
                    return mid
                if compare_segments(event, e) < 0:
                    hi = mid
                else:
                    lo = mid + 1
        for i, e in enumerate(items):
            if e is event:
                return i
        return -1

    def remove_at(self, i: int) -> None:
        del self._items[i]

    def prev_of_index(self, i: int):
        return self._items[i - 1] if i > 0 else None

    def next_of_index(self, i: int):
        return self._items[i + 1] if i < len(self._items) - 1 else None

    def __len__(self):
        return len(self._items)
