"""Ordered sweep-line status structure.

The reference uses a splay tree with a closure comparator
(/root/reference/lib/src/splay/, used at subdivide_segments.rs:23).
The splay tree's self-adjustment is a performance detail, not semantics:
what the algorithm needs is an ordered set with insert / remove / prev /
next under the `compare_segments` comparator, where equality holds only
for the identical object.

We use a plain Python list kept in comparator order: binary-search
insertion, identity-based membership/removal, index-based neighbors.
This is robust against the comparator's known mid-sweep mutability
(segment endpoints change on subdivision): once inserted, an event's
relative position is stable, like a tree node that doesn't rebalance.
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

    def index_of(self, event: Event) -> int:
        for i, e in enumerate(self._items):
            if e is event:
                return i
        return -1

    def contains(self, event: Event) -> bool:
        return self.index_of(event) >= 0

    def remove(self, event: Event) -> None:
        i = self.index_of(event)
        if i >= 0:
            del self._items[i]

    def remove_at(self, i: int) -> None:
        del self._items[i]

    def prev(self, event: Event):
        i = self.index_of(event)
        if i > 0:
            return self._items[i - 1]
        return None

    def next(self, event: Event):
        i = self.index_of(event)
        if 0 <= i < len(self._items) - 1:
            return self._items[i + 1]
        return None

    def prev_of_index(self, i: int):
        return self._items[i - 1] if i > 0 else None

    def next_of_index(self, i: int):
        return self._items[i + 1] if i < len(self._items) - 1 else None

    def __len__(self):
        return len(self._items)
