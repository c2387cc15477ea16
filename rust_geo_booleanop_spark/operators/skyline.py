"""2-D Pareto frontier (skyline) over document metrics.

Engine requirement (no reference counterpart — the reference is the
boolean-op kernel, 21re/rust-geo-booleanop lib/src/boolean/mod.rs): a
training-data curation pipeline picks documents on the quality/cost
frontier, e.g. "most distinct tokens for the fewest total tokens". The
skyline of a set under (minimize x, maximize y) is every row not
dominated by another row that is at least as good on both axes and
strictly better on one.

Scale shape (100 TB): the skyline is distributive —
``skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B))`` — so stage 1
computes a partial frontier per input partition with mapInPandas,
folding Arrow batch by Arrow batch so the per-task working set is
bounded by the running frontier size (never the partition size), and
stage 2 repartition(1)s only the partial frontiers (tiny vs the input;
worst case the true frontier itself, which is also the output size —
any skyline algorithm pays at least the output) through the same fold.
No global sort, no window, no cartesian product; the only shuffle moves
partial frontiers.

Determinism: set semantics. Ties — rows with identical (x, y) — are
mutually non-dominating, so ALL of them survive, matching the SQL
``NOT EXISTS`` dominance definition the DuckDB oracle uses.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _frontier_mask(
    x: np.ndarray, y: np.ndarray, minimize_x: bool
) -> np.ndarray:
    """Boolean skyline membership for (minimize-or-maximize x,
    maximize y) points.

    Vectorized: group y-max per distinct x; the best y among
    strictly-better-x groups is a prefix-max (minimize_x) or suffix-max
    (maximize) over ascending x; an x-group survives iff its y-max
    beats that, the extreme-x group always survives (nothing has
    strictly better x — handled explicitly rather than via a dtype-min
    sentinel, which breaks when a real y EQUALS the dtype minimum), and
    a row survives iff it equals its group's surviving (x, ymax) pair
    (exact match — no float round-trip and no sign negation, so int64
    metrics keep full precision incl. int64 min).
    """
    if len(x) == 0:
        return np.zeros(0, dtype=bool)
    pdf = pd.DataFrame({"x": x, "y": y})
    grouped = pdf.groupby("x", sort=True)["y"].max()
    xs = grouped.index.to_numpy()
    ymax = grouped.to_numpy()
    alive = np.empty(len(ymax), dtype=bool)
    if minimize_x:
        best_smaller = np.maximum.accumulate(ymax)
        alive[0] = True
        alive[1:] = ymax[1:] > best_smaller[:-1]
    else:
        best_greater = np.maximum.accumulate(ymax[::-1])[::-1]
        alive[-1] = True
        alive[:-1] = ymax[:-1] > best_greater[1:]
    keep = pd.DataFrame({"x": xs[alive], "y": ymax[alive], "_keep": True})
    merged = pdf.merge(keep, on=["x", "y"], how="left")
    return merged["_keep"].notna().to_numpy()


def pareto_frontier(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    minimize_x: bool = True,
) -> DataFrame:
    """Rows of ``df`` on the 2-D Pareto frontier of (x_col, y_col).

    ``minimize_x=True`` (default) keeps rows where no other row has
    x' <= x and y' >= y with one strict; ``False`` maximizes both.
    Rows with a NULL metric carry no dominance information and are
    dropped. All other columns pass through unchanged.
    """
    schema = df.schema

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        front: pd.DataFrame | None = None
        for pdf in batches:
            pdf = pdf[pdf[x_col].notna() & pdf[y_col].notna()]
            if not len(pdf):
                continue
            cand = (
                pdf
                if front is None
                else pd.concat([front, pdf], ignore_index=True)
            )
            mask = _frontier_mask(
                cand[x_col].to_numpy(), cand[y_col].to_numpy(), minimize_x
            )
            front = cand[mask]
        if front is not None and len(front):
            yield front

    partial = df.mapInPandas(fold, schema)
    # repartition (NOT coalesce: coalesce would merge stage-1 lineage
    # into one task and serialize the partial-frontier scans)
    return partial.repartition(1).mapInPandas(fold, schema)
