"""Distributed 2-D Pareto frontier vs the O(n^2) dominance definition."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from rust_geo_booleanop_spark.operators import pareto_frontier
from rust_geo_booleanop_spark.operators.skyline import _frontier_mask

import numpy as np


def brute_skyline(rows, minimize_x=True):
    """Set of surviving ids under the NOT EXISTS dominance definition."""
    out = set()
    for i, (idi, xi, yi) in enumerate(rows):
        dominated = False
        for j, (idj, xj, yj) in enumerate(rows):
            if i == j:
                continue
            better_x = xj <= xi if minimize_x else xj >= xi
            strict_x = xj < xi if minimize_x else xj > xi
            if better_x and yj >= yi and (strict_x or yj > yi):
                dominated = True
                break
        if not dominated:
            out.add(idi)
    return out


class TestFrontierMask:
    def test_matches_brute_force_with_ties(self):
        rng = random.Random(11)
        for trial in range(25):
            n = rng.randrange(1, 60)
            # tiny value range forces heavy ties and duplicate points
            rows = [
                (i, rng.randrange(0, 8), rng.randrange(0, 8)) for i in range(n)
            ]
            x = np.array([r[1] for r in rows], dtype=np.int64)
            y = np.array([r[2] for r in rows], dtype=np.int64)
            # mask is maximize/maximize; brute with minimize_x=False
            got = {rows[i][0] for i in np.flatnonzero(_frontier_mask(x, y, minimize_x=False))}
            assert got == brute_skyline(rows, minimize_x=False), (trial, rows)

    def test_duplicates_all_survive(self):
        x = np.array([5, 5, 5], dtype=np.int64)
        y = np.array([7, 7, 7], dtype=np.int64)
        assert _frontier_mask(x, y, minimize_x=False).all()

    def test_float_metrics(self):
        x = np.array([1.5, 2.5, 1.5], dtype=np.float64)
        y = np.array([1.0, 2.0, 3.0], dtype=np.float64)
        # (2.5, 2.0) and (1.5, 3.0) survive; (1.5, 1.0) dominated
        assert list(_frontier_mask(x, y, minimize_x=False)) == [False, True, True]

    def test_empty(self):
        assert _frontier_mask(np.array([]), np.array([]), minimize_x=False).shape == (0,)

    def test_minimize_x_matches_brute_force(self):
        rng = random.Random(13)
        for trial in range(25):
            n = rng.randrange(1, 60)
            rows = [
                (i, rng.randrange(0, 8), rng.randrange(0, 8)) for i in range(n)
            ]
            x = np.array([r[1] for r in rows], dtype=np.int64)
            y = np.array([r[2] for r in rows], dtype=np.int64)
            got = {
                rows[i][0]
                for i in np.flatnonzero(_frontier_mask(x, y, minimize_x=True))
            }
            assert got == brute_skyline(rows, minimize_x=True), (trial, rows)

    def test_int64_extremes_exact(self):
        """Regression: the old dtype-min sentinel dropped the extreme-x
        group when its best y EQUALED int64 min, and minimize_x used a
        sign negation that WRAPS at int64 min. Both extremes must now
        survive exactly."""
        lo = np.iinfo(np.int64).min
        hi = np.iinfo(np.int64).max
        # maximize/maximize: max-x point with y == int64 min is on the
        # frontier (nothing has strictly greater x)
        x = np.array([1, 2], dtype=np.int64)
        y = np.array([5, lo], dtype=np.int64)
        assert list(_frontier_mask(x, y, minimize_x=False)) == [True, True]
        # minimize-x with int64-min x present: no negation wrap
        x = np.array([lo, 0, hi], dtype=np.int64)
        y = np.array([0, 1, 2], dtype=np.int64)
        rows = list(zip(range(3), x.tolist(), y.tolist()))
        got = {
            rows[i][0]
            for i in np.flatnonzero(_frontier_mask(x, y, minimize_x=True))
        }
        assert got == brute_skyline(rows, minimize_x=True)


class TestParetoFrontier:
    def _run(self, spark, rows, minimize_x, partitions=5, batch=7):
        df = spark.createDataFrame(rows, "id long, x long, y long").repartition(
            partitions
        )
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch))
        try:
            got = pareto_frontier(df, "x", "y", minimize_x=minimize_x).collect()
        finally:
            if old is not None:
                spark.conf.set(
                    "spark.sql.execution.arrow.maxRecordsPerBatch", old
                )
        return got

    def test_matches_brute_force_multi_partition_small_batches(self, spark):
        rng = random.Random(4)
        rows = [(i, rng.randrange(0, 12), rng.randrange(0, 12)) for i in range(200)]
        for minimize_x in (True, False):
            got = self._run(spark, rows, minimize_x)
            want = brute_skyline(rows, minimize_x=minimize_x)
            assert {r.id for r in got} == want
            # row count matters too: duplicate-tie rows must ALL appear
            assert len(got) == len(want)

    def test_null_metrics_dropped_other_columns_pass_through(self, spark):
        df = spark.createDataFrame(
            [(1, 3, 9, "a"), (2, None, 9, "b"), (3, 3, None, "c"), (4, 2, 1, "d")],
            "id long, x long, y long, tag string",
        )
        got = pareto_frontier(df, "x", "y", minimize_x=True).collect()
        by_id = {r.id: r for r in got}
        # (1: x=3,y=9) and (4: x=2,y=1) are mutually non-dominating
        assert set(by_id) == {1, 4}
        assert by_id[1].tag == "a" and by_id[4].tag == "d"

    def test_single_row_and_empty(self, spark):
        one = spark.createDataFrame([(1, 5, 5)], "id long, x long, y long")
        assert [r.id for r in pareto_frontier(one, "x", "y").collect()] == [1]
        empty = one.where(F.lit(False))
        assert pareto_frontier(empty, "x", "y").collect() == []
