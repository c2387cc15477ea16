"""Skew-salted join correctness + metamorphic kernel properties."""

import pytest
from pyspark.sql import functions as F

from rust_geo_booleanop_spark.operators import salted_join
from rust_geo_booleanop_spark.kernel import boolean_op
from rust_geo_booleanop_spark.sources.corpus import _random_triangles


class TestSaltedJoin:
    def test_same_results_as_plain_join(self, spark):
        # probe: one hot key (0) with many rows, several cold keys
        probe_rows = [(0, f"p{i}") for i in range(500)] + [
            (k, f"p{k}") for k in range(1, 20)
        ]
        build_rows = [(k, f"b{k}") for k in range(20)]
        probe = spark.createDataFrame(probe_rows, "cell_id long, url string")
        build = spark.createDataFrame(build_rows, "cell_id long, payload string")

        plain = probe.join(build, on="cell_id").select("cell_id", "url", "payload")
        salted = salted_join(
            probe, build, key="cell_id", threshold=100, factor=4
        ).select("cell_id", "url", "payload")

        assert salted.count() == plain.count()
        assert salted.exceptAll(plain).count() == 0
        assert plain.exceptAll(salted).count() == 0

    def test_salt_spreads_hot_key(self, spark):
        probe_rows = [(0, f"p{i}") for i in range(500)]
        probe = spark.createDataFrame(probe_rows, "cell_id long, url string")
        from rust_geo_booleanop_spark.operators.skew import hot_keys, salt_probe_side

        hot = hot_keys(probe, threshold=100)
        salted = salt_probe_side(probe, hot, factor=8)
        n_salts = salted.select("salt").distinct().count()
        assert n_salts == 8


def shoelace(ring) -> float:
    s = 0.0
    for (x1, y1), (x2, y2) in zip(ring[:-1], ring[1:]):
        s += x1 * y2 - x2 * y1
    return s / 2.0


def mp_area(mp) -> float:
    total = 0.0
    for poly in mp:
        if not poly:
            continue
        total += abs(shoelace(poly[0]))
        for hole in poly[1:]:
            total -= abs(shoelace(hole))
    return total


@pytest.mark.parametrize("seed", [7, 21, 99, 1234, 55555])
class TestMetamorphic:
    """Inclusion-exclusion identities over random triangle soups — the
    kernel's outputs must be mutually consistent to near float precision."""

    def _inputs(self, seed):
        return _random_triangles(8, seed), _random_triangles(8, seed * 31 + 1)

    def test_area_identities(self, seed):
        a, b = self._inputs(seed)
        uni = mp_area(boolean_op(a, b, "union"))
        inter = mp_area(boolean_op(a, b, "intersection"))
        xor = mp_area(boolean_op(a, b, "xor"))
        diff_ab = mp_area(boolean_op(a, b, "diff"))
        diff_ba = mp_area(boolean_op(a, b, "diff_ba"))
        scale = max(uni, 1.0)
        assert abs((inter + xor) - uni) < 1e-9 * scale
        assert abs((diff_ab + diff_ba + inter) - uni) < 1e-9 * scale

    def test_symmetry_exact(self, seed):
        a, b = self._inputs(seed)
        for op in ("union", "intersection", "xor"):
            assert boolean_op(a, b, op) == boolean_op(b, a, op)

    def test_rings_closed_and_nonempty(self, seed):
        a, b = self._inputs(seed)
        for op in ("union", "intersection", "xor", "diff"):
            for poly in boolean_op(a, b, op):
                for ring in poly:
                    assert len(ring) >= 4
                    assert ring[0] == ring[-1]

    def test_self_difference_empty(self, seed):
        # degenerate sliver contours from exact self-overlaps carry float
        # noise; the area must be negligible relative to the input
        a, _ = self._inputs(seed)
        assert mp_area(boolean_op(a, a, "diff")) < 1e-8 * max(mp_area(boolean_op(a, a, "union")), 1.0)


class TestPathologicalTermination:
    """Re-ingesting boolean outputs as inputs (as tile-clipping pipelines
    do) can hit the Martinez degenerate-overlap pathology (cf. the
    reference's deactivated issue90 fixture). The engine guarantee is
    TERMINATION: a result or KernelLimitExceeded, never a hang."""

    @pytest.mark.parametrize("seed", [7, 21, 99, 1234, 55555])
    def test_reingested_union_terminates(self, seed):
        from rust_geo_booleanop_spark.kernel import KernelLimitExceeded

        a = _random_triangles(8, seed)
        aa = boolean_op(a, a, "union")
        for op in ("union", "intersection", "diff", "xor"):
            try:
                result = boolean_op(aa, a, op)
                assert isinstance(result, list)
            except KernelLimitExceeded:
                pass  # clean refusal is acceptable; hanging is not

    def test_clip_of_result_is_consistent(self):
        # the production re-ingestion path: clip a union result to a clean
        # rectangle — area must equal the rectangle-bounded portion
        a = _random_triangles(8, 55555)
        b = _random_triangles(8, 55555 * 31 + 1)
        uni = boolean_op(a, b, "union")
        big_rect = [[[(-1000.0, -1000.0), (2000.0, -1000.0), (2000.0, 2000.0), (-1000.0, 2000.0), (-1000.0, -1000.0)]]]
        clipped = boolean_op(uni, big_rect, "intersection")
        assert abs(mp_area(clipped) - mp_area(uni)) < 1e-9 * max(mp_area(uni), 1.0)


class TestHeavyHitters:
    def test_matches_exact_groupby_on_skewed_corpus(self, spark):
        """Misra-Gries candidates + exact verify == plain GROUP BY/HAVING,
        on a corpus whose distinct-value space (~5000) dwarfs the counter
        budget (k = 1/0.02 = 50) — the sketch must still recover every
        true heavy hitter exactly."""
        from pyspark.sql import functions as F

        from rust_geo_booleanop_spark.operators import heavy_hitters

        n = 40_000
        # 4 heavy values at ~8% each ((id*7919)%5 for id not divisible by
        # 5 ranges over {1,2,3,4} only), long tail of ~5000 values
        df = spark.range(n).select(
            F.when(F.col("id") % 5 == 0, F.col("id") % 5000 + 10)
            .otherwise((F.col("id") * 7919) % 5)
            .alias("v")
        )
        got = {(r.v, r.n) for r in heavy_hitters(df, "v", threshold_frac=0.02).collect()}
        want = {
            (r.v, r.n)
            for r in df.groupBy("v")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") >= n * 0.02)
            .collect()
        }
        assert got == want
        assert len(want) == 4  # only the planted heavy values qualify

    def test_single_partition_and_threshold_edge(self, spark):
        from pyspark.sql import functions as F

        from rust_geo_booleanop_spark.operators import heavy_hitters

        df = spark.createDataFrame(
            [(v,) for v in [1] * 50 + [2] * 30 + list(range(100, 120))], "v long"
        ).coalesce(1)
        got = {(r.v, r.n) for r in heavy_hitters(df, "v", threshold_frac=0.3).collect()}
        assert got == {(1, 50), (2, 30)}  # 30/100 == threshold exactly: kept
