"""Dissolve (distributed union-by-key) operator."""

import json

import pytest

from rust_geo_booleanop_spark.operators import dissolve
from rust_geo_booleanop_spark.kernel.geojson import parse_multipolygon


def _rect_json(x0, y0, w, h):
    ring = [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h], [x0, y0]]
    return json.dumps({"type": "Polygon", "coordinates": [ring]})


def _area(mp):
    total = 0.0
    for poly in mp:
        for ri, ring in enumerate(poly):
            a = 0.0
            for i in range(len(ring) - 1):
                (x1, y1), (x2, y2) = ring[i], ring[i + 1]
                a += x1 * y2 - x2 * y1
            total += abs(a) / 2.0 * (1 if ri == 0 else -1)
    return total


class TestDissolve:
    @pytest.fixture(scope="class")
    def tiling(self, spark):
        rows = []
        # key "grid": 4x4 adjacent unit squares -> one 4x4 square
        for i in range(4):
            for j in range(4):
                rows.append(("grid", _rect_json(float(i), float(j), 1.0, 1.0)))
        # key "overlap": two half-overlapping rects -> area 1.5
        rows.append(("overlap", _rect_json(0.0, 0.0, 1.0, 1.0)))
        rows.append(("overlap", _rect_json(0.5, 0.0, 1.0, 1.0)))
        # key "disjoint": two separated squares -> 2 polygons
        rows.append(("disjoint", _rect_json(0.0, 0.0, 1.0, 1.0)))
        rows.append(("disjoint", _rect_json(5.0, 5.0, 1.0, 1.0)))
        return spark.createDataFrame(rows, "zone string, geom_json string")

    def test_union_semantics(self, tiling):
        out = {r.key: r for r in dissolve(tiling, key_col="zone", fanin=4).collect()}
        assert all(r.status == "ok" for r in out.values())
        grid = parse_multipolygon(out["grid"].geom_json)
        assert out["grid"].n_polys == 1
        assert _area(grid) == pytest.approx(16.0)
        assert _area(parse_multipolygon(out["overlap"].geom_json)) == pytest.approx(1.5)
        assert out["disjoint"].n_polys == 2
        assert _area(parse_multipolygon(out["disjoint"].geom_json)) == pytest.approx(2.0)

    def test_deterministic_across_partitionings(self, tiling):
        a = {r.key: r.geom_json for r in dissolve(tiling, key_col="zone", fanin=4).collect()}
        b = {
            r.key: r.geom_json
            for r in dissolve(tiling.repartition(7), key_col="zone", fanin=4).collect()
        }
        assert a == b

    def test_fanin_one_matches_multilevel_area(self, tiling):
        # different fold trees may vertex-order differently, but the union
        # region (area, polygon count) is identical
        multi = {r.key: r for r in dissolve(tiling, key_col="zone", fanin=4).collect()}
        single = {r.key: r for r in dissolve(tiling, key_col="zone", fanin=1).collect()}
        for k in multi:
            assert multi[k].n_polys == single[k].n_polys
            assert _area(parse_multipolygon(multi[k].geom_json)) == pytest.approx(
                _area(parse_multipolygon(single[k].geom_json))
            )
