"""C JSON pair runner == Python marshalling path, byte-for-byte.

The full-C pair lifecycle (kernel/native/martinez.c "JSON pair runner"
section: parse once -> sweep per op -> serialize in C) must reproduce the
Python composition (kernel/pairs.pair_boolean_ops_python) EXACTLY — same
result_json BYTES, same n_polys/bbox/status — on every reference fixture,
both operand orders, all five operations, plus the corpus generator and
an adversarial edge battery. Byte identity is by construction (the C side
calls CPython's own PyOS_string_to_double / PyOS_double_to_string via
dlsym); this file is the tripwire for that construction.

Inputs outside the strict GeoJSON subset must DECLINE (return None) so
the wrapper falls back to the Python path and error behavior on malformed
geometry is unchanged.
"""

import glob
import json
import math
import random
import struct

import pytest

from rust_geo_booleanop_spark.kernel import boolean_op
from rust_geo_booleanop_spark.kernel.geojson import (
    multipolygon_bbox,
    parse_multipolygon,
    serialize_multipolygon,
)
from rust_geo_booleanop_spark.kernel.native import NATIVE_AVAILABLE
from rust_geo_booleanop_spark.kernel.pairs import (
    pair_boolean_ops_python,
    resolve_bbox_fn,
    resolve_pair_runner,
)

if NATIVE_AVAILABLE:
    from rust_geo_booleanop_spark.kernel.native import (
        pair_boolean_ops_native,
        parse_bbox_native,
        repr_double_native,
    )

pytestmark = pytest.mark.skipif(
    not NATIVE_AVAILABLE, reason="native kernel unavailable (no gcc?)"
)

FIXTURE_DIR = "/root/reference/tests/fixtures/generic_test_cases"
OPS = ("intersection", "union", "diff", "xor", "diff_ba")

SQUARE = '{"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,2],[0,0]]]}'


def _rows_equal(py_rows, nat_rows):
    assert len(py_rows) == len(nat_rows)
    for rp, rn in zip(py_rows, nat_rows):
        assert rp[0] == rn[0]  # op
        assert rp[1] == rn[1]  # result_json, byte-for-byte
        assert rp[2] == rn[2]  # n_polys
        for x, y in zip(rp[3:7], rn[3:7]):  # bbox (NaN-aware)
            if isinstance(x, float) and math.isnan(x):
                assert isinstance(y, float) and math.isnan(y)
            else:
                assert x == y
        assert rp[7] == rn[7]  # status


def _assert_pair_parity(s_json, c_json, ops=OPS):
    nat = pair_boolean_ops_native(s_json, c_json, ops)
    assert nat is not None, "native pair runner declined a supported input"
    _rows_equal(pair_boolean_ops_python(s_json, c_json, ops), nat)


def test_repr_battery_matches_python_repr():
    """The C float rendering must be repr(v) bytes. It IS
    PyOS_double_to_string by construction; this guards the flag/mode
    constants and the dlsym plumbing."""
    vals = [
        0.0, -0.0, 1.0, -1.0, 0.1, 2 / 3, 1 / 3, 1e15, 1e16, -1e16,
        9999999999999998.0, 1e-4, 1e-5, -1e-5, 5e-324, -5e-324,
        1.7976931348623157e308, 2.2250738585072014e-308, 123456.789, -0.07,
        256.0, 0.5, -2.5, 3.141592653589793,
    ]
    rng = random.Random(20260818)
    while len(vals) < 20000:
        v = struct.unpack("<d", struct.pack("<Q", rng.getrandbits(64)))[0]
        if math.isnan(v) or math.isinf(v):
            continue
        vals.append(v)
    for v in vals:
        assert repr_double_native(v) == repr(v), v.hex()


def test_all_fixtures_both_orders_all_ops():
    fixtures = sorted(glob.glob(f"{FIXTURE_DIR}/*.geojson"))
    assert len(fixtures) == 45
    for fx in fixtures:
        with open(fx) as f:
            fc = json.load(f)
        feats = fc["features"]
        s_json = json.dumps(feats[0]["geometry"], separators=(",", ":"))
        c_json = json.dumps(feats[1]["geometry"], separators=(",", ":"))
        _assert_pair_parity(s_json, c_json)
        _assert_pair_parity(c_json, s_json)


def test_corpus_generator_pairs():
    from rust_geo_booleanop_spark.sources.corpus import case_geometry

    for t in range(80):
        s, c = case_geometry(t)
        _assert_pair_parity(serialize_multipolygon(s), serialize_multipolygon(c))


def test_edge_inputs_supported():
    cases = [
        # disjoint (trivial short-circuit, all four trivial shapes)
        '{"type":"Polygon","coordinates":[[[5,5],[6,5],[6,6],[5,6],[5,5]]]}',
        # empty geometries (both kinds of empty)
        '{"type":"MultiPolygon","coordinates":[]}',
        '{"type":"Polygon","coordinates":[]}',
        # unclosed ring (parser must close like geojson._close)
        '{"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,2]]]}',
        # altitude members ignored like _close taking p[0:2]
        '{"type":"Polygon","coordinates":[[[0,0,99],[2,0,98],[2,2,1],[0,2,5],[0,0,99]]]}',
        # whitespace tolerance
        '{ "type" : "Polygon" , "coordinates" : '
        "[ [ [0 , 0] , [2,0] , [2,2] , [0,2] , [0,0] ] ] }",
        # "-0" int token is +0.0 (json int semantics); sci notation
        '{"type":"Polygon","coordinates":[[[-0,0],[2,-0.0],[2e0,2E0],[0,2.5e-1],[-0,0]]]}',
        # reference-fixture key order: coordinates before type
        '{"coordinates":[[[0,0],[2,0],[2,2],[0,2],[0,0]]],"type":"Polygon"}',
        # identical operands (degenerate overlaps everywhere)
        SQUARE,
        # self-intersecting bowtie vs itself
        '{"type":"Polygon","coordinates":[[[0,0],[4,4],[4,0],[0,4],[0,0]]]}',
    ]
    for geom in cases:
        _assert_pair_parity(geom, SQUARE)
        _assert_pair_parity(SQUARE, geom)


def test_unsupported_inputs_decline_to_python_path():
    bad = [
        '{"type":"Point","coordinates":[0,0]}',
        '{"type":"Polygon","coordinates":[[[1e999,0],[2,0],[2,2]]]}',  # non-finite
        '{"type":"Polygon","coordinates":[[[null,0],[2,0],[2,2]]]}',
        '{"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2]]],"extra":1}',
        '{"type":"Polygon"}',
        "[1,2,3]",
        "",
    ]
    for geom in bad:
        assert pair_boolean_ops_native(geom, SQUARE, OPS) is None
        assert pair_boolean_ops_native(SQUARE, geom, OPS) is None


def test_limit_exceeded_rows_match():
    """Degenerate-overlap re-ingestion (the reference's deactivated
    issue90 pathology): per-op rows — including status='limit_exceeded'
    ones — must match the Python path exactly."""

    def random_triangles(n, seed, span=256.0, size=24.0):
        rng = random.Random(seed)
        polys = []
        for _ in range(n):
            cx = rng.uniform(size, span - size)
            cy = rng.uniform(size, span - size)
            pts = [
                (cx + rng.uniform(-size, size), cy + rng.uniform(-size, size))
                for _ in range(3)
            ]
            pts.append(pts[0])
            polys.append([pts])
        return polys

    saw_limit = False
    # seed 44's twice-re-ingested union trips the event budget on every op
    for seed in (7, 44, 99, 55555):
        a = random_triangles(10, seed)
        aa = boolean_op(a, a, "union")
        aaa = boolean_op(aa, aa, "union")
        a_j = serialize_multipolygon(a)
        aa_j = serialize_multipolygon(aa)
        aaa_j = serialize_multipolygon(aaa)
        for pair in ((aa_j, a_j), (aa_j, aa_j), (aaa_j, aa_j), (aaa_j, aaa_j)):
            py = pair_boolean_ops_python(*pair, ("intersection", "union", "diff", "xor"))
            nat = pair_boolean_ops_native(*pair, ("intersection", "union", "diff", "xor"))
            assert nat is not None
            _rows_equal(py, nat)
            saw_limit = saw_limit or any(r[7] == "limit_exceeded" for r in py)
    # the battery must actually exercise the limit path at least once;
    # if kernel budgets change enough that it never trips, grow the corpus
    assert saw_limit


def test_parse_bbox_native_parity():
    fixtures = sorted(glob.glob(f"{FIXTURE_DIR}/*.geojson"))
    for fx in fixtures[:12]:
        with open(fx) as f:
            fc = json.load(f)
        for feat in fc["features"][:2]:
            gj = json.dumps(feat["geometry"], separators=(",", ":"))
            bb = parse_bbox_native(gj)
            assert bb == multipolygon_bbox(parse_multipolygon(gj))
    # empty geometry: multipolygon_bbox's (inf, inf, -inf, -inf)
    assert parse_bbox_native('{"type":"MultiPolygon","coordinates":[]}') == (
        float("inf"), float("inf"), float("-inf"), float("-inf"),
    )
    # unsupported input declines (None), never raises
    assert parse_bbox_native('{"type":"Point","coordinates":[0,0]}') is None


def test_unknown_op_raises_like_python():
    with pytest.raises(ValueError, match="unknown operation"):
        pair_boolean_ops_native(SQUARE, SQUARE, ("intersection", "frobnicate"))


def test_resolver_engine_selection(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_KERNEL", "python")
    assert resolve_pair_runner() is pair_boolean_ops_python
    monkeypatch.setenv("SPARK_GRAFT_KERNEL", "auto")
    runner = resolve_pair_runner()
    assert runner is not pair_boolean_ops_python
    _rows_equal(
        pair_boolean_ops_python(SQUARE, SQUARE, OPS), runner(SQUARE, SQUARE, OPS)
    )
    # the auto runner must fall back (not fail) on inputs the C parser
    # declines — same exception the Python parser raises on garbage
    with pytest.raises(ValueError):
        runner("not json", SQUARE, OPS)
    monkeypatch.setenv("SPARK_GRAFT_KERNEL", "pyton")
    with pytest.raises(ValueError, match="unknown kernel engine"):
        resolve_pair_runner()
    with pytest.raises(ValueError, match="unknown kernel engine"):
        resolve_bbox_fn()
    monkeypatch.setenv("SPARK_GRAFT_KERNEL", "python")
    bbox_fn = resolve_bbox_fn()
    assert bbox_fn(SQUARE) == (0.0, 0.0, 2.0, 2.0)
    monkeypatch.setenv("SPARK_GRAFT_KERNEL", "auto")
    assert resolve_bbox_fn()(SQUARE) == (0.0, 0.0, 2.0, 2.0)


def test_pair_runner_differential_soak_sample():
    """Deterministic slice of `scripts/kernel_soak.py --pairs`: random
    degenerate-weighted cases through BOTH pair runners (GeoJSON in,
    GeoJSON + bbox + status rows out), byte-exact row agreement
    (NaN-aware on empty-result bboxes). Round-4 full record: 3000 cases
    / 15000 op-rows byte-exact, 0 divergences. New seeds via
    SPARK_GRAFT_SOAK_SEED0."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "kernel_soak",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "kernel_soak.py"),
    )
    soak = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(soak)
    seed0 = int(os.environ.get("SPARK_GRAFT_SOAK_SEED0", "777001"))
    soak.run_pairs(n_cases=40, seed0=seed0)
