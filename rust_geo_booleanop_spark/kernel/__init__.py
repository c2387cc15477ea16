"""Pure-Python Martinez-Rueda-Feito polygon boolean-op kernel.

Fixture-exact reimplementation of the semantics of
21re/rust-geo-booleanop (/root/reference/lib/src/boolean/) — runs inside
Arrow-batched pandas UDFs on Spark; never row-at-a-time per Spark row.
"""

from .booleanop import (
    boolean_op,
    intersection,
    union,
    difference,
    xor,
    KernelLimitExceeded,
    INTERSECTION,
    UNION,
    DIFFERENCE,
    XOR,
)
from .geojson import (
    load_fixture,
    parse_multipolygon,
    serialize_multipolygon,
    multipolygon_bbox,
)
from .predicates import signed_area, segment_intersection
from .f32 import boolean_op_f32, quantize_multipolygon_f32

__all__ = [
    "boolean_op",
    "intersection",
    "union",
    "difference",
    "xor",
    "KernelLimitExceeded",
    "INTERSECTION",
    "UNION",
    "DIFFERENCE",
    "XOR",
    "load_fixture",
    "parse_multipolygon",
    "serialize_multipolygon",
    "multipolygon_bbox",
    "signed_area",
    "segment_intersection",
    "boolean_op_f32",
    "quantize_multipolygon_f32",
]
