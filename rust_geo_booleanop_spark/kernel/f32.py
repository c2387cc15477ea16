"""f32-width boolean operations.

The reference kernel is generic over the float width: its `Float` trait
(/root/reference/lib/src/boolean/helper.rs:8-10) admits f32 and f64, and
the test suite instantiates both. This module provides the f32 SURFACE
for the Python kernel: inputs are quantized to IEEE binary32 on the way
in, the sweep runs in f64 (binary64 is a strict superset — every f32
value is exactly representable, so quantized inputs lose nothing
further), and outputs are rounded to nearest-f32 on the way out.

Honest divergence note: this is f32 STORAGE with f64 COMPUTE, not the
reference's f32-native arithmetic. Intermediate rounding points differ,
so results can disagree with a true f32 sweep on adversarial
near-degenerate inputs (the same class of inputs where the reference's
own f32/f64 instantiations disagree with each other). For the engine's
GeoJSON pipeline — doubles on the wire — the f64 kernel is the primary
path; this exists for parity with the reference's narrower-width type
surface and for callers whose geometry source is genuinely f32 (e.g.
float32 sensor/embedding-adjacent payloads).
"""

from __future__ import annotations

import numpy as np

from .booleanop import boolean_op


def quantize_multipolygon_f32(mp):
    """Round every coordinate to its nearest IEEE binary32 value
    (returned as Python floats holding exactly that f32 value)."""
    return [
        [
            [(float(np.float32(x)), float(np.float32(y))) for x, y in ring]
            for ring in poly
        ]
        for poly in mp
    ]


def boolean_op_f32(subject, clipping, operation):
    """Boolean operation at f32 width: f32-quantized operands, exact f64
    sweep, f32-quantized result. Deterministic; all output coordinates
    are exactly representable in binary32."""
    result = boolean_op(
        quantize_multipolygon_f32(subject),
        quantize_multipolygon_f32(clipping),
        operation,
    )
    return quantize_multipolygon_f32(result)
