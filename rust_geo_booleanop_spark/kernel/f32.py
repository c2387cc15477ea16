"""f32-width boolean operations.

The reference kernel is generic over the float width: its `Float` trait
(/root/reference/lib/src/boolean/helper.rs:8-10) admits f32 and f64, and
the test suite instantiates both. This module provides the f32 SURFACE
for the Python kernel: inputs are quantized to IEEE binary32 on the way
in, the sweep runs in f64 (binary64 is a strict superset — every f32
value is exactly representable, so quantized inputs lose nothing
further), and outputs are rounded to nearest-f32 on the way out.

Two compute widths (round 3):
- compute="f64" (default): f32 storage, f64 sweep. Deterministic, and
  since binary64 ⊃ binary32 the quantized inputs lose nothing further —
  but intermediate rounding points differ from a true f32 sweep, so
  results can disagree with the reference's f32 instantiation on
  adversarial near-degenerate inputs.
- compute="f32": TRUE f32-native arithmetic via the C kernel compiled at
  float width (kernel/native, -DMARTINEZ_F32) — every FP operation of
  the sweep rounds to binary32, matching the reference's f32
  instantiation op-for-op (its Float trait, helper.rs:8-10). Requires
  the native kernel (gcc); raises RuntimeError when unavailable.

For the engine's GeoJSON pipeline — doubles on the wire — the f64 kernel
is the primary path; this surface exists for parity with the reference's
narrower-width type surface and for callers whose geometry source is
genuinely f32 (e.g. float32 sensor/embedding-adjacent payloads).
"""

from __future__ import annotations

import numpy as np

from .booleanop import boolean_op


def quantize_multipolygon_f32(mp):
    """Round every coordinate to its nearest IEEE binary32 value
    (returned as Python floats holding exactly that f32 value).

    Values beyond binary32 range quantize to +-inf — the same
    round-to-nearest overflow an `as f32` cast produces in the
    reference's Rust — so the expected-overflow warning is suppressed."""
    with np.errstate(over="ignore"):
        return [
            [
                [(float(np.float32(x)), float(np.float32(y))) for x, y in ring]
                for ring in poly
            ]
            for poly in mp
        ]


def boolean_op_f32(subject, clipping, operation, compute: str = "f64"):
    """Boolean operation at f32 width. All output coordinates are exactly
    representable in binary32; deterministic for both compute widths.

    compute="f64" (default): f32-quantized operands, exact f64 sweep,
    f32-quantized result. compute="f32": true f32-native sweep (see
    module docstring; requires the native C kernel)."""
    if compute == "f32":
        from .native import boolean_op_f32_native

        return boolean_op_f32_native(subject, clipping, operation)
    if compute != "f64":
        raise ValueError(f"compute must be 'f64' or 'f32', got {compute!r}")
    result = boolean_op(
        quantize_multipolygon_f32(subject),
        quantize_multipolygon_f32(clipping),
        operation,
    )
    return quantize_multipolygon_f32(result)
