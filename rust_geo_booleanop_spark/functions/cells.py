"""Hierarchical grid-cell index (H3/S2-style, planar quadtree flavor).

Deterministic integer cell keys over the plane, used for:
  - spatially bucketing geometries so candidate pairs co-locate in one
    shuffle partition (spatial equi-join on cell_id),
  - tile assignment for clip outputs,
  - explicit skew handling (cell histograms -> salting hot cells).

Encoding: cell_id = (level << 58) | ((ix + OFFSET) << 29) | (iy + OFFSET)
with ix = floor(x / cell_size(level)). Parent/child relationships are
simple index shifts, like S2 cell parents. Pure NumPy — vectorized over
Arrow batches; no per-row Python in the Spark path.
"""

from __future__ import annotations

import numpy as np

# Level-0 cell edge length in world units; level L halves it L times.
LEVEL0_SIZE = 4096.0
_OFFSET = 1 << 28  # supports coordinates in +-(2^28 * cell_size)


def cell_size(level: int) -> float:
    return LEVEL0_SIZE / (1 << level)


def encode_cells(ix: np.ndarray, iy: np.ndarray, level: int) -> np.ndarray:
    return (
        (np.int64(level) << np.int64(58))
        | ((ix.astype(np.int64) + _OFFSET) << np.int64(29))
        | (iy.astype(np.int64) + _OFFSET)
    )


def cell_id_expr(ix, iy, level: int):
    """JVM Column twin of `encode_cells`: the SINGLE definition of the
    (level << 58) | ((ix + OFFSET) << 29) | (iy + OFFSET) bit layout for
    Spark expressions — every codegen encode site (point cells, cover
    cells, kNN buckets, pyramid re-encode, bench inputs) must build its
    cell ids through this helper so a layout change cannot drift between
    copies. `ix`/`iy` are long Columns of cell indices; `level` is a
    plan-time int."""
    from pyspark.sql import functions as F

    return (
        F.lit(int(level) << 58)
        .bitwiseOR(F.shiftleft(ix + F.lit(_OFFSET), 29))
        .bitwiseOR(iy + F.lit(_OFFSET))
    )


def decode_cell(cell_id: int):
    level = int(cell_id >> 58)
    ix = int((cell_id >> 29) & ((1 << 29) - 1)) - _OFFSET
    iy = int(cell_id & ((1 << 29) - 1)) - _OFFSET
    return level, ix, iy


def cell_bounds(cell_id: int):
    level, ix, iy = decode_cell(cell_id)
    size = cell_size(level)
    return ix * size, iy * size, (ix + 1) * size, (iy + 1) * size


def parent_cell(cell_id: int, parent_level: int) -> int:
    level, ix, iy = decode_cell(cell_id)
    shift = level - parent_level
    if shift < 0:
        raise ValueError("parent_level must be <= cell level")
    return int(
        encode_cells(
            np.array([ix >> shift]), np.array([iy >> shift]), parent_level
        )[0]
    )


def point_cells(x: np.ndarray, y: np.ndarray, level: int) -> np.ndarray:
    size = cell_size(level)
    ix = np.floor(x / size)
    iy = np.floor(y / size)
    return encode_cells(ix, iy, level)


def bbox_cover_cells(xmin, ymin, xmax, ymax, level: int):
    """List of cell ids covering one bbox (python ints). NaN bbox -> []."""
    if not (xmin <= xmax and ymin <= ymax):  # handles NaN
        return []
    size = cell_size(level)
    ix0 = int(np.floor(xmin / size))
    ix1 = int(np.floor(xmax / size))
    iy0 = int(np.floor(ymin / size))
    iy1 = int(np.floor(ymax / size))
    ixs, iys = np.meshgrid(
        np.arange(ix0, ix1 + 1, dtype=np.int64),
        np.arange(iy0, iy1 + 1, dtype=np.int64),
        indexing="ij",
    )
    return encode_cells(ixs.ravel(), iys.ravel(), level).tolist()


def bbox_cover_cells_batch(xmin, ymin, xmax, ymax, level: int):
    """Vectorized-ish cover for arrays of bboxes -> list of lists."""
    return [
        bbox_cover_cells(a, b, c, d, level)
        for a, b, c, d in zip(xmin, ymin, xmax, ymax)
    ]
