from .extract import extract_geometries, GEOMETRIES_SCHEMA
from .boolean_join import (
    apply_boolean_ops,
    boolean_pipeline,
    pair_candidates,
    DEFAULT_OPS,
)
from .tiling import assign_tiles, clip_to_tiles

__all__ = [
    "extract_geometries",
    "GEOMETRIES_SCHEMA",
    "apply_boolean_ops",
    "boolean_pipeline",
    "pair_candidates",
    "DEFAULT_OPS",
    "assign_tiles",
    "clip_to_tiles",
]
