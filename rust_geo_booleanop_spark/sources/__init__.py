from .corpus import case_geometry, case_template, CORPUS_SIZE
from .documents import build_documents, DOCUMENTS_SCHEMA
from .checkpoint import (
    checkpointed_write,
    completed_partitions,
    read_checkpointed,
    read_manifest,
)
from .geojson_source import (
    fixture_pairs,
    read_feature_collections,
    write_feature_collection,
)
from .raster import raster_grid, raster_zonal_stats

__all__ = [
    "case_geometry",
    "case_template",
    "CORPUS_SIZE",
    "build_documents",
    "DOCUMENTS_SCHEMA",
    "checkpointed_write",
    "completed_partitions",
    "read_checkpointed",
    "read_manifest",
    "fixture_pairs",
    "read_feature_collections",
    "write_feature_collection",
    "raster_grid",
    "raster_zonal_stats",
]
