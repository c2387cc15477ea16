from .corpus import case_geometry, case_template, CORPUS_SIZE
from .documents import build_documents, DOCUMENTS_SCHEMA
from .checkpoint import (
    checkpointed_write,
    completed_partitions,
    read_checkpointed,
    read_manifest,
)

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
]
