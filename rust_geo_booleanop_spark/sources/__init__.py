from .corpus import case_geometry, case_template, CORPUS_SIZE
from .documents import build_documents, DOCUMENTS_SCHEMA

__all__ = [
    "case_geometry",
    "case_template",
    "CORPUS_SIZE",
    "build_documents",
    "DOCUMENTS_SCHEMA",
]
