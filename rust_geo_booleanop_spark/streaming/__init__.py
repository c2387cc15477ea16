"""Structured Streaming extensions (engine additions; the reference kernel
is batch-only — its resumability analogue is sources/checkpoint.py)."""

from .boolean import (
    run_boolean_tiling_stream,
    stream_boolean_pairs,
    stream_boolean_tiling,
)
from .extraction import (
    run_exact_dedup_stream,
    run_extraction_stream,
    run_windowed_counts_stream,
    stream_documents,
    stream_events,
    stream_exact_dedup,
    stream_hll_sketch,
    stream_extract_geometries,
    windowed_event_counts,
)
from .sessions import run_session_stream, stream_sessionize

__all__ = [
    "run_boolean_tiling_stream",
    "stream_boolean_pairs",
    "stream_boolean_tiling",
    "run_session_stream",
    "stream_sessionize",
    "run_exact_dedup_stream",
    "run_extraction_stream",
    "run_windowed_counts_stream",
    "stream_documents",
    "stream_events",
    "stream_exact_dedup",
    "stream_hll_sketch",
    "stream_extract_geometries",
    "windowed_event_counts",
]
