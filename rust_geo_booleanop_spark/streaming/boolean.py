"""Streaming flagship: continuous boolean ops + tile assignment.

The batch flagship pairs a case's subject and clipping with a shuffle
(operators/boolean_join.py); on a continuous crawl the two pages of a
case can arrive in DIFFERENT file drops, so the streaming twin completes
pairs with a custom stateful operator instead:

- `stream_boolean_pairs` — `applyInPandasWithState` keyed by case_id.
  State holds the first-seen side (url + geometry JSON); when the
  partner arrives — same micro-batch or any later one — the kernel runs
  (same `resolve_pair_runner` hot path as batch: full-C pair lifecycle
  when available) and the state collapses to a `done` tombstone.
  Per-key state is one geometry string only for cases still missing a
  side, so state size tracks the open-case frontier plus a few bytes
  per completed case.
- `stream_boolean_tiling` — tile assignment on top is the same pure-JVM
  cover expression as batch (stateless, streams unchanged).

Emitted rows are byte-identical to the batch pipeline's (pinned by
test, via the SAME `append_pair_results` marshalling helper the batch
kernel stage uses): the streaming engine adds pair completion, not new
geometry semantics. Duplicate sides of an already-complete case are
ignored (first-seen wins) — the corpus contract is one subject + one
clipping per case url. Completion leaves an O(1) `done` tombstone in
state (no geometry retained) so a late-arriving duplicate side cannot
re-open the case and re-emit its rows; open cases hold one geometry
string, completed cases a few bytes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.boolean_join import (
    BOOLEAN_RESULTS_SCHEMA,
    DEFAULT_OPS,
    append_pair_results,
    new_result_rows,
)

_PAIR_STATE_SCHEMA = (
    "s_url string, s_json string, c_url string, c_json string, done boolean"
)

# worker-process-local memo: resolve the kernel pair runner once per
# Python worker, not once per (case_id) state group per micro-batch
_RUNNER_CACHE: dict = {}


def _cached_pair_runner():
    runner = _RUNNER_CACHE.get("runner")
    if runner is None:
        from ..kernel.pairs import resolve_pair_runner

        runner = _RUNNER_CACHE["runner"] = resolve_pair_runner()
    return runner


def _make_pair_fn(ops):
    def pair_fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (case_id,) = key
        s_url, s_json, c_url, c_json, done = (
            state.get if state.exists else ("", "", "", "", False)
        )
        if done:
            # already emitted: drain and drop late duplicate sides, keep
            # the tombstone (no update needed — state persists as is)
            for _ in pdfs:
                pass
            return
        for pdf in pdfs:
            for url, role, gj in zip(pdf["url"], pdf["role"], pdf["geom_json"]):
                if role == "subject" and not s_json:
                    s_url, s_json = url, gj
                elif role == "clipping" and not c_json:
                    c_url, c_json = url, gj

        if s_json and c_json:
            # tombstone: geometry dropped, only the done flag survives
            state.update(("", "", "", "", True))
            rows = new_result_rows()
            append_pair_results(
                rows, _cached_pair_runner(), case_id, s_url, c_url, s_json, c_json, ops
            )
            yield pd.DataFrame(rows)
        else:
            # half-open case: park the seen side in state and emit nothing
            state.update((s_url, s_json, c_url, c_json, False))

    return pair_fn


def stream_boolean_pairs(geoms_stream: DataFrame, ops=DEFAULT_OPS) -> DataFrame:
    """Streaming (case_id-keyed) pair completion + kernel. Input is the
    streaming geometries relation (url, case_id, role, geom_json, ...)."""
    return geoms_stream.groupBy("case_id").applyInPandasWithState(
        _make_pair_fn(tuple(ops)),
        outputStructType=BOOLEAN_RESULTS_SCHEMA,
        stateStructType=_PAIR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_boolean_tiling(geoms_stream: DataFrame, ops=DEFAULT_OPS) -> DataFrame:
    """Streaming flagship: pair completion -> kernel -> tile assignment
    (the tile cover is the same pure-JVM expression as batch)."""
    from ..operators.tiling import assign_tiles

    return assign_tiles(stream_boolean_pairs(geoms_stream, ops))


def run_boolean_tiling_stream(
    spark, input_dir: str, output_dir: str, checkpoint_dir: str, ops=DEFAULT_OPS
):
    """Run the streaming flagship over currently-available document drops
    (AvailableNow) into a checkpointed parquet sink. Pair-completion state
    survives restarts via the state store: a case whose subject arrived in
    an earlier RUN completes when its clipping lands in a later one."""
    from .extraction import stream_documents, stream_extract_geometries

    geoms = stream_extract_geometries(stream_documents(spark, input_dir))
    tiled = stream_boolean_tiling(geoms, ops)
    query = (
        tiled.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
