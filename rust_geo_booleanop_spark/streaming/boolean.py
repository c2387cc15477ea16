"""Streaming flagship: continuous boolean ops + tile assignment.

The batch flagship pairs a case's subject and clipping with a shuffle
(operators/boolean_join.py); on a continuous crawl the two pages of a
case can arrive in DIFFERENT file drops, so the streaming twin completes
pairs with a custom stateful operator instead:

- `stream_boolean_pairs` — `applyInPandasWithState` keyed by case_id.
  State holds the first-seen side (url + geometry JSON); when the
  partner arrives — same micro-batch or any later one — the kernel runs
  (same `resolve_pair_runner` hot path as batch: full-C pair lifecycle
  when available) and the state is cleared. Per-key state is one
  geometry string, and only for cases still missing a side, so state
  size tracks the open-case frontier, not the corpus.
- `stream_boolean_tiling` — tile assignment on top is the same pure-JVM
  cover expression as batch (stateless, streams unchanged).

Emitted rows are byte-identical to the batch pipeline's (pinned by
test): the streaming engine adds pair completion, not new geometry
semantics. Duplicate sides of an already-complete case are ignored
(first-seen wins) — the corpus contract is one subject + one clipping
per case url.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.boolean_join import BOOLEAN_RESULTS_SCHEMA, DEFAULT_OPS

_PAIR_STATE_SCHEMA = "s_url string, s_json string, c_url string, c_json string"


def _make_pair_fn(ops):
    def pair_fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        from ..kernel.pairs import resolve_pair_runner

        (case_id,) = key
        s_url, s_json, c_url, c_json = (
            state.get if state.exists else ("", "", "", "")
        )
        for pdf in pdfs:
            for url, role, gj in zip(pdf["url"], pdf["role"], pdf["geom_json"]):
                if role == "subject" and not s_json:
                    s_url, s_json = url, gj
                elif role == "clipping" and not c_json:
                    c_url, c_json = url, gj

        if s_json and c_json:
            state.remove()
            pair_run = resolve_pair_runner()
            rows = {k: [] for k in (
                "case_id", "subject_url", "clipping_url", "op",
                "result_json", "n_polys", "xmin", "ymin", "xmax", "ymax", "status",
            )}
            for op, rj, n, xmin, ymin, xmax, ymax, status in pair_run(
                s_json, c_json, ops
            ):
                rows["case_id"].append(case_id)
                rows["subject_url"].append(s_url)
                rows["clipping_url"].append(c_url)
                rows["op"].append(op)
                rows["result_json"].append(rj)
                rows["n_polys"].append(n)
                rows["xmin"].append(xmin)
                rows["ymin"].append(ymin)
                rows["xmax"].append(xmax)
                rows["ymax"].append(ymax)
                rows["status"].append(status)
            yield pd.DataFrame(rows)
        else:
            # half-open case: park the seen side in state and emit nothing
            state.update((s_url, s_json, c_url, c_json))

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
