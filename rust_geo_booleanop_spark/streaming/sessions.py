"""Custom stateful streaming operator: gap-based sessionization.

`applyInPandasWithState` over a per-user group: state carries the open
session (start/last/count, microsecond ints) across micro-batches; a
session CLOSES — and is emitted — when a later event of the same user
arrives more than `gap_seconds` after the previous one, or when the
processing-time timeout fires with no new events. This is the streaming
twin of `operators.temporal.sessionize` (same gap rule, exact µs
arithmetic), demonstrating the task-spec "custom stateful operator"
surface: bounded per-key state.

Batch-boundary independence holds for in-order, in-gap, and post-session
events, and for late events arriving WITHIN one batch (consecutive late
events chain into one session, merging with the open session when the
chain connects). The irreducible append-mode limit: a late event cannot
retract a session that was already emitted in an earlier batch — it opens
a separate (late) session instead.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_SCHEMA = "start long, last long, n long"


def _ts_to_us(t) -> int:
    # pandas Timestamp .value is integer nanoseconds since epoch
    return int(t.value // 1000)


def _us_to_ts(us: int):
    return pd.Timestamp(us * 1000)


def _make_session_fn(gap_us: int, timeout_ms: int | None):
    def session_fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed = []

        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                closed.append((user_id, _us_to_ts(start), _us_to_ts(last), n))
            state.remove()
        else:
            ts_us = []
            for pdf in pdfs:
                ts_us.extend(_ts_to_us(t) for t in pdf["ts"])
            ts_us.sort()

            if state.exists:
                start, last, n = state.get
            else:
                start = last = None
                n = 0

            # Pending "late" session: events more than the gap BEFORE the
            # open session belong to an older, already-passed session.
            # They arrive sorted ascending, so consecutive late events
            # within the gap of each other form ONE session (matching the
            # batch sessionize operator) instead of per-event singletons.
            late_start = late_last = None
            late_n = 0

            for tus in ts_us:
                if last is None:
                    start, last, n = tus, tus, 1
                elif start - tus > gap_us:
                    if late_last is not None and tus - late_last <= gap_us:
                        late_last, late_n = tus, late_n + 1
                    else:
                        if late_last is not None:
                            closed.append(
                                (user_id, _us_to_ts(late_start), _us_to_ts(late_last), late_n)
                            )
                        late_start, late_last, late_n = tus, tus, 1
                elif tus - last > gap_us:
                    # tus > last >= start > late_last + gap, so a pending
                    # late session can never chain into this new one
                    if late_last is not None:
                        closed.append(
                            (user_id, _us_to_ts(late_start), _us_to_ts(late_last), late_n)
                        )
                        late_start = late_last = None
                        late_n = 0
                    closed.append((user_id, _us_to_ts(start), _us_to_ts(last), n))
                    start, last, n = tus, tus, 1
                else:
                    # in-gap event (including cross-batch late arrivals
                    # within the gap) extends/backfills the open session;
                    # if it also chains to the pending late session, the
                    # two merge (exactly what batch sessionize would do)
                    if late_last is not None:
                        if tus - late_last <= gap_us:
                            start, n = late_start, n + late_n
                        else:
                            closed.append(
                                (user_id, _us_to_ts(late_start), _us_to_ts(late_last), late_n)
                            )
                        late_start = late_last = None
                        late_n = 0
                    if tus < start:
                        start = tus
                    if tus > last:
                        last = tus
                    n += 1

            if late_last is not None:
                closed.append(
                    (user_id, _us_to_ts(late_start), _us_to_ts(late_last), late_n)
                )

            if last is not None:
                state.update((start, last, n))
                if timeout_ms is not None:
                    state.setTimeoutDuration(timeout_ms)

        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return session_fn


def stream_sessionize(
    events: DataFrame, gap_seconds: int = 1800, timeout_ms: int | None = None
) -> DataFrame:
    """Closed sessions per user from a streaming events relation.

    `timeout_ms=None` (default): sessions close only when a later event
    arrives past the gap — correct for availableNow/catch-up runs, where a
    processing-time timeout would keep scheduling micro-batches until the
    timeout fired and the query would never terminate. Pass a timeout for
    continuous deployments so idle keys eventually flush their open
    session.
    """
    timeout_conf = (
        GroupStateTimeout.NoTimeout
        if timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(gap_seconds * 1_000_000, timeout_ms),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def run_session_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 1800,
):
    from .extraction import stream_events

    sessions = stream_sessionize(stream_events(spark, input_dir), gap_seconds)
    query = (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
