"""Temporal operators: as-of join, gap sessionization, interval join.

Spark has no native AS OF join (DuckDB/kdb do). The scalable pattern
implemented here is the union-sort trick: tag both sides, union, window
over (key, time) once — ONE shuffle on the key, no per-key cross product,
so a hot key costs O(rows log rows) instead of O(left x right). The naive
range-join formulation (join on key + ts <= t, then argmax) explodes
quadratically on hot keys; this one never materializes candidate pairs.

Sessionization is the classic lag -> gap flag -> cumulative-sum pattern:
two window passes over the same (key, time) partitioning, no extra
shuffle between them.

Spark also has no native INTERVAL (range-overlap) join: expressed as a
theta join it plans a BroadcastNestedLoopJoin — all-pairs per key, a
scale-killer. `interval_join` buckets time into fixed-width slots,
explodes each interval to the slots it covers (bounded replication =
ceil(length/width)+1), equi-joins point slots against interval slots,
and re-applies the exact predicate. Each match surfaces exactly once
because a point lives in exactly one slot.

All are pure built-in window/aggregate/join plans (whole-stage codegen,
no Python), with exact ANSI-SQL oracles in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
    right_tie: str,
) -> DataFrame:
    """Inner as-of join: for every left row, the single right row with the
    greatest `right_time` <= `left_time` on the same key (ties broken by
    greatest `right_tie`). Left rows with no qualifying right row drop.

    Mechanics: right rows sort before left rows at equal time (inclusive
    bound), ascending `right_tie` so the last-seen right row at any point
    is the winner; `last(..., ignorenulls)` over an unbounded-preceding
    window carries it forward onto each left row.

    NULL semantics match the SQL predicate ``r.key = l.key AND r.time <=
    l.time``: a right row with a NULL key or NULL time can satisfy
    neither conjunct, so it is excluded up front — without the filter the
    ascending sort would place NULL-time rows FIRST and silently carry
    them onto left rows that have no true predecessor.
    """
    # The right row's payload travels as ONE struct, so last(ignorenulls)
    # carries an atomic row — carrying columns independently would splice
    # fields from different right rows whenever a right column is NULL.
    right = right.filter(
        F.col(right_key).isNotNull() & F.col(right_time).isNotNull()
    )
    r_tagged = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(right_tie).alias("_tie"),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("_r"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    l_tagged = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(r_tagged.schema["_r"].dataType).alias("_r"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    w = Window.partitionBy("_k").orderBy(
        F.asc("_t"), F.asc("_side"), F.asc("_tie")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried = r_tagged.unionByName(l_tagged).select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_asof")
    )
    out = carried.filter(F.col("_side") == 1).filter(F.col("_asof").isNotNull())
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in left.columns],
        *[F.col("_asof").getField(c).alias(f"asof_{c}") for c in right_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    start_col: str,
    end_col: str,
    key_col: str | None = None,
    bucket_seconds: int = 3600,
    point_prefix: str = "p_",
    interval_prefix: str = "i_",
) -> DataFrame:
    """Inner interval join: every (point, interval) pair with
    ``start <= point_time < end`` (half-open, the standard convention),
    optionally restricted to equal `key_col` on both sides.

    Scale shape: time is cut into `bucket_seconds` slots on exact integer
    microseconds. Each interval explodes to the slots it covers — bounded
    replication, ceil(length/width)+1 rows — each point maps to its ONE
    slot, and the join is a plain equi-join on (key, slot) followed by the
    exact micros predicate. No theta join, no BroadcastNestedLoopJoin, no
    per-key cross product: shuffle keys are (key, slot), so even a hot
    user key spreads across its time slots. Pick `bucket_seconds` near the
    typical interval length; a pathological slot (everything in one hour)
    can still be salted with operators/skew.py like any equi-join.

    Output columns: points prefixed `point_prefix`, intervals prefixed
    `interval_prefix` (both sides keep every column; prefixes avoid
    collisions). Empty intervals (end <= start) match nothing.
    """
    w_us = int(bucket_seconds) * 1_000_000
    p_us = F.unix_micros(F.col(point_time).cast("timestamp"))
    s_us = F.unix_micros(F.col(start_col).cast("timestamp"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp"))

    # Slot assignment is EXACT integer DIV, never double division: a
    # long/long `/` in Spark is a double divide, and past 2^53 micros
    # (or near slot boundaries at extreme magnitudes) a 1-ULP rounding
    # could put a boundary point one slot below its interval's coverage
    # and silently drop a true match. DIV truncates toward zero (not
    # floor), which is still correct: any monotonic non-decreasing
    # integer mapping applied identically to both sides keeps every
    # point slot inside its interval's [slot(start), slot(end-1)] range.
    p = points.select(
        *[F.col(c).alias(f"{point_prefix}{c}") for c in points.columns],
        p_us.alias("_pt_us"),
    ).withColumn("_slot", F.expr(f"_pt_us DIV {w_us}"))
    # half-open end: the last covered slot is slot(end-1); the e>s guard
    # drops empty intervals before sequence() could reverse
    i = (
        intervals.select(
            *[F.col(c).alias(f"{interval_prefix}{c}") for c in intervals.columns],
            s_us.alias("_s_us"),
            e_us.alias("_e_us"),
        )
        .withColumn("_b0", F.expr(f"_s_us DIV {w_us}"))
        .withColumn("_b1", F.expr(f"(_e_us - 1) DIV {w_us}"))
        .filter(F.col("_e_us") > F.col("_s_us"))
        .select(
            "*", F.explode(F.sequence(F.col("_b0"), F.col("_b1"))).alias("_slot")
        )
        .drop("_b0", "_b1")
    )
    on = [p["_slot"] == i["_slot"]]
    if key_col is not None:
        on.append(
            F.col(f"{point_prefix}{key_col}") == F.col(f"{interval_prefix}{key_col}")
        )
    joined = p.join(i, on, "inner").filter(
        (F.col("_pt_us") >= F.col("_s_us")) & (F.col("_pt_us") < F.col("_e_us"))
    )
    return joined.drop("_slot", "_pt_us", "_s_us", "_e_us")


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    tie_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    previous event of the same key exceeds `gap_seconds`. Adds
    `session_seq` (1-based per key) and `event_in_session` (1-based
    within session). Total order inside a key is (time, tie)."""
    w = Window.partitionBy(key_col).orderBy(F.asc(time_col), F.asc(tie_col))
    # exact integer microseconds (timestamps carry sub-second precision;
    # second-truncation would round differently across engines)
    t_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    gap = t_us - F.lag(t_us).over(w)
    flagged = events.withColumn(
        "_new_session",
        F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    sessioned = flagged.withColumn(
        "session_seq",
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_in = Window.partitionBy(key_col, "session_seq").orderBy(
        F.asc(time_col), F.asc(tie_col)
    )
    return sessioned.withColumn(
        "event_in_session", F.row_number().over(w_in)
    ).drop("_new_session")


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: how many users performed step 1, then
    step 2 STRICTLY after their first step 1, then step 3 strictly after
    that, ... — the product-analytics conversion funnel.

    Semantics: per user, t_1 = MIN(ts of step-1 events); t_k = MIN(ts of
    step-k events with ts > t_{k-1}). A user counts toward step k iff t_k
    exists. Strict ordering (">") means a same-timestamp pair does NOT
    advance the funnel — deterministic regardless of intra-timestamp
    event order, which also makes the SQL oracle trivial to state.

    Scale shape: one filtered aggregate + one equi-join per step, every
    aggregate a map-side-partial MIN on the user key; join keys all the
    same column, so AQE coalesces the exchanges. Never a window over a
    user's full history and never a sort — at 100 TB each step touches
    only that step's event type.

    Returns (step_index int, step string, n_users bigint), one row per
    step, n_users non-increasing.
    """
    if not steps:
        raise ValueError("funnel_steps: need at least one step")
    prev = None
    counts = []
    for idx, step in enumerate(steps, start=1):
        cur = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("_u"), F.col(ts_col).alias("_t")
        )
        if prev is None:
            agg = cur.groupBy("_u").agg(F.min("_t").alias("_reached"))
        else:
            agg = (
                cur.join(prev, on="_u")
                .filter(F.col("_t") > F.col("_reached"))
                .groupBy("_u")
                .agg(F.min("_t").alias("_reached"))
            )
        prev = agg
        counts.append(
            agg.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(idx).alias("step_index"),
                F.lit(step).alias("step"),
                "n_users",
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def latest_snapshot(
    df: DataFrame,
    key_col: str,
    time_col: str,
    tie_col: str,
) -> DataFrame:
    """Latest-row-per-key compaction (the SCD-1 / upsert-log snapshot):
    keep exactly one row per key — the maximum (time, tie) row under a
    TOTAL order, so equal timestamps resolve deterministically.

    ONE shuffle on the key; Spark plans the rank-1 window as a
    WindowGroupLimit (map-side per-partition top-1 BEFORE the exchange),
    so the shuffle carries one candidate row per (partition, key), not
    the log. This is the compaction a 100 TB CDC/event log needs: cost
    scales with keys, not history length.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.desc(time_col), F.desc(tie_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
