"""Exact distributed order statistics (the "median of 100 TB" problem).

A global sort of the column is the naive shape and is exactly what does
NOT scale: a total sort of 100 TB exists only to discard all but k rows.
This operator computes EXACT quantiles (`quantile_disc` semantics: the
element at 1-based rank max(1, ceil(q*n))) with bounded passes and no
global sort:

  pass 1   count / min / max (one JVM aggregate).
  pass 2   a shared fixed-width histogram over [min, max] (one JVM
           hash-aggregate of `bins` groups; the bucket table — `bins`
           rows, not data rows — is the only thing collected).
  then     per quantile, the bucket containing its rank is narrowed
           recursively with the same histogram step over the FILTERED
           frame until the candidate bucket holds <= `max_tail` rows;
           the final exact selection is a TakeOrderedAndProject of that
           tiny tail (sort-limit of <= max_tail rows, never the corpus).
  base     a bucket narrower than one ULP that still exceeds `max_tail`
           is a massive-tie bucket: its few distinct values are counted
           exactly (groupBy(col) over the slice) and the rank is
           resolved from the tie histogram — no collect of the tie.

FP discipline: bucket MEMBERSHIP is always the exact same
floor((x - lo)/width) expression the count pass grouped by — never the
boundary values lo + k*width, which can disagree with the floor by an
ULP near bucket edges (a count/filter mismatch there silently shifts
the selected rank; a randomized search finds such floats easily). A
redundant one-bucket-padded RANGE predicate is attached purely so
parquet row-group min/max pruning can skip byte ranges when the column
is clustered; it is provably a superset of the bucket (the floor's
rounding error is far below one bucket width).

Passes: 2 + O(log_bins(range/ulp)) worst case, each strictly smaller;
ranks at 10^12 rows are exact because counts are exact (int64).

No reference counterpart (engine requirement, like heavy hitters).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: str, lo: float, width: float, bins: int):
    return F.least(
        F.greatest(F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(bins - 1),
    ).cast("int")


def _kth_smallest(df: DataFrame, col: str, k: int) -> float:
    """Exact k-th smallest of a SMALL frame: sort-limit(k) -> max."""
    (row,) = df.select(col).orderBy(col).limit(k).agg(F.max(col)).collect()
    return row[0]


def _degenerate(lo: float, hi: float, bins: int) -> bool:
    return hi <= lo or (hi - lo) / bins <= 0 or math.nextafter(lo, hi) >= hi


def _rank_from_ties(ties, rank: int) -> float:
    seen = 0
    for value, cnt in ties:
        seen += cnt
        if seen >= rank:
            return value
    raise AssertionError("rank exceeds tie histogram")


def _resolve_rank(df: DataFrame, col: str, rank: int, lo: float, hi: float,
                  bins: int, max_tail: int, first_counts=None) -> float:
    """Value at 1-based `rank` within `df` (already non-null filtered).

    `df` carries the exact membership predicate accumulated so far;
    [lo, hi] are numeric HINTS for the next histogram's bucketing, never
    a membership test. `first_counts`, if given, is the precomputed
    top-level histogram for exactly this (df, lo, hi, bins) — the caller
    shares ONE whole-corpus pass across all quantiles instead of
    recomputing it per q."""
    while True:
        if _degenerate(lo, hi, bins):
            # massive-tie base case: the interval is at most a few ULPs
            # wide; resolve the rank from the exact per-value tie counts
            ties = sorted((r[0], r[1]) for r in df.groupBy(col).count().collect())
            return _rank_from_ties(ties, rank)
        width = (hi - lo) / bins
        bexpr = _bucket_expr(col, lo, width, bins)
        if first_counts is not None:
            counts, first_counts = first_counts, None
        else:
            counts = sorted(
                (r["bucket"], r["count"])
                for r in df.groupBy(bexpr.alias("bucket")).count().collect()
            )
        seen = 0
        for bucket, cnt in counts:
            if seen + cnt >= rank:
                rank -= seen
                # membership: the SAME expression the count grouped by;
                # the padded range is redundant (superset) and exists only
                # for parquet min/max pruning
                df = df.filter(
                    (bexpr == F.lit(bucket))
                    & (F.col(col) >= F.lit(lo + (bucket - 1) * width))
                    & (F.col(col) <= F.lit(lo + (bucket + 2) * width))
                )
                lo, hi = lo + bucket * width, lo + (bucket + 1) * width
                if cnt <= max_tail:
                    return _kth_smallest(df, col, rank)
                break
            seen += cnt
        else:
            raise AssertionError("rank exceeds histogram total")


def exact_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    bins: int = 4096,
    max_tail: int = 100_000,
) -> DataFrame:
    """Exact `quantile_disc` values of `col` at each q in `qs`.

    Returns a DataFrame (q double, value double). Null AND NaN values of
    `col` are excluded — a NaN would otherwise become the max hint
    (Spark orders NaN greatest) and poison every histogram width with
    NaN arithmetic, so NaN is treated as missing data like null.

    The top-level whole-corpus histogram is computed ONCE and shared by
    every quantile's narrowing walk; only the already-filtered
    sub-corpus passes are per-q."""
    data = df.filter(F.col(col).isNotNull())
    if df.schema[col].dataType.typeName() in ("double", "float"):
        data = data.filter(~F.isnan(F.col(col)))
    (stats,) = data.agg(
        F.count(col).alias("n"), F.min(col).alias("lo"), F.max(col).alias("hi")
    ).collect()
    n = stats["n"]
    if n == 0:
        # quantiles of an empty relation are an empty relation — a
        # selective upstream filter matching nothing must not crash the
        # job (empty relations are routine mid-plan at scale)
        return df.sparkSession.createDataFrame([], "q double, value double")
    lo, hi = float(stats["lo"]), float(stats["hi"])
    out = []
    if _degenerate(lo, hi, bins):
        # whole column is ties within a few ULPs: ONE tie histogram
        ties = sorted((r[0], r[1]) for r in data.groupBy(col).count().collect())
        for q in qs:
            rank = min(n, max(1, math.ceil(q * n)))
            out.append((float(q), float(_rank_from_ties(ties, rank))))
    else:
        width = (hi - lo) / bins
        bexpr = _bucket_expr(col, lo, width, bins)
        top_counts = sorted(
            (r["bucket"], r["count"])
            for r in data.groupBy(bexpr.alias("bucket")).count().collect()
        )
        for q in qs:
            rank = min(n, max(1, math.ceil(q * n)))
            out.append((
                float(q),
                float(_resolve_rank(
                    data, col, rank, lo, hi, bins, max_tail,
                    first_counts=top_counts,
                )),
            ))
    spark = df.sparkSession
    return spark.createDataFrame(out, "q double, value double")


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tie_col: str,
    pcts: list[int],
) -> DataFrame:
    """Exact per-group `quantile_disc` at integer percents.

    For each group and each p in `pcts` (integer percent, 1..100) the
    selected element is the 1-based rank max(1, ceil(p*n/100)) under the
    total (value, tie) order — computed as the pure-integer expression
    GREATEST(1, (p*n + 99) DIV 100), so there is ZERO floating point in
    the rank math and the output VALUE is an untouched element of the
    column (no interpolation, no FP ops at all): an ANSI-SQL oracle
    reproduces every byte.

    Plan shape: one shuffle on the group key (row_number + group count
    share the window partitioning), then each row keeps only the percents
    whose target rank equals its own row number (an in-row array filter +
    explode — rows matching no percent vanish map-side). Like
    group_median, a single pathologically hot group should route through
    `exact_quantiles` on its slice; for the many-groups layout this is
    the cheapest exact form.
    """
    from pyspark.sql.window import Window

    for p in pcts:
        if not (isinstance(p, int) and 1 <= p <= 100):
            raise ValueError(f"pcts must be integer percents in 1..100: {p!r}")
    # NULLs out up front (engine NULL sort order differs; see group_median)
    df = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(F.asc(value_col), F.asc(tie_col))
    wn = Window.partitionBy(group_col)
    ranked = df.select(
        F.col(group_col),
        F.col(value_col).alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    targets = F.array(
        *[
            F.struct(
                F.lit(p).alias("pct"),
                F.greatest(
                    F.lit(1).cast("long"),
                    F.expr(f"({p} * _n + 99) DIV 100"),
                ).alias("rank"),
            )
            for p in pcts
        ]
    )
    hits = F.filter(targets, lambda t: t["rank"] == F.col("_rn"))
    return (
        ranked.select(
            F.col(group_col),
            F.explode(hits).alias("_t"),
            F.col("_v"),
            F.col("_n"),
        )
        .select(
            F.col(group_col),
            F.col("_t.pct").alias("pct"),
            F.col("_v").alias("value"),
            F.col("_n").alias("n_rows"),
        )
    )


def group_mode(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Exact per-group mode with a deterministic tie-break (smallest value).

    Two hash aggregates + a per-group window over the group's DISTINCT
    values: groupBy(group, value).count() runs with map-side partials, so
    the shuffle carries (group, value) partial counts, never rows; the
    row_number window then ranks only distinct values inside each group
    by (count DESC, value ASC) — a total order, so ties are resolved
    identically on any engine. Output counts are exact int64.

    Scale note: the window sorts one group's distinct-value set in one
    task. That is the mode problem's irreducible state; a group whose
    distinct-value cardinality alone overflows a task should use heavy
    hitters (operators/sketch.py) to pre-shrink the candidate set.
    """
    from pyspark.sql.window import Window

    counts = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    w = Window.partitionBy(group_col).orderBy(
        F.desc("n_occurrences"), F.asc(value_col)
    )
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(group_col),
            F.col(value_col).alias("mode_value"),
            "n_occurrences",
        )
    )


def group_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tie_col: str,
) -> DataFrame:
    """Exact per-group median: the classic two-central-ranks selection.

    Rank rows inside each group by (value, tie) — the tie column makes
    the order total, so the selected rows are deterministic — then keep
    the 1-based ranks (n+1) DIV 2 and (n+2) DIV 2 (equal for odd n) and
    aggregate: median = SUM(selected) / COUNT(selected). For odd n that
    is one IEEE division by 1.0 (exact identity); for even n it is one
    addition of two doubles (commutative, so aggregation order cannot
    matter) and one division by 2.0 — an ANSI-SQL oracle reproduces the
    double bit-for-bit.

    Scale shape: ONE shuffle on the group key; row_number and the group
    count share the same window partitioning, then the filtered frame
    (<= 2 rows per group) feeds a tiny hash aggregate. The window needs
    a whole group sorted in one task, so a single pathologically hot
    group should use `exact_quantiles` over that group's slice instead
    (bounded passes, no per-group sort); for the normal
    many-groups-per-executor layout this is the cheapest exact form.
    """
    from pyspark.sql.window import Window

    # NULL values are excluded up front (median over the non-null set,
    # the SQL-aggregate convention). Relying on sort placement instead
    # would be engine-dependent: Spark orders NULLs first ascending,
    # DuckDB last — a silent rank shift between engine and oracle.
    df = df.filter(F.col(value_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(F.asc(value_col), F.asc(tie_col))
    wn = Window.partitionBy(group_col)
    ranked = df.select(
        F.col(group_col),
        F.col(value_col).cast("double").alias("_v"),
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    picked = ranked.filter(
        (F.col("_rn") == F.expr("(_n + 1) DIV 2"))
        | (F.col("_rn") == F.expr("(_n + 2) DIV 2"))
    )
    return picked.groupBy(group_col).agg(
        (F.sum("_v") / F.count(F.lit(1)).cast("double")).alias("median"),
        F.max("_n").alias("n_rows"),
    )


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    tie_col: str,
) -> DataFrame:
    """Exact per-group weighted median (lower weighted median): the
    smallest value v in the group such that the weight at-or-below v
    reaches half the group's total weight.

    Rank rows inside each group by (value, tie) — total order — and take
    the running weight sum; the selected row is the unique one where the
    cumulative weight first crosses half the total:
    2*cum >= W AND 2*(cum - w) < W. Both tests are pure int64
    comparisons (weights must be integers), so there is no FP in the
    selection at all and an ANSI-SQL oracle reproduces the row exactly.
    The crossing-row predicate needs no second pass and no row_number:
    the cumulative window and the group-total window share one
    partitioning, so the whole operator is ONE shuffle on the group key.

    Scale shape: same as group_median — one sorted window per group. A
    single pathologically hot group would need the histogram-narrowing
    trick from exact_quantiles generalized to weights; for the normal
    many-groups layout this is the cheapest exact form.
    """
    from pyspark.sql.window import Window

    df = df.filter(F.col(value_col).isNotNull())
    wc = (
        Window.partitionBy(group_col)
        .orderBy(F.asc(value_col), F.asc(tie_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(group_col)
    ranked = df.select(
        F.col(group_col),
        F.col(value_col).cast("double").alias("_v"),
        F.col(weight_col).cast("long").alias("_w"),
        F.sum(F.col(weight_col).cast("long")).over(wc).alias("_cum"),
        F.sum(F.col(weight_col).cast("long")).over(wt).alias("_tot"),
        F.count(F.lit(1)).over(wt).alias("_n"),
        F.min(F.col(weight_col).cast("long")).over(wt).alias("_minw"),
        F.count(F.col(weight_col)).over(wt).alias("_wnn"),
    )
    # Contract enforcement, not dirty-data tolerance: a NULL or
    # non-positive weight breaks the crossing-row selection silently (a
    # zero-total group vanishes from the output; a negative weight makes
    # the cumulative sum non-monotone and can select SEVERAL "medians")
    # — fail loudly instead of returning wrong rows. min() SKIPS NULLs,
    # so NULL weights are detected by comparing the non-null count to
    # the row count.
    valid_w = (F.col("_wnn") == F.col("_n")) & F.coalesce(
        F.col("_minw") >= 1, F.lit(False)
    )
    picked = ranked.filter(
        F.when(
            ~valid_w,
            F.raise_error(
                F.lit(
                    "weighted_median: weights must be non-null positive "
                    "integers"
                )
            ).cast("boolean"),
        ).otherwise(
            (F.lit(2) * F.col("_cum") >= F.col("_tot"))
            & (F.lit(2) * (F.col("_cum") - F.col("_w")) < F.col("_tot"))
        )
    )
    return picked.select(
        F.col(group_col),
        F.col("_v").alias("weighted_median"),
        F.col("_tot").alias("total_weight"),
        F.col("_n").alias("n_rows"),
    )
