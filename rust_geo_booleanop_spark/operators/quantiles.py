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
        raise ValueError("exact_quantiles: empty column")
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
