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
           frame (the range predicate is pushed into the scan: parquet
           row-group min/max pruning skips whole byte ranges when the
           column is clustered, and it is a cheap codegen filter
           otherwise) until the candidate bucket holds <= `max_tail`
           rows; the final exact selection is a TakeOrderedAndProject
           of that tiny tail (sort-limit of <= max_tail rows, never of
           the corpus).
  base     a bucket narrower than one ULP that still exceeds `max_tail`
           is a massive-tie bucket: its few distinct values are counted
           exactly (groupBy(col) over the ULP-wide slice) and the rank
           is resolved from the tie histogram — no collect of the tie.

Passes: 2 + O(log_bins(range/ulp)) worst case, each strictly smaller;
ranks at 10^12 rows are exact because counts are exact (int64).

No reference counterpart (engine requirement, like heavy hitters).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_counts(df: DataFrame, col: str, lo: float, hi: float, bins: int):
    """One histogram pass: [(bucket, count), ...] sorted by bucket."""
    width = (hi - lo) / bins
    b = F.least(
        F.greatest(F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(bins - 1),
    ).cast("int")
    rows = df.groupBy(b.alias("bucket")).count().collect()  # `bins` rows max
    return sorted((r["bucket"], r["count"]) for r in rows)


def _kth_smallest(df: DataFrame, col: str, k: int) -> float:
    """Exact k-th smallest of a SMALL frame: sort-limit(k) -> max."""
    (row,) = df.select(col).orderBy(col).limit(k).agg(F.max(col)).collect()
    return row[0]


def _resolve_rank(df: DataFrame, col: str, rank: int, lo: float, hi: float,
                  bins: int, max_tail: int) -> float:
    """Value at 1-based `rank` among rows with lo <= col <= hi."""
    while True:
        bounded = df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
        if hi <= lo or (hi - lo) / bins <= 0 or math.nextafter(lo, hi) >= hi:
            # massive-tie base case: the interval is at most a few ULPs
            # wide; resolve the rank from the exact per-value tie counts
            ties = sorted(
                (r[0], r[1])
                for r in bounded.groupBy(col).count().collect()
            )
            seen = 0
            for value, cnt in ties:
                seen += cnt
                if seen >= rank:
                    return value
            raise AssertionError("rank exceeds tie histogram")
        counts = _bucket_counts(bounded, col, lo, hi, bins)
        width = (hi - lo) / bins
        seen = 0
        for bucket, cnt in counts:
            if seen + cnt >= rank:
                rank -= seen
                lo, hi = lo + bucket * width, lo + (bucket + 1) * width
                if cnt <= max_tail:
                    tail = df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
                    return _kth_smallest(tail, col, rank)
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

    Returns a DataFrame (q double, value double). Null values of `col`
    are excluded (quantile_disc semantics)."""
    data = df.filter(F.col(col).isNotNull())
    (stats,) = data.agg(
        F.count(col).alias("n"), F.min(col).alias("lo"), F.max(col).alias("hi")
    ).collect()
    n = stats["n"]
    if n == 0:
        raise ValueError("exact_quantiles: empty column")
    lo, hi = float(stats["lo"]), float(stats["hi"])
    out = []
    for q in qs:
        rank = min(n, max(1, math.ceil(q * n)))
        out.append((float(q), float(_resolve_rank(data, col, rank, lo, hi, bins, max_tail))))
    spark = df.sparkSession
    return spark.createDataFrame(out, "q double, value double")
