"""Deterministic stratified sampling / dataset mixing.

The training-data shape: "keep 50% of English, 25% of German, 10% of
everything else" over 10^12 documents, reproducibly — the same row set
on every run, every retry, every cluster size, with no RNG state and no
coordination. The sampling decision is a pure function of the row's key:

    keep  <=>  substr(md5(key), 1, 8) < hex_threshold(rate)

i.e. the first 32 bits of the key's md5, compared as the LOWERCASE HEX
STRING both engines print, against rate * 16^8 rendered as 8 hex
digits. String comparison over fixed-width lowercase hex is exactly
unsigned integer comparison, and md5 is uniform, so the kept fraction
converges to `rate` while membership stays deterministic. Everything is
JVM-side codegen (md5 + substring + CASE): a pure narrowing FILTER —
no shuffle, no UDF, and Catalyst pushes surviving-column pruning into
the scan. Nested sampling is monotone: rate 0.1 keeps a subset of rate
0.5's rows (same hash, lower threshold), which is what dataset-mixing
ablations want.

No reference counterpart (engine requirement, like heavy hitters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rate_to_hex_threshold(rate: float) -> str:
    """8-hex-digit threshold: floor(rate * 16^8), clamped to
    [0, 16^8 - 1]. The upper clamp must stay WITHIN 8 hex digits: 16^8
    formats as the 9-character "100000000", and against it the
    fixed-width lexicographic `digest < threshold` comparison keeps only
    digests starting with '0' (~6%) — so a rate just under 1.0 whose
    product rounds up to 2^32 (e.g. 1 - 2^-53, which passes the
    rate >= 1.0 guard) would silently drop ~94% of rows. The -1 costs
    one digest value ("ffffffff", 2^-32 of rows) at such rates."""
    n = int(rate * (16**8))
    return format(max(0, min(n, 16**8 - 1)), "08x")


def sample_predicate(key: Column, rate: float) -> Column:
    """Deterministic keep-predicate at `rate` for a key column.

    NULL keys have no stable sampling identity and are NEVER kept, at
    any rate — including rate >= 1.0. Without the explicit guard the
    semantics would be discontinuous: md5(NULL) is NULL, so any rate in
    (0, 1) drops every NULL-key row, while the rate >= 1.0 short-circuit
    would keep them all — a 0.1% rate change flipping NULL-key retention
    from 0% to 100% would silently bias a sample."""
    if rate >= 1.0:
        return key.isNotNull()
    if rate <= 0.0:
        return F.lit(False)
    digest = F.substring(F.md5(key.cast("string")), 1, 8)
    return digest < F.lit(rate_to_hex_threshold(rate))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically by key.

    `rates` maps stratum values to [0, 1] keep-rates; strata not listed
    use `default_rate`. The same (key, rates) always selects the same
    rows — resumable jobs and reruns agree for free."""
    pred = sample_predicate(F.col(key_col), default_rate)
    for stratum, rate in sorted(rates.items()):
        pred = F.when(
            F.col(strata_col) == F.lit(stratum),
            sample_predicate(F.col(key_col), rate),
        ).otherwise(pred)
    return df.filter(pred)


def balanced_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    target: int | None = None,
) -> DataFrame:
    """Balance a skewed stratum mixture to uniform: keep exactly
    min-stratum-count rows per stratum (or `target` if given),
    deterministically.

    The mixture-weighting step of corpus assembly ("equal tokens per
    language/domain"). Selection is rank-based, not rate-based: rows rank
    within their stratum by (md5(key), key) — a total order, so the kept
    set is EXACTLY the target-smallest hashes, the same rows on every
    run and every cluster size, with no FP arithmetic anywhere (contrast
    `stratified_sample`, which is rate-based and approximate in count).

    Output: the input columns plus `sample_rank` (1-based within
    stratum, dense).

    100 TB shape: one shuffle on the stratum key for the window rank,
    plus a tiny count aggregate for the data-dependent target. Stratum
    count is small (languages, domains) but each stratum's partition is
    a single reducer — for strata that exceed one executor, pass an
    explicit literal `target`: Spark's WindowGroupLimit pushdown then
    runs a map-side partial top-K per stratum before the shuffle, so the
    exchange carries ~target rows per stratum per map task instead of
    the full stratum.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    ranked = df.withColumn("sample_rank", F.row_number().over(w))
    if target is not None:
        return ranked.filter(F.col("sample_rank") <= F.lit(int(target)))
    tgt = (
        df.groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(F.min("_n").alias("_target"))
    )
    return (
        ranked.join(F.broadcast(tgt))
        .filter(F.col("sample_rank") <= F.col("_target"))
        .drop("_target")
    )
