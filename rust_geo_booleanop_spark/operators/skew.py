"""Explicit skew handling for hot cell keys (north rule requirement).

A continent-sized polygon covers cells that everything joins against; AQE's
skew-join split is the backstop, but the explicit strategy is:

  1. one cheap histogram pass over the probe side (`cell_histogram`),
  2. hot keys get a salt dimension: probe rows fan out to (key, salt) with
     salt = hash(row) % factor; the build side replicates each hot key
     `factor` times so the equi-join still finds every pair,
  3. the join key becomes (cell_id, salt) — hot partitions split `factor`
     ways instead of landing on one reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cell_histogram(df: DataFrame, key: str = "cell_id") -> DataFrame:
    return df.groupBy(key).agg(F.count("*").alias("n_rows"))


def hot_keys(df: DataFrame, key: str = "cell_id", threshold: int = 100_000) -> DataFrame:
    """Keys whose row count exceeds threshold — the explicit salt list."""
    return cell_histogram(df, key).filter(F.col("n_rows") > threshold).select(key)


def salt_probe_side(
    df: DataFrame,
    hot: DataFrame,
    key: str = "cell_id",
    factor: int = 16,
    hash_col: str = "url",
) -> DataFrame:
    """Probe rows on hot keys get salt = xxhash64(row) % factor; others 0."""
    marked = df.join(
        F.broadcast(hot.withColumn("_is_hot", F.lit(True))), on=key, how="left"
    )
    salt = F.when(
        F.col("_is_hot").isNotNull(),
        F.pmod(F.xxhash64(F.col(hash_col)), F.lit(factor)),
    ).otherwise(F.lit(0))
    return marked.withColumn("salt", salt.cast("int")).drop("_is_hot")


def replicate_build_side(
    df: DataFrame, hot: DataFrame, key: str = "cell_id", factor: int = 16
) -> DataFrame:
    """Build rows on hot keys replicate across all salt values; others salt 0."""
    marked = df.join(
        F.broadcast(hot.withColumn("_is_hot", F.lit(True))), on=key, how="left"
    )
    salts = F.when(
        F.col("_is_hot").isNotNull(),
        F.sequence(F.lit(0), F.lit(factor - 1)),
    ).otherwise(F.array(F.lit(0)))
    return (
        marked.withColumn("salt", F.explode(salts))
        .withColumn("salt", F.col("salt").cast("int"))
        .drop("_is_hot")
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str = "cell_id",
    threshold: int = 100_000,
    factor: int = 16,
    hash_col: str = "url",
) -> DataFrame:
    """Equi-join on (key, salt) with explicit hot-key salting."""
    hot = hot_keys(probe, key, threshold)
    p = salt_probe_side(probe, hot, key, factor, hash_col)
    b = replicate_build_side(build, hot, key, factor)
    return p.join(b, on=[key, "salt"])
