"""Bloom-filter incremental dedup: "did an earlier crawl already have this?"

The cross-snapshot pattern at 100 TB: the prior snapshot's key set is far
too big to broadcast, but a BLOOM BITMAP of it is a fixed `m_bits/8`
bytes regardless of corpus size. One aggregate pass over the prior
snapshot builds it; the current snapshot is then split by a vectorized
bitmap probe:

  - rows whose k probe bits are not all set are DEFINITELY NEW (bloom
    filters have no false negatives) — they skip the join entirely;
  - the remaining "possibly seen" sliver (true dups + the false-positive
    rate) goes through an exact anti-join against the prior keys.

The output is therefore EXACT — bloom false positives only cost extra
anti-join work, never a wrong row — while the anti-join's shuffle
carries only the sliver instead of the whole current snapshot. With the
typical mostly-new crawl delta, that removes ~(1 - fp - dup_rate) of
the probe side from the one expensive shuffle.

Plan shape: the k probe POSITIONS are computed JVM-side
(xxhash64(key, salt_i) mod m inside codegen); Python only indexes a
NumPy bitmap per Arrow batch (no per-row work, no string hashing in
Python). The bitmap build is one explode + distinct over positions —
bounded by m (the bit-space), not by corpus size.

No reference counterpart (engine requirement, like heavy hitters).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 20  # 128 KiB bitmap
DEFAULT_K = 4


def _positions(key: F.Column, m_bits: int, k: int) -> list:
    """k JVM-side bloom positions for a key column (xxhash64 + salt)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)).cast("long")
        for i in range(k)
    ]


def bloom_bitmap(
    keys: DataFrame, key_col: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> bytes:
    """Build the bitmap SHUFFLE-FREE: each partition ORs its keys' k
    positions into a local m_bits/8-byte bitmap (positions computed
    JVM-side, NumPy scatter per Arrow batch), emits that one binary row,
    and the driver ORs the per-partition bitmaps — the classic
    treeAggregate shape. Cost is partitions x bitmap-size over the wire
    and zero exchanges, independent of corpus size."""
    pos_cols = [f"p{i}" for i in range(k)]
    projected = keys.select(
        *[
            p.alias(c)
            for p, c in zip(_positions(F.col(key_col), m_bits, k), pos_cols)
        ]
    )

    def partial_bitmaps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        part = np.zeros(m_bits // 8, dtype=np.uint8)
        any_rows = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            any_rows = True
            for c in pos_cols:
                idx = pdf[c].to_numpy(np.int64)
                np.bitwise_or.at(part, idx // 8, (1 << (idx % 8)).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bitmap": [part.tobytes()]})

    partials = projected.mapInPandas(partial_bitmaps, schema="bitmap binary").collect()
    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in partials:
        bitmap |= np.frombuffer(bytes(r["bitmap"]), dtype=np.uint8)
    return bitmap.tobytes()


def incremental_new_keys(
    current: DataFrame,
    prior: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Rows of `current` whose `key_col` does NOT appear in `prior`.

    Exact (bloom is only a pre-filter); equals a plain left_anti join on
    the key, pinned by test. Columns of `current` pass through."""
    bitmap_bytes = bloom_bitmap(prior.select(key_col), key_col, m_bits, k)
    out_cols = current.columns
    pos_cols = [f"__bloom_p{i}" for i in range(k)]
    probed = current.select(
        "*",
        *[
            p.alias(c)
            for p, c in zip(_positions(F.col(key_col), m_bits, k), pos_cols)
        ],
    )

    def probe_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitmap = np.frombuffer(bitmap_bytes, dtype=np.uint8)
        for pdf in batches:
            maybe = np.ones(len(pdf), dtype=bool)
            for c in pos_cols:
                idx = pdf[c].to_numpy(np.int64)
                maybe &= (bitmap[idx // 8] & (1 << (idx % 8)).astype(np.uint8)) != 0
            out = pdf[out_cols].copy()
            out["__maybe_seen"] = maybe
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in current.schema.fields
    )
    flagged = probed.mapInPandas(
        probe_batches, schema=f"{schema}, __maybe_seen boolean"
    )
    definitely_new = flagged.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    sliver = flagged.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    verified_new = sliver.join(
        prior.select(key_col).distinct(), on=key_col, how="left_anti"
    )
    return definitely_new.unionByName(verified_new)
