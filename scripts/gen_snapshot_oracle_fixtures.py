"""Regenerate the snapshot oracle fixtures (g11 dissolve, s06 IVF-kmeans).

Snapshot-oracle pattern (weakest of the three oracle classes, and
labeled as such in the query docstrings): both operators are iterative /
kernel-fold shapes with no SQL re-expression, but both are DESIGNED to
be partitioning-independent deterministic (dissolve salts level-1
buckets by content hash and folds in sorted order; kmeans_pivots is a
deterministic Lloyd's fold with pinned tie-breaks — each has a pytest
asserting determinism). The committed snapshot therefore pins the exact
output, and the driver's DuckDB comparison re-verifies that a fresh
session — different master, shuffle partitioning, and executor layout
than this generator used — reproduces it value-for-value.

Fixtures are sf0.01-specific (the correctness gate's scale factor),
like d02's: the outputs are whole-corpus aggregates, not per-row.

Run after any change to operators/dissolve.py, operators/similarity.py
(kmeans/IVF), or the kernel. Usage:
    python scripts/gen_snapshot_oracle_fixtures.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXDIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "oracle_fixtures"
)
SF_DIR = "/root/testdata/sf0.01"


def main():
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entrymod
    from rust_geo_booleanop_spark.plans import get_spark

    # Deliberately NOT the gate's config (local[8]/16 shuffle partitions):
    # a different topology here makes the gate comparison a real
    # cross-partitioning determinism check, not a same-config replay.
    spark = get_spark(
        app_name="snapshot-oracles", master="local[4]", shuffle_partitions=7
    )
    qs = entrymod.queries()

    g11 = qs["g11_dissolve"](spark, SF_DIR).collect()
    pq.write_table(
        pa.table(
            {
                "template_kind": pa.array([r.template_kind for r in g11], pa.string()),
                "n_polys": pa.array([r.n_polys for r in g11], pa.int32()),
                "status": pa.array([r.status for r in g11], pa.string()),
            }
        ),
        os.path.join(FIXDIR, "g11_dissolve_sf001.parquet"),
        compression="zstd",
    )
    print(f"g11: {len(g11)} rows")

    s06 = qs["s06_ivf_kmeans"](spark, SF_DIR).collect()
    pq.write_table(
        pa.table(
            {
                "query_id": pa.array([r.query_id for r in s06], pa.int64()),
                "vec_id": pa.array([r.vec_id for r in s06], pa.int64()),
                "sim_rank": pa.array([r.sim_rank for r in s06], pa.int32()),
            }
        ),
        os.path.join(FIXDIR, "s06_ivf_kmeans_sf001.parquet"),
        compression="zstd",
    )
    print(f"s06: {len(s06)} rows -> {FIXDIR}")
    spark.stop()


if __name__ == "__main__":
    main()
