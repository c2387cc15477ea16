"""Regenerate the d02 simhash oracle fixture.

Writes tests/oracle_fixtures/d02_simhash_sf001.parquet: one (doc_id,
simhash) row per sf0.01 document, computed with the OPERATOR's own
_simhash64 (pure Python, no Spark) — the generated-oracle pattern (like
t05's stopword SQL / s02's literal hyperplanes): signature math is pinned
by the fixture + a freshness pytest, and the DuckDB oracle then
independently recomputes the block-join + hamming relation from it.

Run after any change to operators/dedup.py::_simhash64 (the pinning test
tests/test_dedup_text.py::test_d02_oracle_fixture_fresh goes red until
you do). Usage: python scripts/gen_d02_oracle_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "oracle_fixtures", "d02_simhash_sf001.parquet",
)


def main():
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rust_geo_booleanop_spark.operators.dedup import _simhash64

    docs = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pylist()
    docs.sort(key=lambda r: r["doc_id"])
    table = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in docs], pa.int64()),
            "simhash": pa.array([_simhash64(r["text"]) for r in docs], pa.int64()),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {len(docs)} signatures -> {OUT}")


if __name__ == "__main__":
    main()
