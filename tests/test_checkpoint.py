"""Per-partition checkpointed writes: resumability + manifests."""

import os

from pyspark.sql import functions as F

from rust_geo_booleanop_spark.sources import (
    checkpointed_write,
    completed_partitions,
    read_checkpointed,
    read_manifest,
)


def test_checkpointed_write_and_resume(spark, tmp_path):
    base = str(tmp_path / "out")
    df = spark.range(100).withColumn("part", (F.col("id") % 4).cast("int"))

    manifest = checkpointed_write(df, base, "part", lineage="test-stage-1")
    assert set(manifest["partitions"]) == {"0", "1", "2", "3"}
    assert all(p["rows"] == 25 for p in manifest["partitions"].values())
    assert all(p["lineage"] == "test-stage-1" for p in manifest["partitions"].values())

    back = read_checkpointed(spark, base)
    assert back.count() == 100

    # simulate a partial failure: forget partition 2, restart must redo ONLY it
    m = read_manifest(base)
    del m["partitions"]["2"]
    import json

    with open(os.path.join(base, "_checkpoint_manifest.json"), "w") as f:
        json.dump(m, f)
    assert completed_partitions(base) == {"0", "1", "3"}

    before = {
        k: v["completed_at"] for k, v in read_manifest(base)["partitions"].items()
    }
    manifest2 = checkpointed_write(df, base, "part", lineage="test-stage-1-retry")
    assert set(manifest2["partitions"]) == {"0", "1", "2", "3"}
    # untouched partitions keep their original completion stamps/lineage
    for k in ("0", "1", "3"):
        assert manifest2["partitions"][k]["lineage"] == "test-stage-1"
        assert manifest2["partitions"][k]["completed_at"] == before[k]
    assert manifest2["partitions"]["2"]["lineage"] == "test-stage-1-retry"
    assert read_checkpointed(spark, base).count() == 100


def test_fingerprint_mismatch_refuses_resume(spark, tmp_path):
    """A computed-bucket checkpoint must not resume under different job
    parameters — skipping 'completed' buckets would silently drop rows."""
    import pytest

    from rust_geo_booleanop_spark.sources import checkpointed_write

    base = str(tmp_path / "fp_out")
    df = spark.createDataFrame([(i, i % 2) for i in range(10)], "id long, part int")
    checkpointed_write(df, base, "part", job_fingerprint="job buckets=2")
    # same fingerprint: resume is a no-op, no error
    checkpointed_write(df, base, "part", job_fingerprint="job buckets=2")
    with pytest.raises(ValueError, match="fresh output path"):
        checkpointed_write(df, base, "part", job_fingerprint="job buckets=4")


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    n = df.count()
    assert n > 0
    assert set(df.columns) >= {"case_id", "op", "tile_id", "result_json"}

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs), "every oracle key must have a query"
    assert len(qs) >= 30


def test_fingerprint_persisted_with_zero_pending_partitions(spark, tmp_path):
    """Regression (round-2 verdict): a run with ZERO pending partitions
    (empty input here) must still persist the job fingerprint, or a later
    resume under different parameters would go undetected."""
    import pytest

    from rust_geo_booleanop_spark.sources import checkpointed_write

    base = str(tmp_path / "fp_empty")
    empty = spark.createDataFrame([], "id long, part int")
    checkpointed_write(empty, base, "part", job_fingerprint="job buckets=2")
    with pytest.raises(ValueError, match="fresh output path"):
        checkpointed_write(empty, base, "part", job_fingerprint="job buckets=4")
