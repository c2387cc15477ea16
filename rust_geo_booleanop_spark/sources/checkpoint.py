"""Per-partition checkpointed writes with lineage + row-count manifests.

North-rule resumability for batch jobs: output is written one logical
partition at a time; each completed partition is recorded in a JSON
manifest (rows written, lineage of the stage that produced it, wall time).
A restarted job consults the manifest and skips completed partitions.

This is the batch analogue of Iceberg snapshot commits — deliberately
plain parquet + JSON so it runs anywhere (the real deployment would swap
in Iceberg table commits without touching callers).
"""

from __future__ import annotations

import json
import os
import time
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_NAME = "_checkpoint_manifest.json"


def _manifest_path(base_path: str) -> str:
    return os.path.join(base_path, MANIFEST_NAME)


def read_manifest(base_path: str) -> dict:
    path = _manifest_path(base_path)
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"partitions": {}}


def _write_manifest(base_path: str, manifest: dict) -> None:
    os.makedirs(base_path, exist_ok=True)
    tmp = _manifest_path(base_path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(base_path))


def completed_partitions(base_path: str) -> set[str]:
    return set(read_manifest(base_path)["partitions"])


def checkpointed_write(
    df: DataFrame,
    base_path: str,
    partition_col: str,
    lineage: str = "",
    job_fingerprint: str | None = None,
) -> dict:
    """Write df parquet-partitioned by partition_col, skipping partitions the
    manifest already records. Returns the updated manifest.

    One job per pending partition keeps the unit of recovery small; the
    per-partition filter prunes at the source when partition_col derives
    from partition-pruned columns. When it doesn't (a computed bucket
    column), the persist below keeps the expensive upstream from being
    recomputed once per partition. NULL partition keys are written under
    their own bucket via null-safe equality — they must not be silently
    dropped while the manifest marks them complete.
    """
    manifest = read_manifest(base_path)
    done = set(manifest["partitions"])

    # Refuse to resume under a DIFFERENT job definition: the partition
    # column may be a computed bucket (pmod of a hash), so changed
    # parameters remap every row and skipping "completed" partitions would
    # silently drop data while reporting success. Callers encode every
    # row-mapping-relevant parameter in `job_fingerprint`; `lineage` stays
    # an informational stamp (retry labels etc.) and is NOT validated.
    if job_fingerprint is not None:
        recorded = manifest.get("job_fingerprint")
        if recorded is not None and recorded != job_fingerprint:
            raise ValueError(
                f"checkpoint at {base_path} was written by job "
                f"{recorded!r}, current job is {job_fingerprint!r} — "
                f"resuming would silently drop rows; use a fresh output path"
            )
        manifest["job_fingerprint"] = job_fingerprint
        # Persist the guard immediately: if this run has ZERO pending
        # partitions (empty df, or resuming a pre-fingerprint manifest
        # that is already complete), _write_pending never writes the
        # manifest, and a later resume with different job parameters
        # would go undetected.
        _write_manifest(base_path, manifest)

    df = df.persist()
    try:
        values = [
            r[0]
            for r in df.select(partition_col).distinct().collect()
        ]
        pending = [v for v in values if str(v) not in done]
        _write_pending(df, base_path, partition_col, lineage, manifest, pending)
    finally:
        df.unpersist()

    return manifest


def _write_pending(df, base_path, partition_col, lineage, manifest, pending):
    for v in sorted(pending, key=str):
        t0 = time.time()
        part_df = df.filter(F.col(partition_col).eqNullSafe(F.lit(v)))
        out_dir = os.path.join(base_path, f"{partition_col}={v}")
        part_df.write.mode("overwrite").parquet(out_dir)
        # count from the written files, not by recomputing the pipeline
        n_rows = df.sparkSession.read.parquet(out_dir).count()
        manifest["partitions"][str(v)] = {
            "rows": n_rows,
            "lineage": lineage,
            "wall_seconds": round(time.time() - t0, 3),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        _write_manifest(base_path, manifest)


def read_checkpointed(spark, base_path: str) -> DataFrame:
    """Read back every completed partition as one DataFrame."""
    manifest = read_manifest(base_path)
    paths = [
        os.path.join(base_path, d)
        for d in os.listdir(base_path)
        if "=" in d and d.split("=", 1)[1] in manifest["partitions"]
    ]
    if not paths:
        raise FileNotFoundError(f"no completed partitions under {base_path}")
    return spark.read.parquet(*paths)
