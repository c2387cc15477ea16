"""Cluster job: boolean ops + tiling over the documents table, resumable.

Submit:
    scripts/make_pyfiles_zip.sh /tmp/engine.zip
    spark-submit --py-files /tmp/engine.zip scripts/job_boolean_tiling.py \
        --sf-dir /root/testdata/sf0.1 --out /tmp/tiles_out

The job checkpoints per tile-id partition bucket: each completed bucket is
recorded with row counts + lineage in the output manifest, and a restarted
job (same --out) skips completed buckets (north-rule resumability).
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--buckets", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    # under spark-submit the session/master come from the submit conf
    spark = SparkSession.builder.appName("boolean-tiling-job").getOrCreate()

    from rust_geo_booleanop_spark.operators import (
        assign_tiles,
        boolean_pipeline,
        extract_geometries,
    )
    from rust_geo_booleanop_spark.sources import build_documents, checkpointed_write

    docs = build_documents(spark, args.sf_dir, replicate=args.replicate)
    geoms = extract_geometries(docs)
    tiled = assign_tiles(boolean_pipeline(geoms))

    # bucket tile space so the unit of recovery is bounded
    bucketed = tiled.withColumn(
        "tile_bucket", F.pmod(F.xxhash64("tile_id"), F.lit(args.buckets)).cast("int")
    )
    manifest = checkpointed_write(
        bucketed,
        args.out,
        "tile_bucket",
        lineage=f"boolean_tiling sf={args.sf_dir} replicate={args.replicate}",
        job_fingerprint=(
            f"boolean_tiling sf={args.sf_dir} replicate={args.replicate} "
            f"buckets={args.buckets}"
        ),
    )
    done = len(manifest["partitions"])
    rows = sum(p["rows"] for p in manifest["partitions"].values())
    print(f"completed {done}/{args.buckets} buckets, {rows} rows")
    spark.stop()


if __name__ == "__main__":
    main()
