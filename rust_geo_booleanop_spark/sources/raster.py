"""Deterministic raster source (pixel grid) for raster→vector joins.

Generated entirely JVM-side with spark.range + column expressions — no
Python in the data path, scales to arbitrarily large grids (the 100 TB
analogue is reading COG tiles; the relational shape is identical:
(px, py, x, y, value) pixels joined into zone polygons by cell key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def raster_grid(
    spark,
    width: int,
    height: int,
    origin_x: float = 0.0,
    origin_y: float = 0.0,
    pixel_size: float = 1.0,
) -> DataFrame:
    """width x height pixel grid; value is a deterministic function of the
    pixel index (integer arithmetic, reproducible anywhere)."""
    n = width * height
    px = F.col("id") % width
    py = (F.col("id") / width).cast("long")
    return (
        spark.range(n)
        .withColumn("px", px.cast("int"))
        .withColumn("py", py.cast("int"))
        .withColumn("point_id", F.col("id"))
        .withColumn("x", F.lit(origin_x) + (px + F.lit(0.5)) * pixel_size)
        .withColumn("y", F.lit(origin_y) + (py + F.lit(0.5)) * pixel_size)
        # (id % 739) bounds the product below 2^41 — id * 2654435761 alone
        # overflows int64 (silently, non-ANSI) past ~3.5e9 pixels and would
        # emit negative values
        .withColumn("value", (((F.col("id") % 739) * 2654435761) % 1000).cast("double"))
        .drop("id")
    )


def raster_zonal_stats(
    spark, zones: DataFrame, width: int, height: int, pixel_size: float = 1.0, level: int = 4
) -> DataFrame:
    """Raster→vector zonal statistics: pixels PIP-joined into zone polygons,
    aggregated per zone (the classic zonal-stats operator)."""
    from ..operators.spatial_join import zonal_stats_join

    pixels = raster_grid(spark, width, height, pixel_size=pixel_size)
    return zonal_stats_join(pixels, zones, level=level)
