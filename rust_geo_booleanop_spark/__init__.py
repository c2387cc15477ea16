"""PySpark-native spatial-join + tiling engine.

Built from scratch around the Martinez-Rueda-Feito sweep-line boolean
algebra (reference: 21re/rust-geo-booleanop), re-expressed Spark-first:
DataFrame/SQL relational shell, Arrow-vectorized pandas UDF geometry
kernel, explicit cell-grid partitioning for spatial joins at scale.
"""

__version__ = "0.1.0"
