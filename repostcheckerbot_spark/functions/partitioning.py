"""Partitioning helpers shared by operators.

The driver-generated parquet inputs are written as ONE row group per file,
so every scan arrives as a single split regardless of
``spark.sql.files.maxPartitionBytes`` — and any operator that does heavy
per-row work straight off the scan (word splitting, n-gram explodes, hash
encodes, vector math) is pinned to one core while the rest of the pool
idles. ``spread_to_parallelism`` is the shared conditional fix: repartition
up to ``sc.defaultParallelism`` only when the frame is under-split, so a
well-partitioned production scan passes through untouched (the trigger is
the split count, not a local[32] constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_to_parallelism(df: DataFrame) -> DataFrame:
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    return df.repartition(sc.defaultParallelism)
