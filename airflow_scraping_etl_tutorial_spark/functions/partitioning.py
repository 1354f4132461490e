"""Partition-shape helpers.

Spark parallelism is bounded by input partition count. A small parquet
file (or a handful of large row groups) arrives as 1-2 partitions, so a
CPU-heavy map stage (shingling/hashing/vector math) runs on 1-2 cores no
matter how many the cluster has. At 100 TB inputs arrive already split
into thousands of scan tasks and fan_out is a no-op; it exists for the
small-input regime where compute-per-row, not data volume, dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition IF the input has fewer partitions than the
    session's default parallelism (i.e. cores would sit idle). The extra
    shuffle moves each row once — worth it exactly when downstream
    per-row compute exceeds row transfer cost; callers are the heavy
    operators (minhash, simhash, vector scoring)."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
