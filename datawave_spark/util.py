"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` (default: cluster default
    parallelism) for CPU-bound per-row stages (tokenization, hashing).

    Locally a small parquet table arrives as ONE input split, which
    serializes regex/md5 work onto one core; on a real cluster a table
    under ``maxPartitionBytes`` does the same.  The repartition shuffles
    only the raw input once and is a no-op (returns df unchanged) when
    the scan is already wide — so at 100 TB, where scans come in with
    ~100k splits, this never shrinks parallelism.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
