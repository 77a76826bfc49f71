"""Small engine utilities: parallelism spreading, skew-salted joins,
bucketed table helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


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


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join: salt the fact side's key with a random
    bucket and replicate the (small) dim side across all salt values.

    Use when one key dominates (AQE's skew-join split handles moderate
    skew automatically; salting is the explicit fix when a single key
    exceeds what one task can hold).  The dim side is replicated
    ``salt``× — keep it the smaller input.
    """
    salted_fact = fact.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int"))
    salts = dim.sparkSession.range(salt).select(
        F.col("id").cast("int").alias("__salt"))
    salted_dim = dim.crossJoin(F.broadcast(salts))
    out = salted_fact.join(salted_dim, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 32,
                   sort_by: str | None = None, mode: str = "overwrite") -> None:
    """Persist hash-bucketed by ``key`` (saveAsTable — bucket metadata
    needs the catalog): later equi-joins/aggregations on ``key`` between
    tables bucketed the same way run WITHOUT a shuffle.  This is the
    co-located-join analog of the reference's uid-hash shard bucketing
    (BalancedShardPartitioner)."""
    w = df.write.mode(mode).bucketBy(buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)
