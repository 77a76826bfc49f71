#!/usr/bin/env python3
"""10× scale probe: generate deterministic synthetic events (6M rows)
and documents (50k, planted near-dups) under .scratch/, then compare
operator wall times at 1× (driver sf0.1) vs 10× — the "would this
survive a scale-up" check.  Results from 2026-08-13 are recorded in
README.md §Measured scaling.

Usage: python tools/scale_probe.py [--keep]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       ".scratch")


def generate(spark):
    from pyspark.sql import functions as F
    ev_out = f"{SCRATCH}/events_sf1.parquet"
    if not os.path.exists(ev_out):
        n = 6_000_000
        (spark.range(n).select(
            F.col("id").alias("event_id"),
            (F.lit("2024-01-01").cast("timestamp").cast("long")
             + (F.col("id") * 43) % (30 * 86400)).cast("timestamp").alias("ts"),
            (F.xxhash64(F.col("id")) % 15000).alias("user_id"),
            F.element_at(F.array(*[F.lit(x) for x in
                ["click", "view", "purchase", "error", "signup"]]),
                (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), 5) + 1).cast("int"))
            .alias("event_type"),
            F.round(F.pmod(F.xxhash64(F.col("id"), F.lit(2)), 49000) / 100.0
                    + 0.01, 2).alias("value"),
            F.concat(F.lit('{"k": '),
                     F.pmod(F.xxhash64(F.col("id"), F.lit(3)), 100).cast("string"),
                     F.lit("}")).alias("props"))
         .repartition(16).write.mode("overwrite").parquet(ev_out))
    doc_out = f"{SCRATCH}/documents_sf1.parquet"
    if not os.path.exists(doc_out):
        words = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
                 "part", "hash", "merge", "batch", "spark", "line", "sort",
                 "window", "the", "a", "query", "big", "data", "column", "join",
                 "small", "customer", "stream", "group", "filter", "vector",
                 "order"]
        warr = F.array(*[F.lit(w) for w in words])
        base = spark.range(50000).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[
                F.element_at(warr, (F.pmod(F.xxhash64(F.col("id"), F.lit(i)), 30)
                                    + 1).cast("int"))
                for i in range(60)]).alias("text"))
        dups = spark.range(500).select(
            (F.col("id") + 49500).alias("doc_id2"), F.col("id").alias("src"))
        planted = (base.join(dups, base.doc_id == dups.src)
                   .select(F.col("doc_id2").alias("doc_id"),
                           F.concat(F.col("text"), F.lit(" extra tail words"))
                           .alias("text")))
        (base.filter(F.col("doc_id") < 49500).union(planted)
         .repartition(8).write.mode("overwrite").parquet(doc_out))


def _ssdeep_probe(docs):
    from pyspark.sql import functions as F
    from datawave_spark.entries import _fake_ssdeep_frame
    from datawave_spark.operators.ssdeep import ssdeep_similarity_join
    hashes = _fake_ssdeep_frame(docs)
    queries = hashes.filter(F.col("doc_id") < 100)
    ssdeep_similarity_join(queries, hashes, "ssdeep", "doc_id",
                           max_repeated=0) \
        .write.format("noop").mode("overwrite").save()


def probe(spark):
    from pyspark.sql import functions as F
    from datawave_spark.compiler import compile_query
    from datawave_spark.operators import dedup
    from datawave_spark.operators.grouping import group_by
    from datawave_spark.sources.ingest import tokenize
    from datawave_spark.sources.parquet import read_parquet

    small_e = read_parquet(spark, "/root/testdata/sf0.1/events.parquet")
    big_e = spark.read.parquet(f"{SCRATCH}/events_sf1.parquet")
    small_d = read_parquet(spark, "/root/testdata/sf0.1/documents.parquet")
    big_d = spark.read.parquet(f"{SCRATCH}/documents_sf1.parquet")
    for df in (small_e, big_e, small_d, big_d):
        df.count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def t(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    ops = {
        "jexl_filter": (lambda d: noop(compile_query(
            d, "EVENT_TYPE == 'click' && VALUE > 50")), small_e, big_e),
        "groupby": (lambda d: noop(group_by(
            d, ["event_type"], [("SUM", "value", "s")])), small_e, big_e),
        "tokenize_tf": (lambda d: noop(tokenize(d, "text", "doc_id")),
                        small_d, big_d),
        "minhash_sig": (lambda d: noop(dedup.minhash_signatures(
            d, "text", "doc_id", 2, 8)), small_d, big_d),
        "simhash": (lambda d: noop(dedup.simhash_buckets(
            d, "text", "doc_id", 8)), small_d, big_d),
        "lsh_pairs": (lambda d: noop(dedup.minhash_lsh_pairs(
            d, "text", "doc_id", k=2, num_hashes=16, bands=8,
            threshold=0.3, max_bucket=100)), small_d, big_d),
        "ssdeep_join": (lambda d: _ssdeep_probe(d), small_d, big_d),
    }
    print(f"{'op':12} {'1x':>7} {'10x':>8} {'ratio':>6}")
    for name, (fn, s_df, b_df) in ops.items():
        fn(s_df)  # codegen warm
        s, b = t(lambda: fn(s_df)), t(lambda: fn(b_df))
        print(f"{name:12} {s:7.1f} {b:8.1f} {b / max(s, 0.01):6.1f}")


if __name__ == "__main__":
    from datawave_spark.session import get_spark
    spark = get_spark("scale_probe")
    generate(spark)
    probe(spark)
    if "--keep" not in sys.argv:
        shutil.rmtree(SCRATCH, ignore_errors=True)
        print("(.scratch removed; pass --keep to retain)")
