"""Prepared (ingest-materialized) derived assets.

The reference stores its acceleration structures — the global inverted
index (shardIndex, SURVEY §1.1) and geo index strings (GeoType z-order,
DiscreteIndexType) — at INGEST time; queries only read them.  Round-1
entries rebuilt these per query, which benchmarks ingest, not lookup.
This module materializes each asset once per scale-factor directory
under a local cache root and hands queries the stored table:

- ``geo_events``  — (event_id, lat, lon, geohash), range-partitioned +
  sorted by geohash so coarse prefix predicates prune via parquet
  row-group stats (the GeoWave tiered-range analog).
- ``index_frame`` — the inverted-index frame (field, value, uid,
  event_date), partitioned by ``field`` and sorted by ``value`` within
  partitions: a term lookup prunes to one field directory and
  row-group-skips on value (RangeStream.java:106 reads the
  index-organized table the same way).

At 100 TB these writes are the ingest job's responsibility
(write_events/write_bucketed); the lazy build here exists so local
correctness runs don't need a separate ingest step.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

PREPARED_ROOT = os.environ.get("SPARK_GRAFT_PREPARED_DIR",
                               os.path.join(os.path.dirname(os.path.dirname(
                                   os.path.dirname(os.path.abspath(__file__)))),
                                   ".prepared"))


def prepared_path(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(PREPARED_ROOT, tag, name)


def get_or_build(spark: SparkSession, sf_dir: str, name: str, build_fn,
                 *, range_by: str | None = None,
                 partition_by: str | None = None,
                 sort_by: str | None = None,
                 num_parts: int = 8) -> DataFrame:
    """Read the prepared asset, building + writing it first if absent.

    ``range_by``: repartitionByRange + sortWithinPartitions on that
    column (global clustering → row-group stats pruning on it).
    ``partition_by``: hive-style directory partitioning (partition
    pruning on equality).  ``sort_by``: within-partition sort.
    """
    path = prepared_path(sf_dir, name)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df = build_fn()
        w = df
        if range_by:
            w = df.repartitionByRange(num_parts, range_by) \
                  .sortWithinPartitions(range_by)
        elif sort_by:
            w = df.sortWithinPartitions(sort_by)
        writer = w.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(path)
    return spark.read.parquet(path)


def geo_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events with a stored geohash column, clustered by geohash."""
    from pyspark.sql import functions as F
    from datawave_spark.functions.geohash import add_geohash
    from datawave_spark.sources.parquet import read_parquet

    def build():
        ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet")) \
            .select("event_id",
                    (F.col("user_id") % 160 - 80).cast("double").alias("lat"),
                    (F.col("event_id") % 360 - 180).cast("double").alias("lon"))
        return add_geohash(ev, "lat", "lon", precision=6)

    return get_or_build(spark, sf_dir, "geo_events", build, range_by="geohash")


def csv_events_path(spark: SparkSession, sf_dir: str) -> str:
    """A CSV copy of (event_id, event_type, value) — raw-format input
    for exercising the CSV reader path end-to-end."""
    import os as _os
    path = prepared_path(sf_dir, "csv_events")
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        ev = spark.read.parquet(_os.path.join(sf_dir, "events.parquet")) \
            .select("event_id", "event_type", "value")
        ev.coalesce(1).write.mode("overwrite") \
            .option("header", "true").csv(path)
    return path


def doc_shingle_sets(spark: SparkSession, sf_dir: str,
                     k: int = 2) -> DataFrame:
    """Per-document word k-shingle sets (id, shingles, n) over the
    documents table — the ingest-time dedup asset (the TermFrequency-map
    analog; reference stores tf offset maps in the ``tf`` column family
    at ingest, SURVEY §1.1).  MinHash/LSH/Jaccard passes derive
    signatures row-wise from this frame instead of re-tokenizing raw
    text per query."""
    from datawave_spark.operators.dedup import shingle_sets
    from datawave_spark.sources.parquet import read_parquet

    def build():
        docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
        return shingle_sets(docs, "text", "doc_id", k)

    return get_or_build(spark, sf_dir, f"doc_shingle_sets_k{k}", build,
                        range_by="id")


def doc_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with ingest-materialized term-frequency artifacts:
    ``text_tf`` (map<token, positions> — the tf column family /
    TermWeight protobuf analog, ShardedDataTypeHandler.java:60-116),
    ``text_tokens`` (position-ordered token array for excerpts) and
    ``text_scores`` (per-term ln-frequency, the TermWeight score
    consumed by content:scoredPhrase).  The reference writes these at
    ingest; content:/excerpt queries only read them."""
    from datawave_spark.sources.ingest import tokenize
    from datawave_spark.sources.parquet import read_parquet

    def build():
        docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
        return tokenize(docs, "text", "doc_id",
                        emit_tokens=True, emit_scores=True)

    return get_or_build(spark, sf_dir, "doc_tf", build, range_by="doc_id")


def facet_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precomputed facet counts over the events table — the facet
    TABLE the reference maintains at ingest (FacetHandler.java:52
    writes field-value co-occurrence counts + cardinality sketches);
    queries read it instead of re-aggregating the corpus.  Partitioned
    by ``field`` so a one-field facet lookup prunes to one directory."""
    from datawave_spark.operators.discovery import facets_with_cardinality
    from datawave_spark.sources.parquet import read_parquet

    def build():
        ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
        return facets_with_cardinality(ev, ["event_type", "user_id"],
                                       "event_id")

    return get_or_build(spark, sf_dir, "facet_table", build,
                        partition_by="field", sort_by="value")


def index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-field cardinality statistics — the index-stats table built by
    the reference's MapReduce stats job (StatsHyperLogMapper →
    HyperLogFieldSummary): one row per field with exact distinct count
    (cheap at ingest) and the HLL approximation the planner would use
    for cost ordering (OrderByCostVisitor)."""
    from pyspark.sql import functions as F
    from datawave_spark.sources.parquet import read_parquet

    def build():
        ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
        fields = ["event_type", "user_id", "event_id"]
        rows = [F.struct(
            F.lit(f).alias("field"),
            F.countDistinct(F.col(f)).alias("cardinality"),
            F.approx_count_distinct(F.col(f)).alias("cardinality_hll"))
            for f in fields]
        return ev.agg(F.array(*rows).alias("a")).selectExpr("inline(a)")

    return get_or_build(spark, sf_dir, "index_stats", build)


def index_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized inverted-index frame over the events table."""
    from datawave_spark.sources.index_frame import build_index
    from datawave_spark.sources.parquet import read_parquet

    def build():
        ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
        return build_index(ev, ["event_type", "value", "user_id"], "event_id",
                           date_col="ts")

    return get_or_build(spark, sf_dir, "index_frame", build,
                        partition_by="field", sort_by="value")
