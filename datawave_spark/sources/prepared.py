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


def build_all(spark: SparkSession, sf_dir: str) -> dict[str, int]:
    """Run the full ingest-side asset build for a scale-factor
    directory — the one-call "ingest job" that materializes every
    derived table queries read (geo events, forward/reverse/capped
    index, date index + sharded layout, tf maps, shingle sets +
    signatures + LSH pairs, ssdeep hashes, facet/stats tables,
    rollups, normalized-at-rest copies, embedding LSH/IVF/int8).
    Returns {asset: row_count}.  Each asset is an independent
    get_or_build (skip-if-present), so re-running after a partial
    failure resumes where it stopped — the FlagMaker-job idempotence
    discipline."""
    out: dict[str, int] = {}
    builders = {
        "geo_events": geo_events, "index_frame": index_frame,
        "reverse_index": reverse_index, "capped_index": capped_index,
        "date_index": date_index, "doc_shingle_sets": doc_shingle_sets,
        "doc_minhash": doc_minhash, "lsh_pairs": lsh_pairs,
        "doc_tf": doc_tf, "term_postings": term_postings,
        "facet_table": facet_table,
        "rollup_hourly": rollup_hourly, "index_stats": index_stats,
        "ssdeep_hashes": ssdeep_hashes, "unigram_lm": unigram_lm,
        "bigram_lm": bigram_lm,
        "normalized_documents": normalized_documents,
        "embedding_lsh": embedding_lsh, "embedding_ivf": embedding_ivf,
        "embedding_int8": embedding_int8, "embedding_pq": embedding_pq,
        "events_zorder": events_zorder,
        "classifier_weights": classifier_weights,
        "bpe_merges": bpe_merges, "bpe_segments": bpe_segments,
    }
    sharded_events(spark, sf_dir)
    out["sharded_events"] = -1   # path-returning asset; not counted
    csv_events_path(spark, sf_dir)
    out["csv_events"] = -1
    orc_events_path(spark, sf_dir)
    out["orc_events"] = -1
    png_files_path(spark, sf_dir)
    out["png_files"] = -1
    json_events_path(spark, sf_dir)
    out["json_events"] = -1
    xml_docs_path(spark, sf_dir)
    out["xml_docs"] = -1
    wiki_dump_path(spark, sf_dir)
    out["wiki_dump"] = -1
    nyctlc_csv_path(spark, sf_dir)
    out["nyctlc_csv"] = -1
    evolving_events(spark, sf_dir)
    out["evolving_events"] = -1
    for name, fn in builders.items():
        out[name] = fn(spark, sf_dir).count()
    return out


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


def _raw_copy_path(spark: SparkSession, sf_dir: str, name: str,
                   table: str, cols: list[str], write_fn) -> str:
    """Shared lazy builder for raw-format copies of a fixture table —
    one _SUCCESS-guarded coalesce(1) write per (sf, format), the
    format-specific writer injected."""
    path = prepared_path(sf_dir, name)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet")) \
            .select(*cols)
        write_fn(df.coalesce(1).write.mode("overwrite"), path)
    return path


def csv_events_path(spark: SparkSession, sf_dir: str) -> str:
    """A CSV copy of (event_id, event_type, value) — raw-format input
    for exercising the CSV reader path end-to-end."""
    return _raw_copy_path(
        spark, sf_dir, "csv_events", "events",
        ["event_id", "event_type", "value"],
        lambda w, p: w.option("header", "true").csv(p))


def orc_events_path(spark: SparkSession, sf_dir: str) -> str:
    """An ORC copy of (event_id, event_type, value, user_id) —
    raw-format input for the ORC reader path (scan-provider parity
    with parquet: pushdown + pruning work identically)."""
    return _raw_copy_path(
        spark, sf_dir, "orc_events", "events",
        ["event_id", "event_type", "value", "user_id"],
        lambda w, p: w.orc(p))


def json_events_path(spark: SparkSession, sf_dir: str) -> str:
    """A JSON-lines copy of (event_id, event_type, value, user_id) —
    raw-format input for exercising the JSON reader path end-to-end."""
    return _raw_copy_path(
        spark, sf_dir, "json_events", "events",
        ["event_id", "event_type", "value", "user_id"],
        lambda w, p: w.json(p))


def xml_docs_path(spark: SparkSession, sf_dir: str) -> str:
    """A Wikipedia-dump-shaped XML copy of the documents table
    (<page><id/><lang/><text/></page> records) — raw-format input for
    exercising the record-oriented XML reader end-to-end.  Entity
    escaping is done with codegen'd replaces; the reader's ElementTree
    parse unescapes, so the round trip is lossless."""
    import os as _os
    from pyspark.sql import functions as F
    path = prepared_path(sf_dir, "xml_docs")
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        d = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet")) \
            .select("doc_id", "lang", "text")

        def esc(c):
            c = F.replace(c, F.lit("&"), F.lit("&amp;"))
            c = F.replace(c, F.lit("<"), F.lit("&lt;"))
            return F.replace(c, F.lit(">"), F.lit("&gt;"))

        row = F.concat(
            F.lit("<page><id>"), F.col("doc_id").cast("string"),
            F.lit("</id><lang>"), esc(F.col("lang")),
            F.lit("</lang><text>"), esc(F.col("text")),
            F.lit("</text></page>"))
        d.select(row.alias("value")).coalesce(1) \
            .write.mode("overwrite").text(path)
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


def doc_minhash(spark: SparkSession, sf_dir: str, k: int = 2,
                num_hashes: int = 16) -> DataFrame:
    """Shingle sets WITH their MinHash signatures as a stored ingest
    asset (id, shingles, n, sig) — the per-shingle salted-md5 hashing
    (num_hashes × |shingles| per doc) happens once at ingest; LSH
    queries derive band keys from the stored array (bands md5s per doc)
    and go straight to the bucket aggregation."""
    from datawave_spark.operators.dedup import attach_minhash_signatures

    def build():
        return attach_minhash_signatures(
            doc_shingle_sets(spark, sf_dir, k), num_hashes)

    return get_or_build(spark, sf_dir, f"doc_minhash_k{k}_h{num_hashes}",
                        build, range_by="id")


def lsh_pairs(spark: SparkSession, sf_dir: str, k: int = 2,
              num_hashes: int = 16, bands: int = 8,
              threshold: float = 0.3, max_bucket: int = 100) -> DataFrame:
    """Verified near-duplicate PAIRS as a stored ingest asset
    (id_a, id_b, jaccard) — in a production corpus pipeline the dedup
    decision is computed once per ingest snapshot and consumed by many
    downstream passes (clustering, canonical selection, mix rebalance);
    recomputing the LSH join per consumer would multiply the dominant
    cost.  Derived from the stored signature frame."""
    from datawave_spark.operators.dedup import minhash_lsh_pairs_from_signed

    def build():
        signed = doc_minhash(spark, sf_dir, k, num_hashes)
        return minhash_lsh_pairs_from_signed(signed, num_hashes, bands,
                                             threshold, max_bucket)

    name = f"lsh_pairs_k{k}_h{num_hashes}_b{bands}_t{threshold}_m{max_bucket}"
    return get_or_build(spark, sf_dir, name, build, range_by="id_a")


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


def term_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted postings for ranked retrieval: (term, doc_id, tf,
    doc_len), one row per distinct (term, document), derived from the
    stored tf maps (doc_tf) — a map-side explode, no re-tokenization.
    Range-clustered by ``term`` so a query's term IN-filter prunes to
    the row groups holding those postings (the shardIndex discipline
    applied to ranking: RangeStream reads the term-organized table the
    same way).  At 100 TB the corpus stats BM25 needs (N, total token
    count) live in a one-row stats asset maintained by the same ingest
    job; locally they are a one-pass aggregate."""
    def build():
        tf = doc_tf(spark, sf_dir)
        from pyspark.sql import functions as F
        return (tf.select("doc_id",
                          F.size("text_tokens").cast("long").alias("doc_len"),
                          F.explode("text_tf").alias("term", "__pos"))
                .select("term", "doc_id",
                        F.size("__pos").cast("long").alias("tf"),
                        "doc_len"))

    return get_or_build(spark, sf_dir, "term_postings", build,
                        range_by="term")


def unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus unigram language-model table (token, n, total) — the
    ingest-built asset behind perplexity quality scoring (CCNet-style
    LM filtering; the table is vocabulary-sized, not corpus-sized)."""
    from datawave_spark.operators.text import unigram_counts
    from datawave_spark.sources.parquet import read_parquet

    def build():
        docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
        return unigram_counts(docs, "text")

    return get_or_build(spark, sf_dir, "unigram_lm", build, sort_by="token")


def bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram count table (t1, t2, n12) — the companion asset to
    :func:`unigram_lm` for stupid-backoff scoring (Brants et al. 2007).
    Bigram-type-bounded (sparse vocabulary²), clustered by t1 so a
    backoff join's build side reads contiguously."""
    from datawave_spark.operators.text import bigram_counts
    from datawave_spark.sources.parquet import read_parquet

    def build():
        docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
        return bigram_counts(docs, "text")

    return get_or_build(spark, sf_dir, "bigram_lm", build, sort_by="t1")


def rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly pre-aggregate of the events table — the hypertable
    continuous-aggregate pattern (TimescaleDB caggs / druid rollup):
    (hour, event_type, n, sum_value) materialized at ingest and
    range-clustered by hour, so time-bounded dashboards scan the tiny
    rollup (row-group-pruned on hour) and COARSER grains (day, month)
    compose by re-aggregating it — count and sum are decomposable, so
    the daily answer from hourly partials equals the daily answer from
    raw events."""
    from pyspark.sql import functions as F
    from datawave_spark.sources.parquet import read_parquet

    def build():
        ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
        return (ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                           "event_type")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("value").alias("sum_value")))

    return get_or_build(spark, sf_dir, "rollup_hourly", build,
                        range_by="hour")


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


def capped_index(spark: SparkSession, sf_dir: str,
                 max_uids: int = 20) -> DataFrame:
    """The Uid.List-capped global index (GlobalIndexUidAggregator.java:25
    parity): per (field, value, shard) explicit uids below the cap,
    count-only above — the asset behind shard-vs-document range
    planning.  Partitioned by field."""
    from datawave_spark.sources.index_frame import build_capped_index
    from datawave_spark.sources.parquet import read_parquet

    def build():
        ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
        return build_capped_index(ev, ["event_type", "value", "user_id"],
                                  "event_id", date_col="ts",
                                  max_uids=max_uids)

    return get_or_build(spark, sf_dir, f"capped_index_m{max_uids}", build,
                        partition_by="field", sort_by="value")


def reverse_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STORED reverse index (shardReverseIndex parity,
    ShardedDataTypeHandler.java:60-116 writes it at ingest alongside the
    forward index): the index frame with ``value`` reversed, partitioned
    by field and sorted by the reversed value, so a trailing-wildcard
    term becomes a pushable ``StartsWith`` on a plain stored column —
    parquet row-group stats skip, no expression evaluation per row."""
    from datawave_spark.sources.index_frame import build_reverse_index

    def build():
        return build_reverse_index(index_frame(spark, sf_dir))

    return get_or_build(spark, sf_dir, "reverse_index", build,
                        partition_by="field", sort_by="value")


def ssdeep_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document ssdeep hashes as a stored ingest column — in the
    reference, ssdeep hashes are DATA written at ingest
    (warehouse/ingest-ssdeep feeds the ssdeepIndex table); the
    similarity query only decomposes stored hashes into ngrams and
    joins.  Clustered by doc_id."""
    from datawave_spark.operators.ssdeep import text_fixture_hashes
    from datawave_spark.sources.parquet import read_parquet

    def build():
        docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
        return text_fixture_hashes(docs, "text", "doc_id")

    return get_or_build(spark, sf_dir, "ssdeep_hashes", build,
                        range_by="doc_id")


def normalized_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with lc-normalized string fields written AT REST
    (SURVEY §1.3: the reference stores normValue in the event/index at
    ingest precisely so queries compare bare bytes).  A typed equality
    against this table compiles to a plain pushable predicate instead
    of wrapping the column in ``lower()`` — at 100 TB an unpushed
    ``lower(col) = lit`` is a full scan per query.  Clustered by
    ``source`` so the equality also row-group-skips."""
    from datawave_spark.normalizers import get_normalizer
    from datawave_spark.sources.parquet import read_parquet

    def build():
        docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
        lc = get_normalizer("lc")
        for c in ("source", "lang"):
            docs = docs.withColumn(c, lc.col(docs[c]))
        return docs

    return get_or_build(spark, sf_dir, "normalized_documents", build,
                        range_by="source")


def sharded_events(spark: SparkSession, sf_dir: str) -> str:
    """The events table stored in the canonical sharded layout:
    partitioned by ``event_date`` (= date(ts), the shard date) with a
    deterministic ``load_date`` arrival column (ingest lag of 0-2 days
    derived from event_id, so the DuckDB oracle reproduces it exactly).
    Returns the PATH — callers read it so the scan carries the hive
    partition columns for pruning."""
    from datawave_spark.sources.parquet import read_parquet

    path = prepared_path(sf_dir, "sharded_events")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from pyspark.sql import functions as F
        ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet"))
        ev = (ev.withColumn("event_date", F.to_date("ts"))
              .withColumn("load_date",
                          F.date_add(F.to_date("ts"),
                                     F.pmod(F.col("event_id"), F.lit(3))
                                     .cast("int"))))
        ev.repartition("event_date").write.mode("overwrite") \
            .partitionBy("event_date").parquet(path)
    return path


def date_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest-built date-index frame (field, date, shards) over the
    sharded events layout — DateIndexDataTypeHandler.java:79 parity.
    O(fields × days) rows; the planner's bounded metadata fetch."""
    from datawave_spark.sources.date_index import build_date_index

    def build():
        ev = spark.read.parquet(sharded_events(spark, sf_dir))
        return build_date_index(ev, {"LOAD_DATE": "load_date"})

    return get_or_build(spark, sf_dir, "date_index", build,
                        partition_by="field", sort_by="date")


def embedding_ivf_centroids(spark: SparkSession, sf_dir: str,
                            n_centroids: int = 8) -> DataFrame:
    """The IVF codebook as a stored ingest asset: (cluster, centroid).
    Tiny (n_centroids rows) — the query-time read is the same bounded
    metadata fetch as the reference's metadata-table consultations."""
    from datawave_spark.operators.similarity import ivf_centroids
    from datawave_spark.sources.parquet import read_parquet

    def build():
        emb = read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))
        cents = ivf_centroids(emb, "embedding", "vec_id",
                              n_centroids=n_centroids)
        return spark.createDataFrame(
            [(i, [float(x) for x in row]) for i, row in enumerate(cents)],
            "cluster int, centroid array<double>")

    return get_or_build(spark, sf_dir, f"embedding_ivf_centroids_c{n_centroids}",
                        build)


def embedding_ivf(spark: SparkSession, sf_dir: str,
                  n_centroids: int = 8) -> DataFrame:
    """Embeddings with their IVF cluster assignment as a STORED ingest
    column, hive-partitioned by cluster — a query probing n_probe
    clusters prunes to those directories and never touches the rest of
    the corpus (the IVF-index analog of the reference's ingest-built
    index tables)."""
    import numpy as np
    from datawave_spark.operators.similarity import ivf_assign
    from datawave_spark.sources.parquet import read_parquet

    def build():
        emb = read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))
        cents_df = embedding_ivf_centroids(spark, sf_dir, n_centroids)
        cents = np.array([r.centroid for r in
                          cents_df.orderBy("cluster").collect()])
        return ivf_assign(emb, "embedding", cents)

    return get_or_build(spark, sf_dir, f"embedding_ivf_c{n_centroids}", build,
                        partition_by="ivf_cluster")


def embedding_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized embeddings as a stored ingest asset
    (vec_id, label, q_scale, q_vec) — the 4×-smaller ANN corpus
    representation; queries score dequantized values without touching
    the float32 table."""
    from datawave_spark.operators.similarity import quantize_embeddings
    from datawave_spark.sources.parquet import read_parquet

    def build():
        emb = read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))
        return quantize_embeddings(emb, "embedding") \
            .select("vec_id", "label", "q_scale", "q_vec")

    return get_or_build(spark, sf_dir, "embedding_int8", build,
                        range_by="vec_id")


def embedding_lsh(spark: SparkSession, sf_dir: str, bits: int = 8,
                  seed: int = 42) -> DataFrame:
    """Embeddings with their random-hyperplane LSH signature as a STORED
    ingest column (vec_id, embedding, label, sig), clustered by sig —
    the ANN analog of the reference's ingest-built index tables: the
    query-time bucket probe is an IN filter on a short stored string
    that pushes to parquet, not a per-row signature computation over
    the full corpus."""
    from pyspark.sql import functions as F
    from datawave_spark.operators.similarity import (hyperplanes,
                                                     lsh_signature)
    from datawave_spark.sources.parquet import read_parquet

    def build():
        emb = read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))
        dim = len(emb.select("embedding").head()[0])
        planes = hyperplanes(dim, bits, seed)
        return emb.withColumn(
            "sig", lsh_signature(F.col("embedding").cast("array<double>"),
                                 planes))

    return get_or_build(spark, sf_dir, f"embedding_lsh_b{bits}", build,
                        range_by="sig")


def wiki_dump_path(spark: SparkSession, sf_dir: str) -> str:
    """A MediaWiki-dump-shaped XML copy of the documents table —
    <page> records with the real dump nesting (title/ns/id + revision/
    contributor structure) and a dump-style FILE NAME carrying the date
    token (``enwiki-20240105-pages.xml``), so the Wikipedia reader's
    field-depth naming, PAGE_NS rename, content diversion and
    filename-date extraction are all exercised end-to-end."""
    import glob as _glob
    import os as _os
    from pyspark.sql import functions as F
    path = prepared_path(sf_dir, "wiki_dump")
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        d = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))

        def esc(c):
            c = F.replace(c, F.lit("&"), F.lit("&amp;"))
            c = F.replace(c, F.lit("<"), F.lit("&lt;"))
            return F.replace(c, F.lit(">"), F.lit("&gt;"))

        row = F.concat(
            F.lit("<page><title>Doc "), F.col("doc_id").cast("string"),
            F.lit("</title><ns>0</ns><id>"), F.col("doc_id").cast("string"),
            F.lit("</id><revision><id>"),
            (F.col("doc_id") + 1000000).cast("string"),
            F.lit("</id><timestamp>2024-01-05T10:00:00Z</timestamp>"
                  "<contributor><username>"), esc(F.col("source")),
            F.lit("</username><id>"),
            (F.col("doc_id") % 97).cast("string"),
            F.lit("</id></contributor><comment>import</comment><text>"),
            esc(F.col("text")),
            F.lit("</text></revision></page>"))
        d.select(row.alias("value")).coalesce(1) \
            .write.mode("overwrite").text(path)
        for part in _glob.glob(_os.path.join(path, "part-*.txt")):
            _os.rename(part, _os.path.join(
                _os.path.dirname(part), "enwiki-20240105-pages.xml"))
    return path


def embedding_pq_codebooks(spark: SparkSession, sf_dir: str,
                           n_subspaces: int = 16,
                           n_centroids: int = 16) -> DataFrame:
    """The PQ codebooks as a stored ingest asset: (subspace, centroid_id,
    centroid) — m·k rows of sub_dim floats; the query-time read is a
    bounded metadata fetch (same discipline as the IVF codebook)."""
    from datawave_spark.operators.similarity import pq_codebooks
    from datawave_spark.sources.parquet import read_parquet

    def build():
        emb = read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))
        books = pq_codebooks(emb, "embedding", "vec_id",
                             n_subspaces=n_subspaces,
                             n_centroids=n_centroids)
        rows = [(j, c, [float(x) for x in books[j][c]])
                for j in range(n_subspaces) for c in range(n_centroids)]
        return spark.createDataFrame(
            rows, "subspace int, centroid_id int, centroid array<double>")

    return get_or_build(
        spark, sf_dir, f"embedding_pq_books_m{n_subspaces}_k{n_centroids}",
        build)


def embedding_pq(spark: SparkSession, sf_dir: str,
                 n_subspaces: int = 16, n_centroids: int = 16) -> DataFrame:
    """PQ-encoded embeddings as a stored ingest asset (vec_id, label,
    pq_code) — at dim=64/m=16 the codes are 16× smaller at rest than
    float32; ADC queries scan ONLY this table plus the tiny codebook,
    never the raw vectors."""
    import numpy as np
    from datawave_spark.operators.similarity import pq_encode
    from datawave_spark.sources.parquet import read_parquet

    def build():
        emb = read_parquet(spark, os.path.join(sf_dir, "embeddings.parquet"))
        bdf = embedding_pq_codebooks(spark, sf_dir, n_subspaces, n_centroids)
        rows = bdf.orderBy("subspace", "centroid_id").collect()
        sub = len(rows[0].centroid)
        books = np.array([r.centroid for r in rows]).reshape(
            n_subspaces, n_centroids, sub)
        return pq_encode(emb, "embedding", "vec_id", books) \
            .select("vec_id", "label", "pq_code")

    return get_or_build(
        spark, sf_dir, f"embedding_pq_m{n_subspaces}_k{n_centroids}", build)


def events_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events Z-ORDER clustered on (value, user_id) — the multi-column
    layout for tables queried by more than one axis: parquet row-group
    stats stay selective on BOTH columns (util.z_order_write; measured
    in tests/test_zorder.py), where the date-sharded layout serves only
    date bounds."""
    from datawave_spark.sources.parquet import read_parquet
    from datawave_spark.util import z_order_write
    path = prepared_path(sf_dir, "events_zorder")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet")) \
            .select("event_id", "value", "user_id", "event_type")
        z_order_write(ev, path, ["value", "user_id"], bits=12)
    return spark.read.parquet(path)


def classifier_weights(spark: SparkSession, sf_dir: str,
                       n_buckets: int = 1024) -> DataFrame:
    """Stored linear-classifier weight table (bucket, weight) — the
    model-as-table asset behind text.linear_classifier_score.  Weights
    here are md5-derived integer stand-ins in [-1000, 1000] (the
    codec-injection discipline: a REAL trained model drops in as the
    same two-column table; every query/oracle shape is unchanged)."""
    from pyspark.sql import functions as F

    def build():
        b = spark.range(n_buckets).select(F.col("id").alias("bucket"))
        w = (F.conv(F.substring(F.md5(F.concat(F.lit("w:"),
                                               F.col("bucket").cast("string"))),
                                1, 8), 16, 10)
             .cast("long") % 2001 - 1000)
        return b.withColumn("weight", w)

    return get_or_build(spark, sf_dir, f"classifier_weights_b{n_buckets}",
                        build)


def tiered_events(spark: SparkSession, sf_dir: str) -> tuple[str, dict]:
    """The sharded events layout SPLIT across storage tiers by shard
    age (ShardedTableDateBasedTieredVolumeChooser parity): partitions
    7+ days old (against the fixture's fixed 'now' 2024-01-31) sit
    under a cold root, younger ones under the hot/base root — built by
    actually RUNNING maintenance.tier_partitions over a copy of the
    sharded table, so the asset exercises the real move machinery.
    Returns (base_root, tiers) ready for maintenance.read_tiered."""
    import datetime as dt
    import shutil as _sh

    from datawave_spark.sources.maintenance import tier_partitions

    root = prepared_path(sf_dir, "tiered_events")
    base, cold = os.path.join(root, "hot"), os.path.join(root, "cold")
    tiers = {"cold": (cold, 7)}
    if not os.path.exists(os.path.join(root, "_SUCCESS")):
        src = sharded_events(spark, sf_dir)
        if os.path.isdir(root):
            _sh.rmtree(root)
        os.makedirs(base, exist_ok=True)
        for d in os.listdir(src):
            if d.startswith("event_date="):
                _sh.copytree(os.path.join(src, d), os.path.join(base, d))
        tier_partitions(base, tiers, now=dt.date(2024, 1, 31))
        with open(os.path.join(root, "_SUCCESS"), "w"):
            pass
    return base, tiers


def png_files_path(spark: SparkSession, sf_dir: str,
                   n_files: int = 100) -> str:
    """A directory of REAL .png FILES (one per doc_id < n_files, pixels
    the same deterministic function of doc_id as the synth entries) —
    raw input for the ``binaryFile`` media-ingest path: files on disk →
    binary column → codec, the full multimodal on-ramp."""
    from datawave_spark.operators.multimodal import synth_png_payload

    path = prepared_path(sf_dir, f"png_files_{n_files}")
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(path, exist_ok=True)
        for d in range(n_files):
            with open(os.path.join(path, f"img_{d:05d}.png"), "wb") as fh:
                fh.write(synth_png_payload(d))
        with open(marker, "w"):
            pass
    return path


def evolving_events(spark: SparkSession, sf_dir: str) -> str:
    """Two-epoch date-partitioned event layout for SCHEMA EVOLUTION —
    the reference's defining trait is schema-less dynamic fields (any
    field may appear on any event from some ingest-config change
    onward, SURVEY §1.2/§1.4); on parquet that is schema evolution
    across partitions.  Days before 2024-01-16 are written by the "v1
    ingest config" (no props, no session_id — the fields didn't exist
    yet); later days add props and a NEW session_id field.  Queries
    read the union schema via read_evolving."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from datawave_spark.sources.parquet import read_parquet

    root = prepared_path(sf_dir, "evolving_events")
    marker = os.path.join(root, "_SUCCESS.evolved")
    if not os.path.exists(marker):
        if os.path.isdir(root):
            _sh.rmtree(root)
        ev = read_parquet(spark, os.path.join(sf_dir, "events.parquet")) \
            .withColumn("event_date", F.col("ts").cast("date"))
        # NULL dates ride with the v1 epoch: both epoch filters are
        # NULL-false, so without this a NULL-ts row would silently
        # land in NEITHER epoch and evolution WOULD change answers
        old = ev.filter((F.col("event_date") < "2024-01-16")
                        | F.col("event_date").isNull()).drop("props")
        new = (ev.filter(F.col("event_date") >= "2024-01-16")
               .withColumn("session_id",
                           F.concat_ws(":",
                                       F.col("user_id").cast("string"),
                                       F.col("event_date").cast("string"))))
        old.write.partitionBy("event_date").mode("overwrite").parquet(root)
        new.write.partitionBy("event_date").mode("append").parquet(root)
        with open(marker, "w"):
            pass
    return root


def _bpe_model(spark: SparkSession, sf_dir: str,
               n_merges: int) -> tuple[DataFrame, DataFrame]:
    """Build-or-read BOTH tokenizer assets.  Training runs AT MOST
    once per cold build (with_state=True yields the merge table and
    the segmentation end-state from the same run), memoized across
    the two get_or_build closures."""
    from datawave_spark.operators.text import bpe_train
    from datawave_spark.sources.parquet import read_parquet
    memo: dict = {}

    def train():
        if "r" not in memo:
            docs = read_parquet(spark, os.path.join(sf_dir,
                                                    "documents.parquet"))
            memo["r"] = bpe_train(docs, "text", n_merges=n_merges,
                                  min_pair_count=1, with_state=True)
        return memo["r"]

    merges = get_or_build(spark, sf_dir, f"bpe_merges_{n_merges}",
                          lambda: train()[0].coalesce(1))
    segments = get_or_build(spark, sf_dir, f"bpe_segments_{n_merges}",
                            lambda: train()[1], range_by="w")
    return merges, segments


def bpe_merges(spark: SparkSession, sf_dir: str,
               n_merges: int = 6) -> DataFrame:
    """The learned BPE merge table (step, left, right, pair_count) as
    a STORED ingest asset — tokenizer training is an ingest-side job
    (the signatures/codebooks discipline); queries read the result."""
    return _bpe_model(spark, sf_dir, n_merges)[0]


def bpe_segments(spark: SparkSession, sf_dir: str,
                 n_merges: int = 6) -> DataFrame:
    """The BPE training end-state (w, cnt, syms) — the vocabulary-
    sized segmentation table bpe_encode broadcast-joins against,
    stored at ingest alongside the merge table."""
    return _bpe_model(spark, sf_dir, n_merges)[1]


def nyctlc_csv_path(spark: SparkSession, sf_dir: str) -> str:
    """A NYC-TLC-shaped CSV derived from the events table — the
    reference's taxi dataset (warehouse/ingest-nyctlc): a header line
    naming a SUBSET of the known field list plus an unknown TRIP_ID
    column (NYCTLCHelper.parseHeader validates-but-allows unknowns,
    PROCESS_EXTRA_FIELDS), raw STRING lat/lon built from integer/string
    ops only (the derived WKT concatenates the raw field strings, so
    no float formatting may differ between engines), and error-type
    rows carry EMPTY dropoff coordinates to exercise the
    missing-pair path (the helper logs and skips the derived point)."""
    import os as _os

    from pyspark.sql import functions as F

    from datawave_spark.sources.parquet import read_parquet

    path = prepared_path(sf_dir, "nyctlc_csv")
    if not _os.path.exists(_os.path.join(path, "_SUCCESS")):
        ev = read_parquet(spark, _os.path.join(sf_dir, "events.parquet"))
        # abs() before every mod: the oracle SQL uses DuckDB's `%`
        # (sign of the dividend) while Spark's pmod is always
        # non-negative — abs makes the two agree for ANY future
        # dataset, not just the current non-negative ids.
        pad3 = lambda c: F.lpad(F.pmod(F.abs(c), F.lit(1000))
                                .cast("string"), 3, "0")
        missing = F.col("event_type") == "error"
        out = ev.select(
            F.col("event_id").cast("string").alias("trip_id"),
            (F.pmod(F.abs(F.col("user_id")), F.lit(3)) + 1).cast("string")
            .alias("vendorid"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
            .alias("lpep_pickup_datetime"),
            (F.pmod(F.abs(F.col("event_id")), F.lit(5)) + 1).cast("string")
            .alias("passenger_count"),
            F.concat(F.lit("-73."), pad3(F.col("user_id")))
            .alias("pickup_longitude"),
            F.concat(F.lit("40."), pad3(F.col("user_id") + 7))
            .alias("pickup_latitude"),
            F.when(missing, F.lit(None)).otherwise(
                F.concat(F.lit("-74."), pad3(F.col("event_id"))))
            .alias("dropoff_longitude"),
            F.when(missing, F.lit(None)).otherwise(
                F.concat(F.lit("41."), pad3(F.col("event_id") + 13)))
            .alias("dropoff_latitude"),
            F.col("value").cast("string").alias("total_amount"))
        (out.coalesce(4).write.mode("overwrite")
         .option("header", True).csv(path))
    return path
