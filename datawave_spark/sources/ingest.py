"""Batch ingest: raw records → the sharded event layout.

Reference: the MapReduce ingest job (warehouse/ingest-core/.../job/
IngestJob.java:129) routing records through ShardedDataTypeHandler
(handler/shard/ShardedDataTypeHandler.java:60-116), which emits the
event section, field index, term offsets (tf) and metadata entries, with
``shardId = YYYYMMDD_N, N = hash(uid) % numShards`` (:105-108).

Spark restatement — the six Accumulo tables collapse to ONE partitioned
parquet/Delta table plus a tiny metadata frame:

- event section      → the wide DataFrame itself;
- shardId            → ``partitionBy(event_date)`` + a ``shard`` column
                       (date + uid-hash bucket) for co-located joins;
- field index (fi)   → unnecessary: Catalyst predicate pushdown +
                       parquet column statistics do index's job;
- tf term offsets    → ``{zone}_tf`` map<token, array<int>> columns
                       built by ``tokenize`` (ContentIndexingColumn
                       BasedHandler.java:63, TermWeight protobuf);
- metadata table     → ``field_metadata`` frame (EventMetadata.java,
                       addIndexedFieldToMetadata:406-417);
- LOAD_DATE tracking → a real ``load_date`` column (filter:afterLoadDate
                       et al. query it).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from datawave_spark.normalizers import get_normalizer


@dataclass
class IngestConfig:
    """Per-datatype ingest configuration — the analogue of the
    reference's per-datatype helper/handler config properties
    (ingest config files; CSVIngestHelper etc.)."""
    datatype: str
    date_field: str                      # event-time column
    uid_fields: list[str] | None = None  # identity fields (None → all cols)
    field_types: dict[str, str] = dc_field(default_factory=dict)
    multi_value_delim: dict[str, str] = dc_field(default_factory=dict)
    tokenized_fields: list[str] = dc_field(default_factory=list)
    visibility: str | None = None        # default ColumnVisibility marking
    num_shards: int = 32
    normalize_at_rest: bool = False      # write normalized copies?


def build_uid(df: DataFrame, uid_fields: list[str] | None) -> Column:
    """Deterministic uid from identity fields (the reference's
    hash-based UID, datawave.data.hash.UID).

    NULLs are encoded with a distinct sentinel before hashing —
    concat_ws silently SKIPS null columns, so without it distinct
    records whose non-null values align (('a', NULL, 'b') vs
    ('a', 'b', NULL)) would collide to one uid, merging their tf maps
    and shard/dedup identity."""
    cols = uid_fields or df.columns
    return F.md5(F.concat_ws("\x00", *[
        F.coalesce(F.col(c).cast("string"), F.lit("\x01NULL")) for c in cols]))


def tokenize(df: DataFrame, text_col: str, id_col: str,
             zone: str | None = None, emit_tokens: bool = False,
             emit_scores: bool = False) -> DataFrame:
    """Add ``{zone}_tf``: map<token, sorted array of positions> — the
    per-document TermOffsetMap the content: functions evaluate against
    (query/postprocessing/tf/TermOffsetMap.java:16).

    Shape: posexplode tokens → groupBy (id, token) collecting sorted
    positions → groupBy id assembling the map → join back.  Two
    shuffles at ingest time, but every stage is codegen'd aggregation —
    the higher-order-function alternative (per-distinct-token position
    filter) re-evaluates the tokenizer per array element after
    Catalyst's projection collapse and goes quadratic per document.

    ``emit_scores`` adds ``{zone}_scores``: map<token, double> of
    ``ln(term_count / doc_token_total)`` — the TermWeight score analog
    (warehouse/core/.../protobuf/TermWeightPosition.java; the
    reference's scoring tokenizers store a weight per position, here
    one per distinct token) consumed by ``content:scoredPhrase``.
    """
    zone = zone or text_col
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != "")
    tok = df.select(F.col(id_col).alias("__id"),
                    F.posexplode_outer(toks).alias("__pos", "__tok"))
    per_term = (tok.filter(F.col("__tok").isNotNull())
                .groupBy("__id", "__tok")
                .agg(F.sort_array(F.collect_list("__pos")).alias("__positions")))
    tf_aggs = [F.map_from_entries(
        F.collect_list(F.struct("__tok", "__positions"))).alias("__tf")]
    if emit_scores:
        tf_aggs.append(F.collect_list(
            F.struct(F.col("__tok"),
                     F.size("__positions").alias("__cnt"))).alias("__cnts"))
    tf = per_term.groupBy("__id").agg(*tf_aggs)
    if emit_scores:
        total = F.aggregate(F.col("__cnts"), F.lit(0),
                            lambda acc, s: acc + s.getField("__cnt"))
        tf = tf.withColumn("__scores", F.map_from_entries(F.transform(
            F.col("__cnts"),
            lambda s: F.struct(
                s.getField("__tok"),
                F.log(s.getField("__cnt").cast("double") / total))))) \
            .drop("__cnts")
    if emit_tokens:
        # Materialized position-ordered token array on the same shuffle
        # key — consumers (excerpts) then slice real data instead of
        # re-tokenizing the text per reference.
        toks_agg = (tok.filter(F.col("__tok").isNotNull())
                    .groupBy("__id")
                    .agg(F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("__pos", "__tok"))),
                        lambda s: s.getField("__tok")).alias("__tokens")))
        tf = tf.join(toks_agg, "__id", "left")
    out = df.join(tf, df[id_col] == tf["__id"], "left")
    empty = F.create_map().cast("map<string,array<int>>")
    out = out.withColumn(f"{zone}_tf", F.coalesce(F.col("__tf"), empty))
    if emit_tokens:
        out = out.withColumn(
            f"{zone}_tokens",
            F.coalesce(F.col("__tokens"), F.array().cast("array<string>"))) \
            .drop("__tokens")
    if emit_scores:
        empty_scores = F.create_map().cast("map<string,double>")
        out = out.withColumn(
            f"{zone}_scores",
            F.coalesce(F.col("__scores"), empty_scores)).drop("__scores")
    return out.drop("__id", "__tf")


def ingest_events(df: DataFrame, config: IngestConfig) -> DataFrame:
    """Transform raw records into the canonical event frame: adds
    ``datatype, uid, event_date, shard, visibility, load_date`` plus
    array-ified multi-value fields and ``{zone}_tf`` offset maps."""
    out = df
    for col_name, delim in config.multi_value_delim.items():
        out = out.withColumn(col_name, F.split(F.col(col_name), delim))
    if config.normalize_at_rest:
        for col_name, norm_name in config.field_types.items():
            if col_name in out.columns:
                norm = get_normalizer(norm_name)
                out = out.withColumn(col_name, norm.col(F.col(col_name)))
    out = out.withColumn("uid", build_uid(df, config.uid_fields))
    for zone in config.tokenized_fields:
        out = tokenize(out, zone, id_col="uid")
    event_date = F.to_date(F.col(config.date_field))
    shard = F.concat_ws(
        "_", F.date_format(event_date, "yyyyMMdd"),
        F.pmod(F.crc32(F.col("uid")), F.lit(config.num_shards)).cast("string"))
    return (out.withColumn("datatype", F.lit(config.datatype))
            .withColumn("event_date", event_date)
            .withColumn("shard", shard)
            .withColumn("visibility", F.lit(config.visibility).cast("string"))
            .withColumn("load_date", F.current_timestamp()))


def write_events(df: DataFrame, path: str, mode: str = "append") -> None:
    """Persist the event frame partitioned by event_date — the analogue
    of sharded RFile bulk import.  At 100 TB: date partitions give
    partition pruning for every date-bounded query (RangeStream parity
    for free); within a partition, files arrive uid-hash-distributed
    from the shuffle."""
    (df.repartition(F.col("event_date"), F.col("shard"))
       .write.mode(mode).partitionBy("event_date").parquet(path))


def field_metadata(df: DataFrame, config: IngestConfig) -> DataFrame:
    """The metadata-table frame (SURVEY §1.4): one row per field with
    datatype, spark type, bound normalizer, tokenized flag and
    non-null count — what the planner consults for typing and
    unfielded-term expansion."""
    spark = df.sparkSession
    rows = []
    counts_df = df.agg(*[
        F.count(F.col(f.name)).alias(f.name) for f in df.schema.fields])
    counts = counts_df.collect()[0].asDict()
    for f in df.schema.fields:
        rows.append({
            "field": f.name.upper(),
            "datatype": config.datatype,
            "spark_type": f.dataType.simpleString(),
            "normalizer": config.field_types.get(f.name, "noop"),
            "tokenized": f.name in config.tokenized_fields,
            "indexed": True,   # every column is predicate-capable on Spark
            "n_values": counts[f.name],
        })
    return spark.createDataFrame(
        rows,
        "field string, datatype string, spark_type string, "
        "normalizer string, tokenized boolean, indexed boolean, n_values long")


def composite_column(df: DataFrame, fields: list[str], out_col: str,
                     sep: str = "\x00") -> DataFrame:
    """Generated composite column (Composite.java's joined term) —
    create at ingest for field combinations queried together, pair with
    ``compiler.rewrite.expand_composites`` at plan time.  Sorting or
    Z-ORDERing the table by this column makes the collapsed term a
    contiguous scan range."""
    return df.withColumn(
        out_col, F.concat_ws(sep, *[F.col(f).cast("string") for f in fields]))


def validate_events(df: DataFrame, rules: list[tuple[str, Column]],
                    uid_col: str, job_name: str = "ingest",
                    job_id: str = "0",
                    event_expr: Column | None = None
                    ) -> tuple[DataFrame, DataFrame]:
    """Ingest dead-letter split (ErrorShardedDataTypeHandler.java:103,
    field layout :107-115 — JOB_NAME/JOB_ID/EVENT_UUID/ERROR/
    STACKTRACE/EVENT): rows failing any validation rule route to the
    processingErrors-table analog instead of poisoning the shard
    tables; the error rows carry WHICH rules failed plus the raw
    event content, so they are queryable and re-ingestable after a
    config fix (the reference's reprocessing loop).

    ``rules``: (name, condition) pairs where the condition is TRUE for
    a VALID row; a NULL condition (e.g. ``value > 0`` on a NULL value)
    counts as a FAILURE — fail-closed, because an unevaluatable rule
    is exactly the malformed-field case the error table exists for.
    ``event_expr`` overrides the raw-content column (default: the full
    row as JSON).  Returns (valid, errors); one pass, zero shuffles —
    both sides are filters over the same tagged projection."""
    if not rules:
        raise ValueError("validate_events needs at least one rule")
    fails = [F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
             for name, cond in rules]
    errs = F.filter(F.array(*fails), lambda x: x.isNotNull())
    tagged = df.withColumn("__errors", errs)
    good = tagged.filter(F.size("__errors") == 0).drop("__errors")
    content = event_expr if event_expr is not None \
        else F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    bad = (tagged.filter(F.size("__errors") > 0)
           .select(F.col(uid_col).cast("string").alias("event_uuid"),
                   F.lit(job_name).alias("job_name"),
                   F.lit(job_id).alias("job_id"),
                   F.concat_ws(",", "__errors").alias("error"),
                   content.alias("event")))
    return good, bad


def compare_configs(left: IngestConfig, right: IngestConfig
                    ) -> dict[str, list[str]]:
    """Datatype-config diff (ops-tools/config-compare
    DataTypeConfigCompare.java + CompareResult.java): compare two
    ingest configurations field-by-field ignoring the datatype name
    (the reference strips the per-datatype prefix for the same
    reason), reporting sorted ``same`` / ``diff`` / ``left_only`` /
    ``right_only`` keys — the drift check before pointing a new
    datatype at a shared deployment."""
    import dataclasses as _dc

    def flat(cfg: IngestConfig) -> dict[str, object]:
        # iterate the dataclass fields so a future IngestConfig field
        # is in the drift check by construction (the tool exists to
        # catch drift — a hardcoded list would silently miss new keys);
        # only the datatype NAME is excluded (prefix-strip parity)
        out: dict[str, object] = {}
        for f in _dc.fields(cfg):
            if f.name == "datatype":
                continue
            v = getattr(cfg, f.name)
            if isinstance(v, dict):
                for k, dv in v.items():
                    out[f"{f.name}.{k}"] = dv
            elif isinstance(v, list):
                # [] and None are the same config (uid_fields or
                # df.columns in build_uid) — normalize so the drift
                # check doesn't report a spurious diff
                out[f.name] = tuple(v) if v else None
            else:
                out[f.name] = v
        return out

    lf, rf = flat(left), flat(right)
    same = sorted(k for k in lf if k in rf and lf[k] == rf[k])
    diff = sorted(k for k in lf if k in rf and lf[k] != rf[k])
    left_only = sorted(k for k in lf if k not in rf)
    right_only = sorted(k for k in rf if k not in lf)
    return {"same": same, "diff": diff,
            "left_only": left_only, "right_only": right_only}
