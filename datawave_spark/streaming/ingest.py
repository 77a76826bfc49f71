"""Structured Streaming ingest + event-time operators.

Reference mapping (SURVEY §2.7): DataWave's "live ingest" is
micro-batched MapReduce (IngestJob.java:115-127,483) triggered by the
FlagMaker polling HDFS for new files (util/flag/FlagMaker.java:60).
There are no watermarks or event-time windows in the reference — late
data just lands in its event-date shard.

Spark restatement:
- FlagMaker            → the file stream source + ``Trigger.AvailableNow``
                         (poll, batch, ingest, stop — exactly the
                         FlagMaker loop, minus the daemon);
- live ingest          → ``stream_ingest``: the SAME ``ingest_events``
                         transform as batch, writing date-partitioned
                         parquet with a checkpoint (the reference's
                         checkpointable-query/resume machinery becomes
                         the sink checkpoint);
- late data            → identical semantics: rows partition by their
                         EVENT date regardless of arrival time;
- new capabilities     → watermarked windowed/sessionized aggregation,
                         which the reference cannot express at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from datawave_spark.sources.ingest import IngestConfig, ingest_events


def stream_ingest(spark: SparkSession, input_path: str, schema: T.StructType,
                  config: IngestConfig, output_path: str,
                  checkpoint_path: str, fmt: str = "parquet",
                  available_now: bool = True,
                  pre=None,
                  options: dict[str, str] | None = None,
                  validation_rules: list | None = None,
                  error_path: str | None = None,
                  uid_col: str | None = None) -> StreamingQuery:
    """File-arrival ingest: watch ``input_path``, run the batch ingest
    transform per micro-batch, append to the date-partitioned event
    table.  ``available_now=True`` processes the backlog and stops
    (FlagMaker one-shot); False runs continuously.  ``pre`` is an
    optional raw-record adapter DataFrame→DataFrame applied before the
    ingest transform — the reader/helper separation of the reference's
    per-datatype record readers (e.g. decode a nanos-long timestamp
    column into a real timestamp).

    ``validation_rules`` + ``error_path`` wire the dead-letter split
    into the live path (ErrorShardedDataTypeHandler — the reference's
    error handler runs INSIDE the same ingest job): per micro-batch,
    rows failing a rule append to the error table and only valid rows
    continue to the shard write.  ``uid_col`` names the raw-record id
    for the error rows (defaults to the config's first uid field)."""
    if validation_rules:
        # fail at call time, not asynchronously inside the first
        # micro-batch wrapped in a StreamingQueryException
        if error_path is None:
            raise ValueError("validation_rules need an error_path")
        if uid_col is None and not config.uid_fields:
            raise ValueError(
                "validation_rules need uid_col (or config.uid_fields) "
                "— the raw batch has no built uid column yet")
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    raw = reader.load(input_path)
    if pre is not None:
        raw = pre(raw)

    # foreachBatch so each micro-batch runs the FULL batch ingest
    # transform (tokenize aggregates per batch — a streaming
    # aggregation would otherwise demand watermark semantics that
    # don't apply to ingest).  Checkpoint tracks consumed files;
    # parquet append from foreachBatch is at-least-once on retry —
    # with Delta this becomes an idempotent txn-versioned MERGE.
    def write_batch(batch_df, epoch_id: int) -> None:
        if validation_rules:
            from datawave_spark.sources.ingest import validate_events
            uid = uid_col or config.uid_fields[0]
            # persist: the error write and the shard write are two
            # actions over the same uncached batch — without this the
            # source files (and the pre adapter) are scanned twice
            cached = batch_df.persist()
            try:
                good, bad = validate_events(
                    cached, validation_rules, uid,
                    job_name=config.datatype, job_id=str(epoch_id))
                bad.write.mode("append").parquet(error_path)
                events = ingest_events(good, config)
                (events.write.mode("append").partitionBy("event_date")
                 .parquet(output_path))
            finally:
                cached.unpersist(blocking=False)
            return
        events = ingest_events(batch_df, config)
        (events.write.mode("append").partitionBy("event_date")
         .parquet(output_path))

    writer = (raw.writeStream.foreachBatch(write_batch)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(events: DataFrame, ts_col: str = "ts",
                    key_col: str = "event_type",
                    window: str = "5 minutes", slide: str | None = None,
                    watermark: str = "10 minutes") -> DataFrame:
    """Watermarked sliding-window counts — the canonical event-time
    aggregation (a NEW capability vs the reference)."""
    win = F.window(F.col(ts_col), window, slide) if slide else \
        F.window(F.col(ts_col), window)
    return (events.withWatermark(ts_col, watermark)
            .groupBy(win, F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("value").alias("sum_value")))


def sessionized_counts(events: DataFrame, ts_col: str = "ts",
                       key_col: str = "user_id", gap: str = "30 minutes",
                       watermark: str = "1 hour") -> DataFrame:
    """Session windows by inactivity gap (session_window) — stateful
    event-time sessionization."""
    return (events.withWatermark(ts_col, watermark)
            .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("sum_value")))


def stream_rollup(spark: SparkSession, input_path: str,
                  schema: T.StructType, rollup_path: str,
                  checkpoint_path: str, fmt: str = "parquet",
                  available_now: bool = True,
                  options: dict[str, str] | None = None) -> StreamingQuery:
    """Streaming continuous-aggregate maintenance — the LIVE half of
    the hypertable pattern (prepared.rollup_hourly is the ingest-built
    table; rollup_daily_from_hourly composes it): each micro-batch of
    raw events folds into the stored day-partitioned hourly rollup via
    ``maintenance.refresh_rollup``, touching only the days the batch
    contains.

    Exactly-once: parquet has no transactional sink, so the refresh is
    guarded by per-epoch markers (``_applied/epoch=N`` written after a
    successful fold) — a foreachBatch RETRY of an applied epoch is
    skipped instead of double-counting its partials.  The remaining
    window is a crash between the fold and the marker write; a Delta
    MERGE keyed on epoch closes it (same caveat family as
    stream_ingest's append).  Markers are epoch-count-sized, not
    corpus-sized."""
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    raw = reader.load(input_path)

    def fold_batch(batch_df, epoch_id: int) -> None:
        import os as _os

        from datawave_spark.sources.maintenance import refresh_rollup
        marker_dir = _os.path.join(rollup_path, "_applied")
        marker = _os.path.join(marker_dir, f"epoch={epoch_id}")
        if _os.path.exists(marker):
            return                      # retried epoch: already folded
        refresh_rollup(spark, rollup_path, batch_df)
        _os.makedirs(marker_dir, exist_ok=True)
        with open(marker, "w"):
            pass

    writer = (raw.writeStream.foreachBatch(fold_batch)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
