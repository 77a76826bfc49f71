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

    Exactly-once: parquet has no transactional sink, so each fold is
    keyed on (streaming query id, epoch id) — the Spark foreachBatch
    dedup recipe — and ``refresh_rollup`` writes that key INSIDE each
    rewritten day partition before the swap, so key and merged data
    become visible in the same atomic rename.  A retried epoch skips
    every day it already swapped, even after a crash BETWEEN days of a
    multi-day batch; an epoch keyed only on epoch_id would collide
    when a fresh checkpoint restarts numbering at 0 and silently drop
    new data.  Consequence of the keying: a brand-new checkpoint gets
    a new query id and will re-fold everything it replays — pair a
    fresh checkpoint with a fresh rollup table."""
    import json
    import os as _os

    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    raw = reader.load(input_path)

    def fold_batch(batch_df, epoch_id: int) -> None:
        from datawave_spark.sources.maintenance import refresh_rollup
        # the checkpoint's metadata file carries the query id, stable
        # across restarts FROM THIS checkpoint (which is exactly the
        # scope in which epoch ids are comparable)
        with open(_os.path.join(checkpoint_path, "metadata")) as fh:
            qid = json.load(fh)["id"]
        refresh_rollup(spark, rollup_path, batch_df,
                       epoch_key=f"{qid}.{epoch_id}")

    writer = (raw.writeStream.foreachBatch(fold_batch)
              .option("checkpointLocation", checkpoint_path))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
