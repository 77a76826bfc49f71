"""Sources & sinks: parquet reading (incl. nanos-timestamp handling),
batch/streaming ingest into the sharded-event layout, and format
readers (SURVEY.md §2.1)."""

from datawave_spark.sources.parquet import read_parquet  # noqa: F401
