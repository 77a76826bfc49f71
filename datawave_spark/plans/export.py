"""Bulk results export — the MapReduce-results path as a file sink.

Reference: web-services/map-reduce/src/main/java/datawave/webservice/
mr/configuration/BulkResultsJobConfiguration.java (submit a query as a
Hadoop job whose input is the query's ranges) + core/map-reduce/.../
bulkresults/map/BulkResultsFileOutputMapper.java (serialize each result
document to a file in the caller-chosen format).  The reference needs a
whole MapReduce tier because live query results stream through a single
webserver page loop; exporting them at scale means re-running the query
as a batch job that writes files.

Spark restatement: every query result already IS a distributed
DataFrame, so bulk export is ``df.write`` — each task writes its own
output split (the mapper analog), the commit protocol provides the
job-level atomicity Hadoop's OutputCommitter gave the reference, and a
``_SUCCESS`` marker plus a manifest row count stand in for
BulkResultsInfoResponse.  Export formats map 1:1: SequenceFile/keyed
protobuf -> parquet (columnar, splittable), JSON/XML document dumps ->
spark's json writer.

Scale: the export never funnels through the driver — no collect, no
single-writer page loop; output parallelism = result partitioning
(repartition first if a specific file count is wanted).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def export_results(result: DataFrame, out_dir: str,
                   fmt: str = "parquet",
                   partitions: int | None = None) -> str:
    """Write a query result as a bulk export under ``out_dir``.

    ``fmt``: ``parquet`` (default) or ``json`` — the two surviving
    analogs of the reference's SequenceFile/document formats.
    ``partitions`` repartitions before the write when the caller wants
    a fixed output-file count (the reference's reducer-count knob).
    Returns ``out_dir``; the write is overwrite-mode so a re-run of the
    same export job is idempotent (OutputCommitter parity)."""
    if fmt not in ("parquet", "json"):
        raise ValueError(f"unsupported export format {fmt!r}")
    if partitions is not None:
        result = result.repartition(partitions)
    result.write.mode("overwrite").format(fmt).save(out_dir)
    return out_dir


def read_export(spark: SparkSession, out_dir: str,
                fmt: str = "parquet") -> DataFrame:
    """Read a completed export back (the downstream-job side of the
    MR-over-results contract, BulkInputFormat analog)."""
    return spark.read.format(fmt).load(out_dir)


def export_root(sf_dir: str) -> str:
    """Local export area for one scale-factor directory, kept beside
    the prepared-asset cache (never inside the read-only testdata)."""
    from datawave_spark.sources.prepared import prepared_path
    return prepared_path(sf_dir, "exports")


def export_query_results(result: DataFrame, sf_dir: str, name: str,
                         fmt: str = "parquet",
                         partitions: int | None = None) -> DataFrame:
    """Run the full bulk-results round trip for a named export: write
    ``result`` to the export area, read it back, return the re-read
    frame (what an MR-over-results consumer would see)."""
    out = os.path.join(export_root(sf_dir), name)
    export_results(result, out, fmt=fmt, partitions=partitions)
    return read_export(result.sparkSession, out, fmt=fmt)
