"""Date index — the reference's date-index auxiliary table (SURVEY
§1.1), re-expressed as hive partition pruning.

Reference: ``DateIndexDataTypeHandler.java:79`` writes, for every
configured semantic date field on an event, a row mapping
(date value, date type, field) → a bitset of the shards that hold
events with that value; ``DateIndexHelper`` then turns a query
constrained on a NON-shard date field into a "shards and days hint"
so RangeStream scans only those shards instead of the whole table.

Spark restatement: events are stored partitioned by ``event_date``
(the shard date).  A predicate on a different date column — LOAD_DATE,
an activity date — cannot partition-prune by itself, because arrival
lag spreads one semantic date across several event_date partitions.
The date index is a tiny ingest-built frame
``(field, date, shards: array<date>)`` — one row per field × day, a
few hundred rows per year regardless of corpus size.  The planner
reads it (a bounded metadata fetch, same class as the reference's
MetadataHelper consultations), unions the shard lists for the queried
range on the driver, and injects ``event_date IN (...)`` next to the
exact semantic-date predicate — Catalyst turns that into hive
partition pruning, so only the hinted directories are listed or read.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Column, DataFrame, functions as F


def build_date_index(events: DataFrame,
                     date_fields: dict[str, str | Column],
                     shard_col: str = "event_date") -> DataFrame:
    """Build the date-index frame from the canonical event frame.

    ``date_fields`` maps the index's FIELD name to the event column (or
    expression) holding that semantic date.  Output: one row per
    (field, date) with the sorted set of shard dates containing it —
    the ``Uid.List``-free analog of the reference's shard bitset value.
    One groupBy on (field, day) — at 100 TB this is a map-side-combined
    aggregation producing O(fields × days) rows.
    """
    parts = []
    for field, col in date_fields.items():
        c = F.col(col) if isinstance(col, str) else col
        parts.append(events.select(
            F.lit(field).alias("field"),
            F.to_date(c).alias("date"),
            F.col(shard_col).cast("date").alias("shard")))
    long = parts[0]
    for p in parts[1:]:
        long = long.unionByName(p)
    return (long.groupBy("field", "date")
            .agg(F.sort_array(F.collect_set("shard")).alias("shards")))


def shards_for_range(date_index: DataFrame, field: str,
                     start: str | datetime.date,
                     end: str | datetime.date) -> list[datetime.date]:
    """The "shards and days hint" (DateIndexHelper analog): the sorted
    union of shard dates whose events carry ``field`` values inside
    [start, end].  Driver-side collect is bounded by days-in-range —
    the same scale class as the reference reading date-index rows into
    the planner."""
    rows = (date_index
            .filter((F.col("field") == field)
                    & (F.col("date") >= F.lit(start).cast("date"))
                    & (F.col("date") <= F.lit(end).cast("date")))
            .select(F.explode("shards").alias("shard"))
            .distinct().collect())
    return sorted(r.shard for r in rows)


def prune_by_date_index(events: DataFrame, date_index: DataFrame,
                        field: str, semantic_col: str | Column,
                        start: str | datetime.date,
                        end: str | datetime.date,
                        shard_col: str = "event_date") -> DataFrame:
    """Filter ``events`` to [start, end] on a semantic date column,
    using the date index to add the partition-prunable
    ``shard_col IN (hint)`` alongside the exact residual predicate.

    The IN list is a literal at plan time, so it lands in the scan's
    PartitionFilters (asserted by tests/test_plan_quality.py) — the
    Spark equivalent of RangeStream emitting only the hinted shard
    ranges.  An empty hint short-circuits to an always-false filter
    (the reference returns no ranges)."""
    hint = shards_for_range(date_index, field, start, end)
    sem = F.to_date(F.col(semantic_col) if isinstance(semantic_col, str)
                    else semantic_col)
    exact = (sem >= F.lit(start).cast("date")) & \
            (sem <= F.lit(end).cast("date"))
    if not hint:
        return events.filter(F.lit(False))
    return events.filter(
        F.col(shard_col).cast("date").isin(hint) & exact)
