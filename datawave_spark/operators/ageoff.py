"""Age-off (retention): TTL by rule.

Reference: warehouse/age-off/src/main/java/datawave/iterators/filter/
ConfigurableAgeOffFilter.java:103 (+ TokenTtlTrie, rule configs in
ageoff/) — Accumulo compaction-time filters dropping cells past TTL,
with per-ColumnFamily / per-visibility / per-value rules.

Spark restatement: retention is a *data management job*, not a read
filter — for a date-partitioned table the cheap path is dropping whole
``event_date=`` partitions (pure metadata, no rewrite), with rule-based
row filtering only inside the boundary partition.  ``age_off_filter``
gives the equivalent read-time view for engines querying data that has
not been compacted yet.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class AgeOffRule:
    """ttl for rows matching an optional predicate — the analogue of a
    ConfigurableAgeOffFilter rule entry (<rule><ttl units=...>)."""
    ttl_days: int
    predicate: Column | None = None   # None → applies to all rows


def age_off_filter(df: DataFrame, rules: list[AgeOffRule],
                   date_col: str = "event_date",
                   now: dt.date | None = None) -> DataFrame:
    """Read-time view: keep a row iff every rule matching it is within
    TTL.  Rules with predicates only constrain matching rows."""
    today = F.lit((now or dt.date.today()).isoformat()).cast("date")
    keep = F.lit(True)
    for rule in rules:
        within = F.datediff(today, F.col(date_col).cast("date")) <= rule.ttl_days
        if rule.predicate is not None:
            keep = keep & F.when(rule.predicate, within).otherwise(F.lit(True))
        else:
            keep = keep & within
    return df.filter(keep)


def drop_expired_partitions(path: str, ttl_days: int,
                            partition_col: str = "event_date",
                            now: dt.date | None = None) -> list[str]:
    """Storage-level age-off for a date-partitioned parquet table:
    delete ``{partition_col}=DATE`` directories entirely past TTL.
    Metadata-only (no data rewrite) — the 100 TB path.  Returns the
    dropped partition names.  (With Delta this is
    ``DELETE FROM t WHERE event_date < cutoff`` + VACUUM.)"""
    cutoff = (now or dt.date.today()) - dt.timedelta(days=ttl_days)
    dropped = []
    prefix = f"{partition_col}="
    for name in sorted(os.listdir(path)):
        if not name.startswith(prefix):
            continue
        try:
            part_date = dt.date.fromisoformat(name[len(prefix):])
        except ValueError:
            continue
        if part_date < cutoff:
            shutil.rmtree(os.path.join(path, name))
            dropped.append(name)
    return dropped


def field_age_off(df: DataFrame, field_ttls: dict[str, int],
                  date_col: str = "event_date",
                  now: dt.date | None = None) -> DataFrame:
    """Per-FIELD age-off (FieldAgeOffFilter.java: a field's values
    expire on their own TTL while the event survives): expired fields
    read as NULL.  A pure projection — at the storage tier this is the
    column-chunk analog of the reference's per-KV filter, and a
    compaction pass can rewrite old partitions with the column nulled
    to reclaim space."""
    today = F.lit((now or dt.date.today()).isoformat()).cast("date")
    age = F.datediff(today, F.col(date_col).cast("date"))
    # one withColumns call = one analyzer pass for the whole TTL map
    # (a withColumn loop pays an analysis pass per field)
    return df.withColumns({f: F.when(age <= ttl, F.col(f))
                           for f, ttl in field_ttls.items()})
