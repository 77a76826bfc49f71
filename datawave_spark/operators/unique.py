"""#UNIQUE — streaming result dedup on field-value tuples with temporal
granularities.

Reference: warehouse/query-core/src/main/java/datawave/query/
transformer/UniqueTransform.java:42 (Bloom filter 500k @ 1e-15, :70);
granularity enum attributes/UniqueGranularity.java (ALL,
TRUNCATE_TEMPORAL_TO_{YEAR..MILLISECOND,DAY_OF_WEEK,HOUR_OF_DAY});
most-recent variant keeps the latest document per tuple.

Spark restatement: ``dropDuplicates`` over ``date_trunc``'d keys — and
EXACT, where the reference's Bloom filter admits false positives
(documented intentional difference).  The shuffle partitions by the
dedup key, so at 100 TB cardinality skew is the thing to watch — AQE
skew handling plus the key being a tuple keeps partitions bounded.
most_recent uses a window row_number instead, keeping the newest row
per key — one shuffle either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# UniqueGranularity.java values → Spark date_trunc units
_TRUNC = {
    "ALL": None,
    "YEAR": "year", "MONTH": "month", "DAY": "day",
    "HOUR": "hour", "MINUTE": "minute", "SECOND": "second",
    "MILLISECOND": "millisecond",
}


def _unique_key(field: str, granularity: str) -> Column:
    g = granularity.upper()
    if g == "ALL":
        return F.col(field)
    if g == "DAY_OF_WEEK":
        return F.dayofweek(F.col(field))
    if g == "HOUR_OF_DAY":
        return F.hour(F.col(field))
    if g == "TENTH_OF_HOUR":
        # UniqueGranularity TRUNCATE_TEMPORAL_TO_TENTH_OF_HOUR
        # (UniqueByTenthOfHour.java): 6-minute buckets.
        ts = F.date_trunc("hour", F.col(field).cast("timestamp"))
        return ts + F.make_interval(
            mins=(F.floor(F.minute(F.col(field).cast("timestamp")) / 6) * 6
                  ).cast("int"))
    unit = _TRUNC.get(g)
    if unit is None:
        raise ValueError(f"unknown #UNIQUE granularity {granularity!r}")
    if unit == "millisecond":  # date_trunc has no millisecond unit
        ts = F.col(field).cast("timestamp")
        return F.timestamp_millis((F.unix_micros(ts) / 1000).cast("long"))
    return F.date_trunc(unit, F.col(field).cast("timestamp"))


def unique(df: DataFrame, fields: dict[str, str],
           most_recent_by: str | list[str] | None = None) -> DataFrame:
    """#UNIQUE(f1[GRAN1], f2[GRAN2], ...).

    ``fields`` maps field → granularity ('ALL' for plain).  With
    ``most_recent_by`` (a timestamp column), keeps the newest row per
    key (#MOST_RECENT_UNIQUE); otherwise keeps an arbitrary one
    (UniqueTransform keeps the first seen — order-insensitive for the
    driver's comparison).
    """
    keyed = df
    key_cols = []
    for i, (field, gran) in enumerate(fields.items()):
        kc = f"__uniq_{i}"
        keyed = keyed.withColumn(kc, _unique_key(field, gran))
        key_cols.append(kc)
    if most_recent_by is not None:
        order = [most_recent_by] if isinstance(most_recent_by, str) else list(most_recent_by)
        w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order])
        out = (keyed.withColumn("__rn", F.row_number().over(w))
               .filter(F.col("__rn") == 1).drop("__rn"))
    else:
        out = keyed.dropDuplicates(key_cols)
    return out.drop(*key_cols)


def unique_tuples(df: DataFrame, fields: dict[str, str]) -> DataFrame:
    """The distinct key tuples themselves (what a #UNIQUE result page
    shows when only unique fields are projected): one row per distinct
    (truncated) tuple, column-per-field."""
    cols = [_unique_key(f, g).alias(f) for f, g in fields.items()]
    return df.select(*cols).distinct()
