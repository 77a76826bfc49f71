"""#UNIQUE — streaming result dedup on field-value tuples with temporal
granularities.

Reference: warehouse/query-core/src/main/java/datawave/query/
transformer/UniqueTransform.java:42 (Bloom filter 500k @ 1e-15, :70);
granularity enum attributes/UniqueGranularity.java (ALL,
TRUNCATE_TEMPORAL_TO_{YEAR..MILLISECOND,DAY_OF_WEEK,HOUR_OF_DAY});
most-recent variant keeps the latest document per tuple.

Spark restatement: ``dropDuplicates`` over the reference's formatted
granularity key strings (non-datetime values pass through as
themselves, UniqueGranularity.java:162) — and
EXACT, where the reference's Bloom filter admits false positives
(documented intentional difference).  The shuffle partitions by the
dedup key, so at 100 TB cardinality skew is the thing to watch — AQE
skew handling plus the key being a tuple keeps partitions bounded.
most_recent uses a window row_number instead, keeping the newest row
per key — one shuffle either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# UniqueGranularity.java DateTimeValueFormatter patterns (:29-:71) —
# the reference keys by these STRING forms, and on a value that fails
# to parse as a datetime it keys by the ORIGINAL value (:162,
# "If a date could not be parsed, return the original value") —
# r8 granularity-parity fix: the old date_trunc+cast keyed by
# timestamps and ANSI-ABORTED the whole query on the first
# non-datetime value instead of passing it through.
_FMT = {
    "YEAR": "yyyy", "MONTH": "yyyy-MM", "DAY": "yyyy-MM-dd",
    "HOUR": "yyyy-MM-dd'T'HH", "MINUTE": "yyyy-MM-dd'T'HH:mm",
    "SECOND": "yyyy-MM-dd'T'HH:mm:ss",
    "MILLISECOND": "yyyy-MM-dd'T'HH:mm:ss.SSS",
}


def _unique_key(field: str, granularity: str,
                temporal: bool = False) -> Column:
    """``temporal=True``: the column is already timestamp/date-typed —
    skip the string round-trip + parse-fallback (a typed temporal
    value always "parses"; bench r8: 2x on the unique keys from
    try_to_timestamp(cast(ts AS string)))."""
    g = granularity.upper()
    raw = F.col(field)
    if g == "ALL":
        return raw
    if temporal:
        ts = raw.cast("timestamp")
        orig = None       # a typed temporal value always "parses":
        #                   NULL raw → NULL key either way, so the
        #                   pass-through branch is dead (bench r8)
    else:
        orig = raw.cast("string")
        ts = F.try_to_timestamp(orig)
    if g == "DAY_OF_WEEK":
        key = F.dayofweek(ts).cast("string")   # engine extension
    elif g == "HOUR_OF_DAY":
        key = F.hour(ts).cast("string")        # engine extension
    elif g == "TENTH_OF_HOUR":
        # TRUNCATE_TEMPORAL_TO_TENTH_OF_HOUR (:65): Java formats with
        # pattern "yyyy-MM-dd'T'HH:m" (minute UNPADDED) then chops the
        # last character — so the tenth digit is floor(minute/10) and
        # minutes 0-9 key with an EMPTY tenth ("…T10:").  That is
        # 10-minute buckets, not the 6-minute buckets the name
        # suggests (r8 fix: we previously bucketed by 6 minutes).
        mm = F.minute(ts)
        key = F.concat(
            F.date_format(ts, "yyyy-MM-dd'T'HH:"),
            F.when(mm >= 10,
                   F.floor(mm / 10).cast("int").cast("string"))
             .otherwise(F.lit("")))
    else:
        fmt = _FMT.get(g)
        if fmt is None:
            raise ValueError(f"unknown #UNIQUE granularity {granularity!r}")
        key = F.date_format(ts, fmt)
    if orig is None:
        return key
    return F.when(ts.isNotNull(), key).otherwise(orig)


def _is_temporal(df: DataFrame, field: str) -> bool:
    t = dict(df.dtypes).get(field, "")
    return t in ("date",) or t.startswith("timestamp")


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
        keyed = keyed.withColumn(
            kc, _unique_key(field, gran, _is_temporal(df, field)))
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
    cols = [_unique_key(f, g, _is_temporal(df, f)).alias(f)
            for f, g in fields.items()]
    return df.select(*cols).distinct()
